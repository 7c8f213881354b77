"""Fused inverted-residual kernel (kernels/fused_mbconv.py) parity.

Interpret-mode (CPU) checks of the Pallas kernel against the plain XLA
composition (expand 1x1 + BN-folded bias + relu6 -> dilated depthwise ->
relu6 -> project 1x1 [+ skip]), and of the ctx-level wrapper against the
reference block (models/mobilenetv2.py inverted_res_block) in eval mode.
On-chip behavior (Mosaic layouts) is validated on the real TPU by the
bench/serving paths — interpret mode only pins the math.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.kernels import fused_mbconv as FM


def _xla_mbconv(x, w1, b1, wdw, bdw, w2, b2, *, rate, skip):
    Ce = w1.shape[1]
    e = jnp.einsum("bhwc,ce->bhwe", x.astype(jnp.float32),
                   w1.astype(jnp.float32)) + b1
    e = jnp.clip(e, 0, 6)
    dwk = wdw[:9].reshape(3, 3, Ce)[:, :, None, :].astype(jnp.float32)
    d = jax.lax.conv_general_dilated(
        e, dwk, (1, 1), "SAME", rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Ce) + bdw
    d = jnp.clip(d, 0, 6)
    o = jnp.einsum("bhwe,eo->bhwo", d, w2.astype(jnp.float32)) + b2
    o = o.astype(x.dtype)
    return x + o if skip else o


@pytest.mark.parametrize("rate,skip,Cin,Ce,Cout,H,W", [
    (1, True, 8, 48, 8, 16, 16),
    (2, True, 8, 48, 8, 16, 24),    # dilated + non-square
    (4, False, 16, 96, 24, 8, 16),  # rate 4, channel change
])
def test_fused_mbconv_matches_xla_interpret(rate, skip, Cin, Ce, Cout, H, W):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, H, W, Cin).astype(np.float32))
    w1 = jnp.asarray(r.randn(Cin, Ce).astype(np.float32) * 0.2)
    b1 = jnp.asarray(r.randn(1, Ce).astype(np.float32) * 0.1)
    wdw = jnp.asarray(np.pad(r.randn(9, Ce) * 0.2, ((0, 7), (0, 0)))
                      .astype(np.float32))
    bdw = jnp.asarray(r.randn(1, Ce).astype(np.float32) * 0.1)
    w2 = jnp.asarray(r.randn(Ce, Cout).astype(np.float32) * 0.1)
    b2 = jnp.asarray(r.randn(1, Cout).astype(np.float32) * 0.1)
    got = FM.fused_mbconv(x, w1, b1, wdw, bdw, w2, b2, rate=rate,
                          skip=skip, interpret=True)
    ref = _xla_mbconv(x, w1, b1, wdw, bdw, w2, b2, rate=rate, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("rate,depth_act", [(1, False), (2, True),
                                            (4, False)])
def test_fused_sepconv_apply_matches_xla_interpret(rate, depth_act):
    """ctx-level fused SepConv vs the reference sep_conv_bn on the SAME
    params (BN folding + activation placement), eval mode."""
    from deeplab_tpu import core
    from deeplab_tpu.ops.conv import sep_conv_bn

    fwd = functools.partial(sep_conv_bn, filters=24, prefix="sc", stride=1,
                            rate=rate, depth_activation=depth_act)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 16, 24, 16).astype(np.float32) * 2 - 1)
    params, state = core.init_model(lambda ctx, v: fwd(ctx, v),
                                    jax.random.key(0), x)
    for lname, vars_ in state.items():
        for vn in vars_:
            vars_[vn] = jnp.asarray(
                rng.rand(*vars_[vn].shape).astype(np.float32) * 0.5 + 0.75)
    ref, _ = core.apply_model(lambda ctx, v: fwd(ctx, v), params, state, x)

    ctx = core.Ctx(mode="apply", params=params, state=state)
    got = FM.fused_sepconv_apply(ctx, x, "sc", rate=rate,
                                 depth_activation=depth_act, epsilon=1e-3,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_block_apply_mixed_matches_xla_mixed_interpret():
    """Mixed-policy fused block (f32 I/O, in-kernel bf16 MXU casts) vs the
    XLA composition under the same 'mixed' ctx: both paths round each
    matmul input to bf16 once and accumulate f32, so they agree to bf16
    rounding noise while output/residual stay f32."""
    from deeplab_tpu import core
    from deeplab_tpu.models.mobilenetv2 import inverted_res_block

    fwd = functools.partial(inverted_res_block, expansion=6, stride=1,
                            alpha=1.0, filters=8, block_id=3,
                            skip_connection=True, rate=2)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 16, 16, 8).astype(np.float32) * 2 - 1)
    params, state = core.init_model(lambda ctx, v: fwd(ctx, v),
                                    jax.random.key(0), x)
    for lname, vars_ in state.items():
        for vn in vars_:
            vars_[vn] = jnp.asarray(
                rng.rand(*vars_[vn].shape).astype(np.float32) * 0.5 + 0.75)
    ref, _ = core.apply_model(lambda ctx, v: fwd(ctx, v), params, state, x,
                              compute_dtype="mixed")

    ctx = core.Ctx(mode="apply", params=params, state=state, mxu_bf16=True)
    got = FM.fused_block_apply(ctx, x, "expanded_conv_3_", rate=2,
                               skip=True, interpret=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_block_apply_matches_xla_block_interpret(monkeypatch):
    """ctx-level wrapper vs the XLA inverted_res_block on the SAME params
    (BN folding correctness), eval mode, dilated block."""
    from deeplab_tpu import core
    from deeplab_tpu.models.mobilenetv2 import inverted_res_block

    fwd = functools.partial(inverted_res_block, expansion=6, stride=1,
                            alpha=1.0, filters=8, block_id=3,
                            skip_connection=True, rate=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 16, 8).astype(np.float32) * 2 - 1)
    params, state = core.init_model(lambda ctx, v: fwd(ctx, v),
                                    jax.random.key(0), x)
    # give the BN stats non-trivial values so folding is actually tested
    for lname, vars_ in state.items():
        for vn in vars_:
            vars_[vn] = jnp.asarray(
                rng.rand(*vars_[vn].shape).astype(np.float32) * 0.5 + 0.75)
    ref, _ = core.apply_model(lambda ctx, v: fwd(ctx, v), params, state, x)

    ctx = core.Ctx(mode="apply", params=params, state=state)
    got = FM.fused_block_apply(ctx, x, "expanded_conv_3_", rate=2,
                               skip=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
