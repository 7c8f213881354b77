"""Fused TRAINING inverted-residual kernels (kernels/fused_mbconv_train.py).

Interpret-mode (CPU) parity of the multi-phase Pallas forward/backward
against the plain XLA composition (the exact ops/conv.py + ops/bn.py
training path used by models/mobilenetv2.py::inverted_res_block), for
values, batch statistics, and ALL gradients (dx, conv weights, BN
gamma/beta).  f32 checks are tight (same math, different schedule); bf16
checks are loose (quantization points match the XLA path but product
roundings differ).  On-chip Mosaic behavior is validated on the real TPU
by the bench/training paths — interpret mode pins the math.  These f32
comparisons are only meaningful on CPU: on TPU even two XLA f32 builds
of this block disagree at isolated pixels (relu6' mask margins down to
~1e-5 vs MXU rounding — see the kernel module docstring).

Reference block semantics: deeplabv3p.py:167-206 in Keras training mode.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu import core
from deeplab_tpu.kernels import fused_mbconv_train as FMT
from deeplab_tpu.models.mobilenetv2 import inverted_res_block


EPS = 1e-3


def _xla_block(x, w1, g1, b1, wdw9, g2, b2, w2, g3, b3, *, rate, skip):
    """ops/bn.py-faithful training-mode composition (batch stats, dtype
    rounding at conv outputs and BN affines).  f32 runs at HIGHEST
    precision like ops/conv.py:30 — DEFAULT bf16-rounds f32 matmul
    operands on both TPU and the CPU backend, which would make this
    'reference' as fuzzy as an unpinned kernel."""
    dt = x.dtype
    prec = FMT._prec(dt)

    def bn(v, gamma, beta):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=(0, 1, 2))
        var = jnp.var(vf, axis=(0, 1, 2))
        scale = gamma * jax.lax.rsqrt(var + EPS)
        shift = beta - mean * scale
        return v * scale.astype(dt) + shift.astype(dt), mean, var

    def relu6(v):
        return jnp.minimum(jax.nn.relu(v), jnp.asarray(6.0, v.dtype))

    Ce = w1.shape[1]
    e = jax.lax.dot_general(x, w1.astype(dt), (((3,), (0,)), ((), ())),
                            precision=prec)
    e, mu1, var1 = bn(e, g1, b1)
    e = relu6(e)
    dwk = wdw9.reshape(3, 3, Ce)[:, :, None, :].astype(dt)
    d = jax.lax.conv_general_dilated(
        e, dwk, (1, 1), "SAME", rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=Ce,
        precision=prec)
    d, mu2, var2 = bn(d, g2, b2)
    d = relu6(d)
    y = jax.lax.dot_general(d, w2.astype(dt), (((3,), (0,)), ((), ())),
                            precision=prec)
    y, mu3, var3 = bn(y, g3, b3)
    out = x + y if skip else y
    return out, (mu1, var1, mu2, var2, mu3, var3)


def _mk_inputs(rate, skip, Cin, Ce, Cout, H, W, B=2, seed=0, dtype=np.float32):
    r = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    x = jnp.asarray(r.randn(B, H, W, Cin).astype(dtype))
    w1 = mk(Cin, Ce) * 0.3
    wdw9 = mk(9, Ce) * 0.3
    w2 = mk(Ce, Cout) * 0.2
    g1, g2, g3 = 1.0 + 0.1 * mk(Ce), 1.0 + 0.1 * mk(Ce), 1.0 + 0.1 * mk(Cout)
    b1, b2, b3 = 0.1 * mk(Ce), 0.1 * mk(Ce), 0.1 * mk(Cout)
    return x, w1, g1, b1, wdw9, g2, b2, w2, g3, b3


def _fused(x, w1, g1, b1, wdw9, g2, b2, w2, g3, b3, *, rate, skip):
    wdw = jnp.pad(wdw9, ((0, 7), (0, 0)))
    return FMT.block_train(x, w1, g1, b1, wdw, g2, b2, w2, g3, b3,
                           rate=rate, skip=skip, interpret=True)


CASES = [
    (1, True, 8, 48, 8, 16, 16),
    (2, True, 8, 48, 8, 16, 24),     # dilated + non-square
    (4, False, 16, 96, 24, 8, 16),   # rate 4, channel change
    (1, True, 8, 48, 8, 32, 16),     # nt=4: interior tiles with BOTH real
                                     # halos (caught a precision bug once)
]


@pytest.mark.parametrize("rate,skip,Cin,Ce,Cout,H,W", CASES)
def test_forward_f32(rate, skip, Cin, Ce, Cout, H, W):
    args = _mk_inputs(rate, skip, Cin, Ce, Cout, H, W)
    out, stats = _fused(*args, rate=rate, skip=skip)
    ref, rstats = _xla_block(*args, rate=rate, skip=skip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    for got, want in zip(stats, rstats):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_forward_chunked_f32():
    """Force nch>1 (the Ce-chunked grids) on a small case."""
    rate, skip, Cin, Ce, Cout, H, W = 2, True, 8, 48, 8, 16, 16
    args = _mk_inputs(rate, skip, Cin, Ce, Cout, H, W)
    orig = FMT._pick_nch
    FMT._pick_nch = lambda Ce_, n2: 3
    try:
        out, stats = _fused(*args, rate=rate, skip=skip)
    finally:
        FMT._pick_nch = orig
    ref, rstats = _xla_block(*args, rate=rate, skip=skip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("rate,skip,Cin,Ce,Cout,H,W", CASES)
def test_grads_f32(rate, skip, Cin, Ce, Cout, H, W):
    args = _mk_inputs(rate, skip, Cin, Ce, Cout, H, W)
    cot = jnp.asarray(
        np.random.RandomState(7).randn(2, H, W, Cout).astype(np.float32))

    def loss_fused(*a):
        out, _ = _fused(*a, rate=rate, skip=skip)
        return jnp.sum(out * cot)

    def loss_xla(*a):
        out, _ = _xla_block(*a, rate=rate, skip=skip)
        return jnp.sum(out * cot)

    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    gx = jax.grad(loss_xla, argnums=tuple(range(10)))(*args)
    names = ["x", "w1", "g1", "b1", "wdw", "g2", "b2", "w2", "g3", "b3"]
    for n, a, b in zip(names, gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {n}")


def test_bf16_close_to_f32():
    """bf16 fused path tracks the f32 reference about as well as the bf16
    XLA path does (same quantization points, different roundings)."""
    rate, skip, Cin, Ce, Cout, H, W = 2, True, 8, 48, 8, 16, 16
    args = _mk_inputs(rate, skip, Cin, Ce, Cout, H, W)
    ref32, _ = _xla_block(*args, rate=rate, skip=skip)
    args16 = (args[0].astype(jnp.bfloat16),) + args[1:]
    out16, _ = _fused(*args16, rate=rate, skip=skip)
    xla16, _ = _xla_block(*args16, rate=rate, skip=skip)
    err_fused = np.abs(np.asarray(out16, np.float32) - np.asarray(ref32))
    err_xla = np.abs(np.asarray(xla16, np.float32) - np.asarray(ref32))
    assert err_fused.mean() <= 3.0 * err_xla.mean() + 1e-3
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(xla16, np.float32),
                               rtol=0.15, atol=0.15)


def _mini_model(ctx, x):
    return inverted_res_block(ctx, x, expansion=6, stride=1, alpha=1.0,
                              filters=8, block_id=3, skip_connection=True,
                              rate=2)


def test_ctx_wrapper_matches_xla_path(monkeypatch):
    """fused_train_block_apply (the models/mobilenetv2.py hook) vs the XLA
    ctx path: same outputs AND same EMA-updated moving stats, with grads
    flowing to the same param tree."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8), jnp.float32)
    params, state = core.init_model(_mini_model, rng, x)

    out_ref, ns_ref = core.apply_model(_mini_model, params, state, x,
                                       training=True)

    monkeypatch.setattr(FMT, "pallas_available", lambda: True)
    monkeypatch.setattr(FMT, "INTERPRET", True)
    # the gate requires bf16; check the wiring with an f32-tolerant gate
    monkeypatch.setattr(FMT, "use_fused_train_block",
                        lambda ctx, x_, s, b, p: ctx.training and s == 1
                        and bool(b))
    out_f, ns_f = core.apply_model(_mini_model, params, state, x,
                                   training=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    for layer in ns_ref:
        for name in ns_ref[layer]:
            np.testing.assert_allclose(
                np.asarray(ns_f[layer][name]),
                np.asarray(ns_ref[layer][name]), rtol=2e-4, atol=1e-5,
                err_msg=f"{layer}/{name}")

    gf = jax.grad(lambda p: jnp.mean(
        core.apply_model(_mini_model, p, state, x, training=True)[0] ** 2)
    )(params)
    monkeypatch.undo()
    gx = jax.grad(lambda p: jnp.mean(
        core.apply_model(_mini_model, p, state, x, training=True)[0] ** 2)
    )(params)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]), rtol=2e-3,
            atol=2e-3, err_msg=str(path))
