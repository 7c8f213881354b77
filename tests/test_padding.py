"""Padding math vs TF SAME golden values and the reference manual trick."""

import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu.ops.padding import same_pads, manual_pads, effective_kernel
from deeplab_tpu.core import init_model, apply_model
from deeplab_tpu.ops.conv import conv2d, conv2d_fixed, depthwise_conv2d


def test_same_pads_golden():
    # TF SAME golden values.
    assert same_pads(512, 3, 2, 1) == (0, 1)
    assert same_pads(512, 3, 1, 1) == (1, 1)
    assert same_pads(513, 3, 2, 1) == (1, 1)
    assert same_pads(64, 3, 1, 2) == (2, 2)   # dilated: eff_k 5
    assert same_pads(64, 1, 1, 1) == (0, 0)
    assert same_pads(65, 3, 2, 1) == (1, 1)


def test_manual_pads_reference_formula():
    # deeplabv3p.py:64-68 — input-size independent.
    for k, r in [(3, 1), (3, 2), (3, 4), (1, 1)]:
        eff = effective_kernel(k, r)
        beg, end = manual_pads(k, r)
        assert beg + end == eff - 1
        assert beg == (eff - 1) // 2


def test_same_vs_manual_differ_for_stride2():
    # The "1 pixel drift" fix (deeplabv3p.py:89): with in=512,k=3,s=2 SAME
    # pads (0,1) but manual pads (1,1) -> outputs differ by a 1px shift.
    assert same_pads(512, 3, 2, 1) != manual_pads(3, 1)


def test_conv_same_output_shapes():
    def f(ctx, x):
        return conv2d(ctx, x, 8, 3, "c", stride=2)
    x = jnp.ones((1, 33, 33, 3))
    params, state = init_model(f, jax.random.key(0), x)
    y, _ = apply_model(f, params, state, x)
    assert y.shape == (1, 17, 17, 8)   # ceil(33/2)


def test_conv_fixed_shift_vs_same():
    # conv2d_fixed with stride 2 on even input = SAME conv on input shifted
    # by one pixel (pad (1,1) vs (0,1)).
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 1), jnp.float32)

    def f_fixed(ctx, x):
        return conv2d_fixed(ctx, x, 4, "c", stride=2, kernel_size=3)

    def f_same(ctx, x):
        return conv2d(ctx, x, 4, 3, "c", stride=2)

    params, state = init_model(f_fixed, jax.random.key(0), x)
    y_fixed, _ = apply_model(f_fixed, params, state, x)
    y_same, _ = apply_model(f_same, params, state, x)
    assert y_fixed.shape == y_same.shape == (1, 4, 4, 4)
    # manual padding prepends one row/col of zeros -> interior taps shift.
    assert not np.allclose(y_fixed, y_same)


def test_depthwise_matches_manual_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 3), jnp.float32)

    def f(ctx, x):
        return depthwise_conv2d(ctx, x, 3, "dw")

    params, state = init_model(f, jax.random.key(0), x)
    y, _ = apply_model(f, params, state, x)
    k = np.asarray(params["dw"]["depthwise_kernel"])  # (3,3,3,1)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, 6, 6, 3), np.float32)
    for c in range(3):
        for i in range(6):
            for j in range(6):
                ref[0, i, j, c] = np.sum(xp[0, i:i + 3, j:j + 3, c] * k[:, :, c, 0])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
