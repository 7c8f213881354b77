"""TF1 resize semantics: golden values computed from the legacy formula
(align_corners=False, no half-pixel centers): src = dst * in/out."""

import numpy as np
import jax.numpy as jnp

from deeplab_tpu.ops.resize import resize_bilinear_tf1, resize_nearest_tf1


def _tf1_bilinear_ref(x, out_h, out_w):
    """Direct per-pixel implementation of TF1 resize_bilinear."""
    b, in_h, in_w, c = x.shape
    out = np.zeros((b, out_h, out_w, c), np.float32)
    sh, sw = in_h / out_h, in_w / out_w
    for i in range(out_h):
        fy = i * sh
        y0 = min(int(np.floor(fy)), in_h - 1)
        y1 = min(y0 + 1, in_h - 1)
        wy = fy - y0
        for j in range(out_w):
            fx = j * sw
            x0 = min(int(np.floor(fx)), in_w - 1)
            x1 = min(x0 + 1, in_w - 1)
            wx = fx - x0
            top = x[:, y0, x0] * (1 - wx) + x[:, y0, x1] * wx
            bot = x[:, y1, x0] * (1 - wx) + x[:, y1, x1] * wx
            out[:, i, j] = top * (1 - wy) + bot * wy
    return out


def test_bilinear_upsample_matches_tf1():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    got = np.asarray(resize_bilinear_tf1(jnp.asarray(x), (13, 11)))
    ref = _tf1_bilinear_ref(x, 13, 11)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_downsample_matches_tf1():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 2).astype(np.float32)
    got = np.asarray(resize_bilinear_tf1(jnp.asarray(x), (7, 5)))
    ref = _tf1_bilinear_ref(x, 7, 5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_not_half_pixel():
    # TF1 semantics keep out[0,0] == in[0,0] exactly (src=0), unlike
    # half-pixel-centers resize.
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    y = np.asarray(resize_bilinear_tf1(jnp.asarray(x), (8, 8)))
    assert y[0, 0, 0, 0] == x[0, 0, 0, 0]
    # and the x2 upsample interpolates at exactly half steps
    assert y[0, 0, 1, 0] == 0.5 * (x[0, 0, 0, 0] + x[0, 0, 1, 0])


def test_identity_resize_is_noop():
    x = jnp.arange(12.0).reshape(1, 3, 4, 1)
    y = resize_bilinear_tf1(x, (3, 4))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_nearest_matches_tf1():
    x = np.arange(9, dtype=np.float32).reshape(1, 3, 3, 1)
    y = np.asarray(resize_nearest_tf1(jnp.asarray(x), (6, 6)))
    # TF1 NN: idx = floor(dst * in/out) -> [0,0,1,1,2,2]
    expect_rows = [0, 0, 1, 1, 2, 2]
    for i, r in enumerate(expect_rows):
        for j, c in enumerate(expect_rows):
            assert y[0, i, j, 0] == x[0, r, c, 0]


def test_one_to_many_broadcast():
    # resize from 1x1: every output pixel equals the single input value
    # (the ASPP b4 branch, deeplabv3p.py:382).
    x = jnp.full((1, 1, 1, 4), 3.5)
    y = resize_bilinear_tf1(x, (16, 16))
    assert y.shape == (1, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(y), 3.5)
