"""Pixel-shuffle (sub-pixel convolution phase shift), reference channel order.

The reference ``Subpixel._phase_shift`` (subpixel.py:77-88) reshapes channels
as ``[f, r1, r2]`` then permutes ``(0,1,2,5,4,3)`` and concat-interleaves rows
before columns, yielding

    out[b, h*r + dr, w*r + dc, f] = in[b, h, w, f*r*r + dc*r + dr]

i.e. channel index = f*r^2 + (col_offset)*r + (row_offset).  This is NOT
``tf.depth_to_space`` order (``[r1, r2, f]``); loading the shipped
``mobilenetv2_subpixel.h5`` bit-compatibly requires this exact layout
(SURVEY.md C9).  We implement it as one reshape/transpose/reshape, which XLA
lowers to a pure layout change.
"""

from __future__ import annotations

import jax.numpy as jnp


def phase_shift(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC, C = f*r*r -> (N, H*r, W*r, f) with reference channel ordering."""
    b, h, w, c = x.shape
    f = c // (r * r)
    assert f * r * r == c, f"channels {c} not divisible by r^2={r*r}"
    x = x.reshape(b, h, w, f, r, r)          # [..., f, r1(=dc), r2(=dr)]
    x = x.transpose(0, 1, 5, 2, 4, 3)        # (b, h, dr, w, dc, f)
    return x.reshape(b, h * r, w * r, f)


def phase_shift_inverse(y: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`phase_shift` (used in tests / weight conversion)."""
    b, hr, wr, f = y.shape
    h, w = hr // r, wr // r
    y = y.reshape(b, h, r, w, r, f)          # (b, h, dr, w, dc, f)
    y = y.transpose(0, 1, 3, 5, 4, 2)        # (b, h, w, f, dc, dr)
    return y.reshape(b, h, w, f * r * r)
