"""Parameter initializers: Keras defaults + ICNR.

ICNR (subpixel.py:13-39): initialize a sub-kernel with out/r^2 output channels,
then replicate it so that every group of r^2 output channels starts identical
— the pixel-shuffled output is then checkerboard-free.  The reference realizes
the replication via NN-resize + space_to_depth; since the r^2 copies are
identical the channel grouping is irrelevant at init, so we replicate directly
into the phase-shift layout (f*r^2 + dc*r + dr) used by ops.pixel_shuffle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def glorot_uniform(rng, shape, dtype=jnp.float32):
    """Keras default kernel init. fan_in/fan_out per Keras conv convention."""
    if len(shape) == 4:  # (kh, kw, in, out) HWIO
        receptive = shape[0] * shape[1]
        fan_in, fan_out = shape[2] * receptive, shape[3] * receptive
    else:
        fan_in, fan_out = shape[0], shape[-1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def glorot_normal(rng, shape, dtype=jnp.float32):
    if len(shape) == 4:
        receptive = shape[0] * shape[1]
        fan_in, fan_out = shape[2] * receptive, shape[3] * receptive
    else:
        fan_in, fan_out = shape[0], shape[-1]
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return jax.random.normal(rng, shape, dtype) * std


def zeros(rng, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(rng, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def icnr(rng, shape, r: int, base_init=glorot_normal, dtype=jnp.float32):
    """ICNR init for a (kh, kw, in, out) kernel feeding phase_shift(r).

    Matches the property tested by the reference (subpixel.py:27-39): the r^2
    output sub-kernels of each filter are identical.  Output channel layout is
    f*r^2 + dc*r + dr (the reference Subpixel ordering, SURVEY.md C9).
    """
    kh, kw, cin, cout = shape
    if r == 1:
        return base_init(rng, shape, dtype)
    f = cout // (r * r)
    assert f * r * r == cout, f"out channels {cout} not divisible by r^2"
    sub = base_init(rng, (kh, kw, cin, f), dtype)            # one sub-kernel
    full = jnp.repeat(sub[..., :, None], r * r, axis=-1)     # (kh,kw,cin,f,r^2)
    return full.reshape(kh, kw, cin, cout)
