"""BatchNorm moving-statistics recalibration.

The reference's workflow fine-tunes from pretrained weights whose BN moving
stats are already sensible (notebook cells 2/5; MobileNetV2 BN momentum is
0.999, deeplabv3p.py:176-205).  When training from random initialization,
those moving stats need thousands of steps to approach the trained batch
statistics — until then, eval-mode quality is noise even though train-mode
metrics are fine.  ``calibrate_bn`` closes the gap in a few forward passes:
it re-estimates every non-frozen BN layer's moving mean/variance as the
average of batch statistics over the given batches (the standard
"BN recalibration" procedure), with dropout off and no parameter updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deeplab_tpu import core


def calibrate_bn(model, params, state, batches, frozen: frozenset =
                 frozenset(), compute_dtype=None):
    """Return a new ``state`` with BN moving stats averaged over ``batches``.

    Args:
      model: SegNet-like (``forward(ctx, img)``).
      params, state: current trees (unchanged; a new state is returned).
      batches: iterable of image arrays (B, H, W, 3), raw 0-255 — e.g.
        ``(X for X, _, _ in generator)`` or a list of arrays.
      frozen: layers whose BN stats must be left untouched — pass the
        fine-tune freeze set so frozen pretrained trunk stats are not
        clobbered with small-dataset batch statistics.
      compute_dtype: forward dtype (default f32).
    """
    fwd = jax.jit(lambda p, s, x: core.apply_model(
        model.forward, p, s, x, bn_calibrate=True, frozen=frozen,
        compute_dtype=compute_dtype or jnp.float32)[1])
    sums = None
    n = 0
    for X in batches:
        new_state = fwd(params, state, jnp.asarray(np.asarray(X),
                                                   jnp.float32))
        if sums is None:
            sums = jax.tree.map(lambda v: v.astype(jnp.float32), new_state)
        else:
            sums = jax.tree.map(jnp.add, sums,
                                jax.tree.map(lambda v: v.astype(jnp.float32),
                                             new_state))
        n += 1
    if n == 0:
        return state
    return jax.tree.map(lambda v: v / n, sums)
