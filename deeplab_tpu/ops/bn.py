"""BatchNormalization with Keras semantics (per-layer epsilon/momentum).

Reference BN configs (SURVEY.md C2/C5/C7):
  - SepConv_BN:      eps 1e-3 (default), momentum 0.99 (Keras default)
  - MobileNetV2:     eps 1e-3, momentum 0.999
  - ASPP / decoder:  eps 1e-5
Inference uses moving stats; training uses batch stats and EMA-updates the
moving stats (Keras: moving = moving*momentum + batch*(1-momentum)).
XLA fuses the affine transform into the surrounding convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeplab_tpu.ops import init as inits


def batch_norm(ctx, x, name: str, epsilon: float = 1e-3, momentum: float = 0.99):
    c = x.shape[-1]
    gamma = ctx.param(name, "gamma", (c,), inits.ones)
    beta = ctx.param(name, "beta", (c,), inits.zeros)
    mov_mean = ctx.stat(name, "moving_mean", (c,), 0.0)
    mov_var = ctx.stat(name, "moving_variance", (c,), 1.0)

    if (ctx.training or ctx.bn_calibrate) and name not in ctx.frozen:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        if ctx.bn_calibrate:
            # recalibration pass: report the RAW batch statistics (the
            # caller averages them over batches; train/bn_calibrate.py)
            ctx.update_stat(name, "moving_mean", mean)
            ctx.update_stat(name, "moving_variance", var)
        else:
            ctx.update_stat(name, "moving_mean",
                            mov_mean * momentum + mean * (1.0 - momentum))
            ctx.update_stat(name, "moving_variance",
                            mov_var * momentum + var * (1.0 - momentum))
    else:
        mean, var = mov_mean, mov_var

    scale = gamma * jax.lax.rsqrt(var + epsilon)
    shift = beta - mean * scale
    return (x * scale.astype(x.dtype) + shift.astype(x.dtype))
