"""MobileNetV2 backbone for DeepLabV3+ (reference deeplabv3p.py:157-206,315-367).

17 inverted-residual blocks; the DeepLab variant keeps stride 8 by switching
blocks 7-12 to rate 2 and 14-16 to rate 4 instead of striding (reference
deeplabv3p.py:342-367; OS is forced to 8 for this backbone at :316).
Layer names match the reference exactly (the .h5 weight contract).
"""

from __future__ import annotations

from deeplab_tpu.ops.bn import batch_norm
from deeplab_tpu.ops.conv import conv2d, depthwise_conv2d, relu6


def make_divisible(v, divisor, min_value=None):
    """Reference _make_divisible (deeplabv3p.py:157-164)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _use_fused_block(ctx, x, stride: int, block_id) -> bool:
    """Serving fast path: the fused expand->depthwise->project Pallas
    kernel (kernels/fused_mbconv.py) applies in eval mode on a single TPU
    chip for stride-1 blocks with an expand conv, under the bf16 policy
    AND the 'mixed' policy (f32 activations, in-kernel bf16 MXU casts —
    core.Ctx.mxu_bf16).  Init/training/calibration and the f32 HIGHEST
    parity path keep the XLA composition (identical params).  Multi-chip:
    Pallas custom calls have no SPMD partitioning rule, so a sharded jit
    could not partition them — but a shard_map program owns exactly one
    device, so callers that run the forward per-device (Predictor's
    data-parallel serving) set ctx.shard_local and the fused path engages
    there too."""
    import jax
    import jax.numpy as jnp
    from deeplab_tpu.kernels import fused_mbconv as FM
    return (FM.ENABLED and block_id and stride == 1
            and ctx.mode == "apply" and not ctx.training
            and not ctx.bn_calibrate
            and (ctx.compute_dtype == jnp.bfloat16
                 or (ctx.compute_dtype == jnp.float32
                     and getattr(ctx, "mxu_bf16", False)))
            and x.shape[1] % 8 == 0
            and (ctx.shard_local or len(jax.devices()) == 1)
            and FM.pallas_available())


def inverted_res_block(ctx, x, expansion, stride, alpha, filters, block_id,
                       skip_connection, rate=1):
    """Reference _inverted_res_block (deeplabv3p.py:167-206)."""
    inputs = x
    in_channels = x.shape[-1]
    pointwise_filters = make_divisible(int(filters * alpha), 8)
    prefix = f"expanded_conv_{block_id}_" if block_id else "expanded_conv_"

    if _use_fused_block(ctx, x, stride, block_id):
        from deeplab_tpu.kernels import fused_mbconv as FM
        return FM.fused_block_apply(ctx, x, prefix, rate, skip_connection,
                                    interpret=FM.INTERPRET)

    from deeplab_tpu.kernels import fused_mbconv_train as FMT
    if FMT.use_fused_train_block(ctx, x, stride, block_id, prefix):
        # Training fast path: recompute-based multi-phase kernels that keep
        # the 6x-expanded activations out of HBM (fwd AND custom backward).
        return FMT.fused_train_block_apply(ctx, x, prefix, rate,
                                           skip_connection,
                                           interpret=FMT.INTERPRET)

    if block_id:
        x = conv2d(ctx, x, expansion * in_channels, 1, prefix + "expand")
        x = batch_norm(ctx, x, prefix + "expand_BN", epsilon=1e-3, momentum=0.999)
        x = relu6(x)

    x = depthwise_conv2d(ctx, x, 3, prefix + "depthwise", stride=stride, rate=rate)
    x = batch_norm(ctx, x, prefix + "depthwise_BN", epsilon=1e-3, momentum=0.999)
    x = relu6(x)

    x = conv2d(ctx, x, pointwise_filters, 1, prefix + "project")
    x = batch_norm(ctx, x, prefix + "project_BN", epsilon=1e-3, momentum=0.999)

    if skip_connection:
        return inputs + x
    return x


# (filters, stride, expansion, block_id, skip, rate) — deeplabv3p.py:327-367
BLOCK_TABLE = (
    (16, 1, 1, 0, False, 1),
    (24, 2, 6, 1, False, 1),
    (24, 1, 6, 2, True, 1),
    (32, 2, 6, 3, False, 1),
    (32, 1, 6, 4, True, 1),
    (32, 1, 6, 5, True, 1),
    (64, 1, 6, 6, False, 1),   # stride changed 2->1 in DeepLab variant
    (64, 1, 6, 7, True, 2),
    (64, 1, 6, 8, True, 2),
    (64, 1, 6, 9, True, 2),
    (96, 1, 6, 10, False, 2),
    (96, 1, 6, 11, True, 2),
    (96, 1, 6, 12, True, 2),
    (160, 1, 6, 13, False, 2),
    (160, 1, 6, 14, True, 4),
    (160, 1, 6, 15, True, 4),
    (320, 1, 6, 16, False, 4),
)


def backbone(ctx, x, alpha: float = 1.0):
    """Stem + 17 blocks. Input is the normalized image; output stride 8.

    ``jax.named_scope`` labels are pure HLO metadata (no runtime cost);
    they survive autodiff (bwd ops keep the scope under ``transpose(...)``)
    so tools/profile_train.py can bucket a trace by region."""
    import jax
    first_block_filters = make_divisible(32 * alpha, 8)
    with jax.named_scope("stem"):
        x = conv2d(ctx, x, first_block_filters, 3, "Conv", stride=2)
        x = batch_norm(ctx, x, "Conv_BN", epsilon=1e-3, momentum=0.999)
        x = relu6(x)
    for filters, stride, expansion, block_id, skip, rate in BLOCK_TABLE:
        with jax.named_scope(f"mb{block_id:02d}s{stride}"):
            x = inverted_res_block(ctx, x, expansion=expansion, stride=stride,
                                   alpha=alpha, filters=filters,
                                   block_id=block_id,
                                   skip_connection=skip, rate=rate)
    return x
