"""Aligned Xception backbone for DeepLabV3+ (reference deeplabv3p.py:119-155,272-313).

Entry flow (strides 2,2,2,entry_block3_stride) -> 16 middle-flow units ->
exit flow with atrous rates.  OS in {8,16} selects stride/rate tables
(deeplabv3p.py:273-282).  The reference's `_xception_block` has a latent
NameError (`layers.add`, deeplabv3p.py:147,149) that makes this path dead
upstream; we implement the intended residual adds.
"""

from __future__ import annotations

import jax

from deeplab_tpu.ops.bn import batch_norm
from deeplab_tpu.ops.conv import conv2d, conv2d_fixed, sep_conv_bn


def xception_block(ctx, x, depth_list, prefix, skip_connection_type, stride,
                   rate=1, depth_activation=False, return_skip=False):
    """Reference _xception_block (deeplabv3p.py:119-155)."""
    inputs = x
    residual = x
    skip = None
    for i in range(3):
        residual = sep_conv_bn(ctx, residual, depth_list[i],
                               f"{prefix}_separable_conv{i + 1}",
                               stride=stride if i == 2 else 1,
                               rate=rate, depth_activation=depth_activation)
        if i == 1:
            skip = residual
    if skip_connection_type == "conv":
        shortcut = conv2d_fixed(ctx, inputs, depth_list[-1], prefix + "_shortcut",
                                kernel_size=1, stride=stride)
        shortcut = batch_norm(ctx, shortcut, prefix + "_shortcut_BN")
        outputs = residual + shortcut
    elif skip_connection_type == "sum":
        outputs = residual + inputs
    else:  # 'none'
        outputs = residual
    if return_skip:
        return outputs, skip
    return outputs


def rate_table(OS: int):
    """(entry_block3_stride, middle_block_rate, exit_block_rates, atrous_rates)."""
    if OS == 8:
        return 1, 2, (2, 4), (12, 24, 36)
    return 2, 1, (1, 2), (6, 12, 18)


def backbone(ctx, x, OS: int = 16):
    """Returns (features, skip1) — skip1 is the stride-4 decoder skip
    (reference deeplabv3p.py:296-298)."""
    entry_block3_stride, middle_block_rate, exit_block_rates, _ = rate_table(OS)

    # jax.named_scope labels are pure HLO metadata (no runtime cost) —
    # tools/profile_xception.py buckets device time by these regions.
    with jax.named_scope("xstem"):
        x = conv2d(ctx, x, 32, 3, "entry_flow_conv1_1", stride=2)
        x = batch_norm(ctx, x, "entry_flow_conv1_1_BN")
        x = jax.nn.relu(x)
        x = conv2d_fixed(ctx, x, 64, "entry_flow_conv1_2", kernel_size=3, stride=1)
        x = batch_norm(ctx, x, "entry_flow_conv1_2_BN")
        x = jax.nn.relu(x)

    with jax.named_scope("xentry1"):
        x = xception_block(ctx, x, [128, 128, 128], "entry_flow_block1",
                           skip_connection_type="conv", stride=2)
    with jax.named_scope("xentry2"):
        x, skip1 = xception_block(ctx, x, [256, 256, 256], "entry_flow_block2",
                                  skip_connection_type="conv", stride=2,
                                  return_skip=True)
    with jax.named_scope("xentry3"):
        x = xception_block(ctx, x, [728, 728, 728], "entry_flow_block3",
                           skip_connection_type="conv",
                           stride=entry_block3_stride)
    for i in range(16):
        with jax.named_scope(f"xmid{i + 1:02d}"):
            x = xception_block(ctx, x, [728, 728, 728],
                               f"middle_flow_unit_{i + 1}",
                               skip_connection_type="sum", stride=1,
                               rate=middle_block_rate)
    with jax.named_scope("xexit1"):
        x = xception_block(ctx, x, [728, 1024, 1024], "exit_flow_block1",
                           skip_connection_type="conv", stride=1,
                           rate=exit_block_rates[0])
    with jax.named_scope("xexit2"):
        x = xception_block(ctx, x, [1536, 1536, 2048], "exit_flow_block2",
                           skip_connection_type="none", stride=1,
                           rate=exit_block_rates[1], depth_activation=True)
    return x, skip1
