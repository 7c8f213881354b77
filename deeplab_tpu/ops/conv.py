"""Functional conv primitives with the reference's exact padding regimes.

All convs run NHWC with HWIO kernels (the Keras/TF layout — direct .h5 weight
compat and the layout XLA:TPU prefers).  Accumulation is forced to float32 via
``preferred_element_type`` so bfloat16 activations keep full MXU precision.

Layer helpers mirror the reference builders:
  - ``conv2d``          -> Keras Conv2D, padding='same' (TF SAME)
  - ``conv2d_fixed``    -> reference _conv2d_same (deeplabv3p.py:87-116)
  - ``depthwise_conv2d``-> Keras DepthwiseConv2D
  - ``sep_conv_bn``     -> reference SepConv_BN (deeplabv3p.py:47-84)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deeplab_tpu.ops import init as inits
from deeplab_tpu.ops.bn import batch_norm
from deeplab_tpu.ops.padding import manual_pads, same_pads

_DN = jax.lax.conv_dimension_numbers  # cached per-shape by jax


def _conv(x, kernel, stride: int, rate: int, pads, feature_group_count: int = 1,
          mxu_bf16: bool = False):
    dn = _DN(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    # float32 runs at HIGHEST precision (the logit-parity contract vs the
    # reference's f32 CUDA kernels); bfloat16 uses the fast MXU path with
    # native bf16 output (the MXU accumulates in f32 internally; forcing
    # preferred_element_type=f32 here breaks the conv VJP's dtype symmetry).
    # mxu_bf16 (the 'mixed' policy, core.Ctx.mxu_bf16): f32 activations with
    # DEFAULT precision — one bf16 MXU pass, f32 accumulation/output.
    if x.dtype == jnp.float32:
        precision = (jax.lax.Precision.DEFAULT if mxu_bf16
                     else jax.lax.Precision.HIGHEST)
        preferred = jnp.float32
    else:
        precision = jax.lax.Precision.DEFAULT
        preferred = None
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[pads, pads] if isinstance(pads[0], int) else pads,
        rhs_dilation=(rate, rate),
        dimension_numbers=dn,
        feature_group_count=feature_group_count,
        precision=precision,
        preferred_element_type=preferred,
    ).astype(x.dtype)


def conv2d(ctx, x, filters: int, kernel_size: int, name: str, stride: int = 1,
           rate: int = 1, use_bias: bool = False, padding: str = "same",
           kernel_init=inits.glorot_uniform):
    """Keras Conv2D. ``padding`` in {'same','valid'} (TF semantics)."""
    cin = x.shape[-1]
    kernel = ctx.param(name, "kernel", (kernel_size, kernel_size, cin, filters),
                       kernel_init)
    if padding == "same":
        ph = same_pads(x.shape[1], kernel_size, stride, rate)
        pw = same_pads(x.shape[2], kernel_size, stride, rate)
    else:
        ph = pw = (0, 0)
    y = _conv(x, kernel, stride, rate, [ph, pw],
              mxu_bf16=getattr(ctx, "mxu_bf16", False))
    if use_bias:
        bias = ctx.param(name, "bias", (filters,), inits.zeros)
        y = y + bias.astype(y.dtype)
    return y


def conv2d_fixed(ctx, x, filters: int, name: str, stride: int = 1,
                 kernel_size: int = 3, rate: int = 1):
    """Reference ``_conv2d_same``: stride=1 -> SAME; stride>1 -> manual fixed
    padding + VALID (the "1 pixel drift" fix, deeplabv3p.py:89)."""
    if stride == 1:
        return conv2d(ctx, x, filters, kernel_size, name, stride=1, rate=rate)
    cin = x.shape[-1]
    kernel = ctx.param(name, "kernel", (kernel_size, kernel_size, cin, filters),
                       inits.glorot_uniform)
    p = manual_pads(kernel_size, rate)
    return _conv(x, kernel, stride, rate, [p, p],
                 mxu_bf16=getattr(ctx, "mxu_bf16", False))


def depthwise_conv2d(ctx, x, kernel_size: int, name: str, stride: int = 1,
                     rate: int = 1, padding: str = "same",
                     explicit_pads: Optional[Tuple[int, int]] = None):
    """Keras DepthwiseConv2D (depth_multiplier=1, no bias).

    Keras stores the kernel as (kh, kw, in, 1); XLA's grouped conv wants
    (kh, kw, 1, in).  We keep the Keras layout in the param tree (h5 contract)
    and transpose at call time (free — fused into the conv's layout pass).
    """
    cin = x.shape[-1]
    kernel = ctx.param(name, "depthwise_kernel", (kernel_size, kernel_size, cin, 1),
                       inits.glorot_uniform)
    k = jnp.transpose(kernel, (0, 1, 3, 2))  # -> (kh, kw, 1, cin)
    if explicit_pads is not None:
        ph = pw = explicit_pads
    elif padding == "same":
        ph = same_pads(x.shape[1], kernel_size, stride, rate)
        pw = same_pads(x.shape[2], kernel_size, stride, rate)
    else:
        ph = pw = (0, 0)
    return _conv(x, k, stride, rate, [ph, pw], feature_group_count=cin,
                 mxu_bf16=getattr(ctx, "mxu_bf16", False))


def sep_conv_bn(ctx, x, filters: int, prefix: str, stride: int = 1,
                kernel_size: int = 3, rate: int = 1,
                depth_activation: bool = False, epsilon: float = 1e-3):
    """Reference SepConv_BN (deeplabv3p.py:47-84).

    [not depth_activation: ReLU first] -> depthwise(rate, stride; manual pad if
    stride>1) -> BN -> [ReLU] -> pointwise 1x1 -> BN -> [ReLU].
    """
    # NOTE (measured negative result, round 3): a fused SepConv Pallas
    # kernel exists (kernels/fused_mbconv.py::fused_sepconv, parity-tested)
    # but is NOT wired in: on-chip A/B at 512x512/bs=16 measured the
    # Xception model-only rate DROPPING 685 -> 517 img/s with it enabled.
    # Without an expand stage there is no 6x HBM tensor to save, and the
    # roll-based depthwise on 728-channel f32 tiles loses to XLA's
    # depthwise (the same conclusion as round 2's kernels/fused_dw.py).
    # The inverted-residual fusion (models/mobilenetv2.py) keeps its win
    # because the expand/project matmuls amortize the tap machinery.

    if stride == 1:
        dw_pads, dw_padding = None, "same"
    else:
        dw_pads, dw_padding = manual_pads(kernel_size, rate), "valid"

    if not depth_activation:
        x = jax.nn.relu(x)
    x = depthwise_conv2d(ctx, x, kernel_size, prefix + "_depthwise",
                         stride=stride, rate=rate, padding=dw_padding,
                         explicit_pads=dw_pads)
    x = batch_norm(ctx, x, prefix + "_depthwise_BN", epsilon=epsilon)
    if depth_activation:
        x = jax.nn.relu(x)
    x = conv2d(ctx, x, filters, 1, prefix + "_pointwise")
    x = batch_norm(ctx, x, prefix + "_pointwise_BN", epsilon=epsilon)
    if depth_activation:
        x = jax.nn.relu(x)
    return x


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), jnp.asarray(6.0, x.dtype))
