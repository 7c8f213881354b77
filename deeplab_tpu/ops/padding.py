"""Padding math reproducing the reference's two padding regimes exactly.

The reference mixes two schemes (SURVEY.md C2/C3):

1. Keras ``padding='same'`` — TF SAME: pad depends on input size and stride,
   ``pad_total = max((ceil(in/s)-1)*s + eff_k - in, 0)``, split low-first
   (``lo = total//2``).  Used by every stride-1 conv and the MobileNetV2
   depthwise convs (reference deeplabv3p.py:73-74,186-188).

2. The manual "fixed" padding: ``ZeroPadding2D((pad_beg, pad_end))`` +
   VALID conv, with ``pad_total = eff_k - 1`` regardless of input size
   (reference deeplabv3p.py:61-69 and 105-116 — the "1 pixel drift" fix).
   Used for stride-2 convs in SepConv_BN and _conv2d_same.

These differ for stride>1 (e.g. in=512,k=3,s=2: SAME pads (0,1), manual pads
(1,1)), so we compute explicit pads and always call XLA convs with them.
"""

from __future__ import annotations

import math


def effective_kernel(kernel_size: int, rate: int) -> int:
    return kernel_size + (kernel_size - 1) * (rate - 1)


def same_pads(in_size: int, kernel_size: int, stride: int, rate: int = 1):
    """TF/Keras SAME padding (lo, hi) for one spatial dim."""
    eff_k = effective_kernel(kernel_size, rate)
    out = math.ceil(in_size / stride)
    pad_total = max((out - 1) * stride + eff_k - in_size, 0)
    lo = pad_total // 2
    return (lo, pad_total - lo)


def manual_pads(kernel_size: int, rate: int = 1):
    """Reference's fixed padding (deeplabv3p.py:64-68): input-size independent."""
    eff_k = effective_kernel(kernel_size, rate)
    pad_total = eff_k - 1
    beg = pad_total // 2
    return (beg, pad_total - beg)


def conv_out_size(in_size: int, kernel_size: int, stride: int, rate: int,
                  pads) -> int:
    eff_k = effective_kernel(kernel_size, rate)
    return (in_size + pads[0] + pads[1] - eff_k) // stride + 1
