"""Fused inverted-residual (MBConv) forward: expand -> dilated depthwise ->
project in ONE VMEM-resident Pallas kernel.

MobileNetV2's 6x-expanded activations are the model's dominant HBM traffic:
XLA's un-fused pipeline writes the (B, H, W, 6C) tensor after the expand,
reads+writes it around the depthwise, and reads it again for the project —
four full passes per block (reference block structure: deeplabv3p.py:167-206).
This kernel keeps the expanded tensor in VMEM: per 8-image-row tile it runs
the expand matmul (MXU), the 3x3 (possibly dilated) depthwise as 9
shifted fused multiply-adds (VPU), and the project matmul (MXU), touching
HBM only for the block's input and output.

Measured (v5e, bs=64, 64x64 feature maps, bf16): 1.2x XLA for the
64->384->64 rate-2 blocks, 1.44x for 160->960->160 rate-4 — after two
Mosaic-specific lessons baked in below:
  - tap access must be `pltpu.roll` + an offset-0 slice; the obvious 9
    unaligned static slices force sublane relayout copies (4x slower);
  - rolls only lower for 32-bit data, so the expanded tile stays f32.

Inference only (stride 1, expand present); BN is eval-mode affine and is
folded into the conv weights by the wrapper.  The f32 parity path and all
training keep the XLA composition.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# opt-out knob for A/B runs: deeplab_tpu.kernels.fused_mbconv.ENABLED = False
ENABLED = True
# test hook: run the Pallas kernels in interpret mode (CPU), see tests/
INTERPRET = False


@functools.partial(jax.jit,
                   static_argnames=("rate", "skip", "rows_t", "mxu_bf16",
                                    "interpret"))
def fused_mbconv(x, w1, b1, wdw, bdw, w2, b2, *, rate: int, skip: bool,
                 rows_t: int = 8, mxu_bf16: bool = False,
                 interpret: bool = False):
    """x: (B, H, W, Cin) bf16/f32; w1 (Cin, Ce); wdw (16, Ce) f32 taps
    ((dy, dx) row-major in the first 9 rows, sublane-padded); w2 (Ce, Cout);
    b1/bdw/b2 (1, C*) f32 biases with BN folded.  Stride 1, 'same' padding,
    dilation ``rate``; ``skip`` adds the residual input.

    ``mxu_bf16`` is the fused twin of the 'mixed' serving policy
    (core.Ctx.mxu_bf16): x/out stay float32 in HBM, but the two matmuls'
    inputs are cast to bf16 inside the kernel (one bf16 MXU pass, f32
    accumulation — the same rounding XLA's Precision.DEFAULT applies to an
    f32 conv).  The depthwise taps run f32 on the VPU in every mode."""
    B, H, W, Cin = x.shape
    Ce = w1.shape[1]
    Cout = w2.shape[1]
    assert H % rows_t == 0, (H, rows_t)
    nt = H // rows_t
    P = rows_t * W
    HP = rate * W
    n_e = P + 2 * HP
    xp = x.reshape(B * nt, P, Cin)

    spec = lambda im: pl.BlockSpec((1, P, Cin), im, memory_space=pltpu.VMEM)
    wspec = lambda shp: pl.BlockSpec(shp, lambda z: (0, 0),
                                     memory_space=pltpu.VMEM)

    def kern(prev_ref, cur_ref, next_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
             w2_ref, b2_ref, out_ref):
        z = pl.program_id(0)
        t = z % nt
        # interior tiles take the neighbor plane's edge rows as halo
        top = prev_ref[0, P - HP:, :]
        bot = next_ref[0, :HP, :]
        xt = jnp.concatenate([top, cur_ref[0], bot], axis=0)  # (n_e, Cin)
        xin = xt.astype(jnp.bfloat16) if mxu_bf16 else xt
        e = jnp.dot(xin, w1_ref[...], preferred_element_type=jnp.float32)
        e = jnp.clip(e + b1_ref[0], 0.0, 6.0)  # f32: Mosaic rotates are 32-bit
        # 'same' zero padding acts on the depthwise INPUT, i.e. on e:
        # at image-edge tiles the halo rows must be 0, not relu6(b1)
        row = jax.lax.broadcasted_iota(jnp.int32, (n_e, 1), 0)
        edge_ok = (((row >= HP) | (t != 0))
                   & ((row < HP + P) | (t != nt - 1)))
        e = jnp.where(edge_ok, e, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_e, 1), 0) % W
        acc = jnp.zeros((P, Ce), jnp.float32) + bdw_ref[0]
        # 3 lane-wrap rolls (one per dx; wrapped pixels are column-masked),
        # then 9 sublane-ALIGNED band slices at dy*W offsets
        for j, dx in enumerate((-rate, 0, rate)):
            r_ = e if dx == 0 else pltpu.roll(e, (n_e - dx) % n_e, 0)
            if dx > 0:
                r_ = jnp.where(col < W - dx, r_, 0.0)
            elif dx < 0:
                r_ = jnp.where(col >= -dx, r_, 0.0)
            for i, dy in enumerate((-rate, 0, rate)):
                off = HP + dy * W
                acc = acc + r_[off:off + P, :] * wdw_ref[i * 3 + j]
        y = jnp.clip(acc, 0.0, 6.0).astype(
            jnp.bfloat16 if mxu_bf16 else cur_ref.dtype)
        o = jnp.dot(y, w2_ref[...], preferred_element_type=jnp.float32)
        o = o + b2_ref[0]
        if skip:
            o = o + cur_ref[0]
        out_ref[0] = o.astype(out_ref.dtype)

    def idx_c(z): return (z, 0, 0)
    def idx_p(z): return (jnp.maximum(z - 1, 0), 0, 0)
    def idx_n(z): return (jnp.minimum(z + 1, B * nt - 1), 0, 0)

    out = pl.pallas_call(
        kern,
        grid=(B * nt,),
        in_specs=[spec(idx_p), spec(idx_c), spec(idx_n),
                  wspec((Cin, Ce)), wspec((1, Ce)),
                  pl.BlockSpec((16, Ce), lambda z: (0, 0),
                               memory_space=pltpu.VMEM),
                  wspec((1, Ce)), wspec((Ce, Cout)), wspec((1, Cout))],
        out_specs=pl.BlockSpec((1, P, Cout), idx_c, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nt, P, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, xp, xp, w1, b1, wdw, bdw, w2, b2)
    return out.reshape(B, H, W, Cout)


@functools.partial(jax.jit,
                   static_argnames=("rate", "pre_relu", "act_mid", "act_out",
                                    "rows_t", "interpret"))
def fused_sepconv(x, wdw, bdw, wpw, bpw, *, rate: int, pre_relu: bool,
                  act_mid: bool, act_out: bool, rows_t: int = 8,
                  interpret: bool = False):
    """Fused SepConv_BN forward (reference deeplabv3p.py:47-84, stride 1):
    [relu] -> 3x3 dilated depthwise (+folded BN) -> [relu] -> pointwise
    (+folded BN) -> [relu], with the depthwise output living only in VMEM.
    Same tap machinery as :func:`fused_mbconv` (rolls + aligned bands).

    KEPT AS A MEASURED NEGATIVE RESULT (parity-tested, not wired into
    ops/conv.py::sep_conv_bn): on-chip A/B at 512x512/bs=16 the Xception
    model-only rate dropped 685 -> 517 img/s — without an expand stage
    there is no 6x HBM tensor to save and the roll-based depthwise loses
    to XLA's (round-2 fused_dw conclusion, reconfirmed at block scope).

    x: (B, H, W, Cin); wdw (16, Cin) f32 folded taps; wpw (Cin, Cout)."""
    B, H, W, Cin = x.shape
    Cout = wpw.shape[1]
    assert H % rows_t == 0, (H, rows_t)
    nt = H // rows_t
    P = rows_t * W
    HP = rate * W
    n_e = P + 2 * HP
    xp = x.reshape(B * nt, P, Cin)

    spec = lambda im: pl.BlockSpec((1, P, Cin), im, memory_space=pltpu.VMEM)
    wspec = lambda shp: pl.BlockSpec(shp, lambda z: (0, 0),
                                     memory_space=pltpu.VMEM)

    def kern(prev_ref, cur_ref, next_ref, wdw_ref, bdw_ref, wpw_ref,
             bpw_ref, out_ref):
        z = pl.program_id(0)
        t = z % nt
        top = prev_ref[0, P - HP:, :]
        bot = next_ref[0, :HP, :]
        xt = jnp.concatenate([top, cur_ref[0], bot],
                             axis=0).astype(jnp.float32)
        if pre_relu:
            xt = jnp.maximum(xt, 0.0)
        # 'same' zero padding of the depthwise input at image edges
        row = jax.lax.broadcasted_iota(jnp.int32, (n_e, 1), 0)
        edge_ok = (((row >= HP) | (t != 0))
                   & ((row < HP + P) | (t != nt - 1)))
        xt = jnp.where(edge_ok, xt, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_e, 1), 0) % W
        acc = jnp.zeros((P, Cin), jnp.float32) + bdw_ref[0]
        for j, dx in enumerate((-rate, 0, rate)):
            r_ = xt if dx == 0 else pltpu.roll(xt, (n_e - dx) % n_e, 0)
            if dx > 0:
                r_ = jnp.where(col < W - dx, r_, 0.0)
            elif dx < 0:
                r_ = jnp.where(col >= -dx, r_, 0.0)
            for i, dy in enumerate((-rate, 0, rate)):
                off = HP + dy * W
                acc = acc + r_[off:off + P, :] * wdw_ref[i * 3 + j]
        if act_mid:
            acc = jnp.maximum(acc, 0.0)
        o = jnp.dot(acc.astype(cur_ref.dtype), wpw_ref[...],
                    preferred_element_type=jnp.float32)
        o = o + bpw_ref[0]
        if act_out:
            o = jnp.maximum(o, 0.0)
        out_ref[0] = o.astype(out_ref.dtype)

    def idx_c(z): return (z, 0, 0)
    def idx_p(z): return (jnp.maximum(z - 1, 0), 0, 0)
    def idx_n(z): return (jnp.minimum(z + 1, B * nt - 1), 0, 0)

    out = pl.pallas_call(
        kern,
        grid=(B * nt,),
        in_specs=[spec(idx_p), spec(idx_c), spec(idx_n),
                  pl.BlockSpec((16, Cin), lambda z: (0, 0),
                               memory_space=pltpu.VMEM),
                  wspec((1, Cin)), wspec((Cin, Cout)), wspec((1, Cout))],
        out_specs=pl.BlockSpec((1, P, Cout), idx_c, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nt, P, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, xp, xp, wdw, bdw, wpw, bpw)
    return out.reshape(B, H, W, Cout)


def _fold_bn(gamma, beta, mean, var, eps):
    # traced (params are jit arguments); same f32 rsqrt as ops/bn.py
    s = (gamma.astype(jnp.float32)
         * jax.lax.rsqrt(var.astype(jnp.float32) + eps))
    return s, beta.astype(jnp.float32) - mean.astype(jnp.float32) * s


def fused_block_apply(ctx, x, prefix: str, rate: int, skip: bool,
                      interpret: bool = False):
    """Run one inverted-residual block (expand present, stride 1) through
    the fused kernel, reading the SAME ctx params/stats as the XLA path
    (models/mobilenetv2.py) and folding the eval-mode BNs into the convs.
    Caller guarantees eval mode (moving stats) — see inverted_res_block."""
    eps = 1e-3
    p = ctx.params
    st = ctx.state
    w1 = p[prefix + "expand"]["kernel"][0, 0]            # (Cin, Ce)
    bn1 = p[prefix + "expand_BN"], st[prefix + "expand_BN"]
    s1, t1 = _fold_bn(bn1[0]["gamma"], bn1[0]["beta"],
                      bn1[1]["moving_mean"], bn1[1]["moving_variance"], eps)
    wdw = p[prefix + "depthwise"]["depthwise_kernel"]     # (3, 3, Ce, 1)
    bnd = p[prefix + "depthwise_BN"], st[prefix + "depthwise_BN"]
    sd, td = _fold_bn(bnd[0]["gamma"], bnd[0]["beta"],
                      bnd[1]["moving_mean"], bnd[1]["moving_variance"], eps)
    w2 = p[prefix + "project"]["kernel"][0, 0]            # (Ce, Cout)
    bn2 = p[prefix + "project_BN"], st[prefix + "project_BN"]
    s2, t2 = _fold_bn(bn2[0]["gamma"], bn2[0]["beta"],
                      bn2[1]["moving_mean"], bn2[1]["moving_variance"], eps)

    dt = ctx.compute_dtype
    # 'mixed' policy: activations stay f32 (dt), matmul weights go bf16 and
    # the kernel casts its dot inputs to bf16 (see fused_mbconv docstring)
    mxu = bool(getattr(ctx, "mxu_bf16", False)) and dt == jnp.float32
    wdt = jnp.bfloat16 if mxu else dt
    Ce = w1.shape[1]
    w1f = (w1.astype(jnp.float32) * s1).astype(wdt)
    wdwf = (wdw[..., 0].reshape(9, Ce).astype(jnp.float32) * sd)
    wdwf = jnp.pad(wdwf, ((0, 7), (0, 0)))               # sublane pad
    w2f = (w2.astype(jnp.float32) * s2).astype(wdt)
    return fused_mbconv(x.astype(dt), w1f, t1.reshape(1, -1), wdwf,
                        td.reshape(1, -1), w2f, t2.reshape(1, -1),
                        rate=rate, skip=skip, mxu_bf16=mxu,
                        interpret=interpret)


def fused_sepconv_apply(ctx, x, prefix: str, rate: int,
                        depth_activation: bool, epsilon: float,
                        interpret: bool = False):
    """Run one SepConv_BN (stride 1) through the fused kernel, reading the
    SAME ctx params/stats as ops/conv.py::sep_conv_bn and folding the
    eval-mode BNs.  Caller guarantees eval mode."""
    p = ctx.params
    st = ctx.state
    wdw = p[prefix + "_depthwise"]["depthwise_kernel"]      # (3, 3, Cin, 1)
    bnd = p[prefix + "_depthwise_BN"], st[prefix + "_depthwise_BN"]
    sd, td = _fold_bn(bnd[0]["gamma"], bnd[0]["beta"],
                      bnd[1]["moving_mean"], bnd[1]["moving_variance"],
                      epsilon)
    wpw = p[prefix + "_pointwise"]["kernel"][0, 0]          # (Cin, Cout)
    bnp = p[prefix + "_pointwise_BN"], st[prefix + "_pointwise_BN"]
    sp_, tp = _fold_bn(bnp[0]["gamma"], bnp[0]["beta"],
                       bnp[1]["moving_mean"], bnp[1]["moving_variance"],
                       epsilon)
    dt = ctx.compute_dtype
    Cin = wdw.shape[2]
    wdwf = (wdw[..., 0].reshape(9, Cin).astype(jnp.float32) * sd)
    wdwf = jnp.pad(wdwf, ((0, 7), (0, 0)))
    wpwf = (wpw.astype(jnp.float32) * sp_).astype(dt)
    return fused_sepconv(x.astype(dt), wdwf, td.reshape(1, -1), wpwf,
                         tp.reshape(1, -1), rate=rate,
                         pre_relu=not depth_activation,
                         act_mid=depth_activation,
                         act_out=depth_activation, interpret=interpret)
