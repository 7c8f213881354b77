"""Fused Pallas TPU kernels for the CRF bilateral grid — production path.

Replaces the XLA bilateral splat/slice in ``crf/dense_crf.py`` (reference
semantics: pydensecrf's permutohedral filter, /root/reference/utils.py:74-91).

Why fused: the XLA formulation materializes the per-pixel joint factor
tensors ``t_rg (N, nc^2)`` / ``t_lb (N, nc*L)`` in HBM (~76/145 MB per
512x512 image, re-read by every one of the ~11 filter applications of a
5-iteration mean-field run) and measured ~5% MXU utilization.  Here the
joint factors are built inside the kernel and never leave VMEM.

Measured design rules (v5e, 512x512 / Z=49 cells / nc=11 / L=21):

- pixel-major layouts everywhere: rgb planes ``(Z, 3, P)``, values
  ``(Z, L, P)`` — an ``(..., nc)`` or ``(..., L)`` minor axis would be
  tile-padded to 128 lanes in HBM (~6-12x bloat);
- factor expansion on the VPU via integer-iota compares, NOT one-hot
  selector matmuls: a (C, nc) @ (nc, P) "expansion matmul" pays for K=128
  on the MXU no matter that K=11, and measured nearly as expensive as the
  real contraction;
- every MXU contraction is canonical (M, K) @ (K, N): contracting
  minor-vs-minor forces Mosaic relayouts of (256, CHUNK) operands and
  measured ~40x slower;
- the grid is stored transposed, ``G (Z, D, C)``, so the slice contraction
  ``G @ t_rg`` is canonical with zero transposes; the splat pays one
  in-kernel transpose of t_rg (C, CHUNK) -> (CHUNK, C) instead (MXU
  128x128 transposes, cheap);
- the d axis is b-MAJOR: ``d = b * L + l`` — so the lb-joint build
  (splat) and the b-sum (slice) are nc cheap (L, CHUNK)-sized
  multiply/adds against broadcast (1, CHUNK) rows, replacing a K=21
  expansion matmul, an M=21 reduction matmul, and two (D, CHUNK)
  elementwise passes.

Result: splat 0.27 ms, slice 0.18 ms per 512x512 apply (was 1.2/1.8 with
selector-matmul kernels, ~3.5 ms with the XLA path).

The 5-D grid blur between splat and slice stays in XLA (G is only ~5 MB;
three small banded matmuls — see ``crf/dense_crf.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _base_frac(plane, inv_step: float):
    # rgb planes may be stored bf16 (exact for 8-bit image values); the
    # grid coordinates are always computed in f32
    coords = plane.astype(jnp.float32) * inv_step
    base = jnp.floor(coords)
    return base.astype(jnp.int32), coords - base


def _c_pad(nc: int) -> int:
    """The grid's joint-color axis padded to the 128-lane tile.  Keeping C
    at its 128-padding in HBM makes the (B*Z, D, C) <-> (B, Z, D*C) reshape
    around the cross-cell blur a free bitcast (the padded layout IS the
    flat layout) and every grid matmul K/N-aligned."""
    C = nc * nc
    return -(-C // 128) * 128


def _t_rg_row(rgb_ref, inv_step: float, nc: int):
    """Joint (r, g) splat factor, (C_pad, CHUNK) f32, c = r*nc + g; rows
    past nc*nc are zeroed (they exist only for lane alignment).

    2-tap linear splat per channel: weight (1-frac) at floor(x), frac at
    floor(x)+1, expanded jointly via iota compares on the VPU.
    """
    br, fr = _base_frac(rgb_ref[0, 0:1], inv_step)
    bg, fg = _base_frac(rgb_ref[0, 1:2], inv_step)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (_c_pad(nc), 1), 0)
    cr, cg = iota_c // nc, iota_c % nc
    w_r = jnp.where(cr == br, 1.0 - fr, 0.0) + jnp.where(cr == br + 1, fr, 0.0)
    w_g = jnp.where(cg == bg, 1.0 - fg, 0.0) + jnp.where(cg == bg + 1, fg, 0.0)
    return jnp.where(iota_c < nc * nc, w_r * w_g, 0.0)


def _b_weight(bb, fb, b: int):
    """(1, CHUNK) weight of color-b bin ``b``."""
    return jnp.where(bb == b, 1.0 - fb, 0.0) + jnp.where(bb == b - 1, fb, 0.0)


def _splat_kernel(rgb_ref, v_ref, n_ref, out_ref, *, nc, L, inv_step):
    k = pl.program_id(1)
    t_rg = _t_rg_row(rgb_ref, inv_step, nc).astype(jnp.bfloat16)  # (C, CHUNK)
    t_rg_c = jnp.swapaxes(t_rg, 0, 1)                             # (CHUNK, C)
    bb, fb = _base_frac(rgb_ref[0, 2:3], inv_step)
    # per-pixel scale (the mean-field normalization) folded into the splat
    vb = (v_ref[0] * n_ref[0]).astype(jnp.bfloat16)               # (L, CHUNK)
    t_lb = jnp.concatenate(
        [vb * _b_weight(bb, fb, b).astype(jnp.bfloat16) for b in range(nc)],
        axis=0)                                                   # (D, CHUNK)
    contrib = jnp.dot(t_lb, t_rg_c,
                      preferred_element_type=jnp.float32)         # (D, C_pad)

    @pl.when(k == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(k != 0)
    def _():
        out_ref[0] += contrib


def _slice_kernel(rgb_ref, g_ref, brg_ref, out_ref, *, nc, L, inv_step,
                  bb_taps):
    # fused color blur on the (D, C) cell grid (the z-blur across cells
    # happened in XLA) + slice
    out_ref[0] = _blur_slice(g_ref, brg_ref, rgb_ref, nc=nc, L=L,
                             inv_step=inv_step, bb_taps=bb_taps)


def _blur_slice(g_ref, brg_ref, rgb_ref, *, nc, L, inv_step, bb_taps):
    """Shared slice body: fused color blur of the cell grid + slice.
    Returns the filtered values (L, CHUNK) f32.  The grid may arrive bf16
    (the splat accumulated f32; the z-blur ships it back at half width)."""
    g = jnp.dot(g_ref[0].astype(jnp.bfloat16),
                brg_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)               # (D, C)
    radius = len(bb_taps) // 2
    pieces = []
    for b in range(nc):
        acc = None
        for off in range(-radius, radius + 1):
            b2 = b + off
            if not 0 <= b2 < nc:
                continue
            term = g[b2 * L:(b2 + 1) * L] * bb_taps[off + radius]
            acc = term if acc is None else acc + term
        pieces.append(acc)
    g = jnp.concatenate(pieces, axis=0)                           # (D, C)
    t_rg = _t_rg_row(rgb_ref, inv_step, nc).astype(jnp.bfloat16)  # (C, CHUNK)
    m = jnp.dot(g.astype(jnp.bfloat16), t_rg,
                preferred_element_type=jnp.float32)               # (D, CHUNK)
    bb, fb = _base_frac(rgb_ref[0, 2:3], inv_step)
    out = m[0:L] * _b_weight(bb, fb, 0)
    for b in range(1, nc):
        out = out + m[b * L:(b + 1) * L] * _b_weight(bb, fb, b)
    return out                                                    # (L, CHUNK)


def _mf_step_kernel(rgb_ref, g_ref, brg_ref, u_ref, fg_ref, q_ref, gn_ref,
                    bn_ref, bs_ref, out_ref, out_a_ref, *, nc, L, inv_step,
                    bb_taps, cg, cb):
    """Fused mean-field iteration tail: slice + both message normalizations
    + compatibility combine + softmax -> Q_next.  One HBM write per
    iteration instead of five round-trips through XLA elementwise.  Also
    emits A = Q_next * g_norm — the next iteration's spatial-filter input —
    saving that elementwise pass too."""
    filt = _blur_slice(g_ref, brg_ref, rgb_ref, nc=nc, L=L,
                       inv_step=inv_step, bb_taps=bb_taps)
    # inputs may be stored bf16 (HBM traffic); all arithmetic in f32
    q = q_ref[0].astype(jnp.float32)
    gn = gn_ref[0]
    bn = bn_ref[0]
    # spatial message: fg is the raw filtered (Q * gn); exclude self, scale
    msg_g = (fg_ref[0].astype(jnp.float32) - q * gn) * gn
    # bilateral message: filt already excludes nothing; remove self-weight
    msg_b = (filt - bs_ref[0] * bn * q) * bn
    logits = -u_ref[0].astype(jnp.float32) + cg * msg_g + cb * msg_b
    mx = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - mx)
    q_next = e / jnp.sum(e, axis=0, keepdims=True)
    out_ref[0] = q_next.astype(out_ref.dtype)
    out_a_ref[0] = (q_next * gn).astype(out_a_ref.dtype)


def _rgb_spec(chunk):
    return pl.BlockSpec((1, 3, chunk), lambda z, k: (z, 0, k),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("nc", "L", "inv_step", "chunk",
                                    "interpret"))
def splat_planes(rgb, values, scale=None, *, nc: int, L: int,
                 inv_step: float, chunk: int = 0,
                 interpret: bool = False) -> jnp.ndarray:
    """rgb: (Z, 3, P) f32 0-255 planes; values: (Z, L, P); scale: optional
    (Z, 1, P) per-pixel multiplier folded into the splat (the mean-field
    normalization).  Returns the transposed splatted grid G: (Z, D, C) f32
    with D = nc*L (d = b*L + l), C = nc*nc (c = r*nc + g)."""
    Z, _, P = rgb.shape
    chunk = chunk or P
    assert P % chunk == 0, (P, chunk)
    if scale is None:
        scale = jnp.ones((Z, 1, P), jnp.float32)
    return pl.pallas_call(
        functools.partial(_splat_kernel, nc=nc, L=L, inv_step=inv_step),
        grid=(Z, P // chunk),
        in_specs=[_rgb_spec(chunk),
                  pl.BlockSpec((1, L, chunk), lambda z, k: (z, 0, k),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, chunk), lambda z, k: (z, 0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nc * L, _c_pad(nc)),
                               lambda z, k: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, nc * L, _c_pad(nc)), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(rgb, values, scale.astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("nc", "L", "inv_step", "bb_taps", "chunk",
                                    "interpret"))
def slice_planes(rgb, grid_t, brg, *, nc: int, L: int, inv_step: float,
                 bb_taps: tuple = (1.0,), chunk: int = 0,
                 interpret: bool = False) -> jnp.ndarray:
    """rgb: (Z, 3, P) f32 planes; grid_t: (Z, D, C) as from splat_planes,
    already blurred ACROSS cells (z); brg: (C, C) joint (r, g) blur matrix
    and bb_taps: static b-blur band row — both applied in-kernel.
    Returns sliced values: (Z, L, P) f32."""
    Z, _, P = rgb.shape
    chunk = chunk or P
    assert P % chunk == 0, (P, chunk)
    C = _c_pad(nc)
    return pl.pallas_call(
        functools.partial(_slice_kernel, nc=nc, L=L, inv_step=inv_step,
                          bb_taps=bb_taps),
        grid=(Z, P // chunk),
        in_specs=[_rgb_spec(chunk),
                  pl.BlockSpec((1, nc * L, C), lambda z, k: (z, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), lambda z, k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L, chunk), lambda z, k: (z, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, L, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(rgb, grid_t.astype(jnp.float32), brg.astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("nc", "L", "inv_step", "bb_taps",
                                    "cg", "cb", "chunk", "interpret"))
def mf_step_planes(rgb, grid_t, brg, unary, f_gauss, q, g_norm, b_norm,
                   b_self, *, nc: int, L: int, inv_step: float,
                   bb_taps: tuple, cg: float, cb: float, chunk: int = 0,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused mean-field iteration tail (see ``_mf_step_kernel``).

    rgb (Z,3,P); grid_t (Z,D,C) z-blurred (f32 or bf16); brg (C,C);
    unary/q (Z,L,P); f_gauss (Z,L,P) = spatial-filtered (q * g_norm);
    g_norm/b_norm/b_self (Z,1,P).  Returns (Q_next, Q_next * g_norm),
    both (Z,L,P) in q's dtype.
    """
    Z, _, P = rgb.shape
    C = _c_pad(nc)
    if not chunk:
        # keep the (D, CHUNK) slice intermediate + elementwise blocks in VMEM
        chunk = P
        while nc * L * chunk * 4 > (6 << 20) and chunk % 2 == 0:
            chunk //= 2
    assert P % chunk == 0, (P, chunk)
    lspec = pl.BlockSpec((1, L, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((1, 1, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mf_step_kernel, nc=nc, L=L, inv_step=inv_step,
                          bb_taps=bb_taps, cg=cg, cb=cb),
        grid=(Z, P // chunk),
        in_specs=[_rgb_spec(chunk),
                  pl.BlockSpec((1, nc * L, C), lambda z, k: (z, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), lambda z, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  lspec, lspec, lspec, nspec, nspec, nspec],
        out_specs=(lspec, lspec),
        out_shape=(jax.ShapeDtypeStruct((Z, L, P), q.dtype),
                   jax.ShapeDtypeStruct((Z, L, P), q.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(rgb, grid_t, brg.astype(jnp.float32),
      unary, f_gauss, q, g_norm.astype(jnp.float32),
      b_norm.astype(jnp.float32), b_self.astype(jnp.float32))
