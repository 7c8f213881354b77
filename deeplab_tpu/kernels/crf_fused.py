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
- factor expansion on the VPU via hat functions ``relu(1 - |bin - coord|)``
  against an iota bin grid (see ``_t_rg_row``), NOT one-hot selector
  matmuls: a (C, nc) @ (nc, P) "expansion matmul" pays for K=128 on the
  MXU no matter that K=11, and measured nearly as expensive as the real
  contraction; the hat form also measured ~8% faster end-to-end than
  iota-compare/select pairs;
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


def _d_pad(nc: int, L: int) -> int:
    """The grid's d = b*L + l axis padded to the 16-sublane bf16 tile, for
    the same free-bitcast reason as ``_c_pad``: with D = nc*L = 189 the
    flatten around the cross-cell blur was a real 2x-copy per iteration
    (profiled ~4% of CRF time).  The pad rows are written as zeros by the
    splat and never read back by the slice."""
    return -(-(nc * L) // 16) * 16


def _t_rg_row(rgb_ref, inv_step: float, nc: int):
    """Joint (r, g) splat factor, (C_pad, CHUNK) f32, c = r*nc + g; rows
    past nc*nc are zeroed (they exist only for lane alignment).

    2-tap linear splat per channel — written as the hat function
    ``relu(1 - |bin - coord|)``, which equals the (1-frac)/frac two-bin
    selector but costs ~half the VPU passes of an iota-compare/select
    formulation, and zeroes the alignment-pad rows for free: pad rows have
    bin >= nc >= 255 * inv_step + 1 >= coord + 1, so the hat is exactly 0.
    (The wrappers assert that nc/inv_step invariant — it holds by
    construction for the production plans, which set
    nc = floor(255 * inv_step) + 2.)
    """
    cr_coord = rgb_ref[0, 0:1].astype(jnp.float32) * inv_step
    cg_coord = rgb_ref[0, 1:2].astype(jnp.float32) * inv_step
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (_c_pad(nc), 1), 0)
    cr = (iota_c // nc).astype(jnp.float32)
    cg = (iota_c % nc).astype(jnp.float32)
    w_r = jnp.maximum(1.0 - jnp.abs(cr - cr_coord), 0.0)
    w_g = jnp.maximum(1.0 - jnp.abs(cg - cg_coord), 0.0)
    return w_r * w_g


def _b_weight(bb, fb, b: int):
    """(1, CHUNK) weight of color-b bin ``b`` (hat function; bb/fb are the
    base/frac of the b coordinate)."""
    coord = bb.astype(jnp.float32) + fb
    return jnp.maximum(1.0 - jnp.abs(coord - b), 0.0)


def _splat_kernel(rgb_ref, v_ref, out_ref, acc_ref=None, *, nc, L, inv_step,
                  n_ref=None, packed_scale=False):
    k = pl.program_id(1)
    t_rg = _t_rg_row(rgb_ref, inv_step, nc).astype(jnp.bfloat16)  # (C, CHUNK)
    t_rg_c = jnp.swapaxes(t_rg, 0, 1)                             # (CHUNK, C)
    bb, fb = _base_frac(rgb_ref[0, 2:3], inv_step)
    # per-pixel scale (the mean-field normalization) folded into the splat;
    # on the packed path it rides the attrs block instead of its own stream
    if packed_scale:
        scale = rgb_ref[0, ATTR_BSCALE:ATTR_BSCALE + 1]
    else:
        scale = n_ref[0]
    vb = (v_ref[0] * scale).astype(jnp.bfloat16)                  # (L, CHUNK)
    t_lb = jnp.concatenate(
        [vb * _b_weight(bb, fb, b).astype(jnp.bfloat16) for b in range(nc)],
        axis=0)                                                   # (D, CHUNK)
    contrib = jnp.dot(t_lb, t_rg_c,
                      preferred_element_type=jnp.float32)         # (D, C_pad)
    d_pad = out_ref.shape[1] - nc * L
    if d_pad:  # zero the D-alignment pad rows (see _d_pad)
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((d_pad, contrib.shape[1]), contrib.dtype)],
            axis=0)

    if acc_ref is not None:
        # chunked bf16 grid: accumulate chunks in a persistent f32 VMEM
        # scratch and emit the half-width grid once on the last chunk —
        # chunking is what keeps the (D + 2C, CHUNK) factor tensors inside
        # VMEM (a single-chunk nc>=13 splat spills and measured 3.3x
        # slower), and scratch accumulation is what keeps the output bf16
        # without a separate astype pass over the grid
        @pl.when(k == 0)
        def _():
            acc_ref[...] = contrib

        @pl.when(k != 0)
        def _():
            acc_ref[...] += contrib

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc_ref[...].astype(out_ref.dtype)
        return

    @pl.when(k == 0)
    def _():
        out_ref[0] = contrib.astype(out_ref.dtype)

    @pl.when(k != 0)
    def _():
        # cross-chunk accumulation (f32 outputs only — the wrapper routes
        # chunked bf16 grids through the scratch accumulator above)
        out_ref[0] += contrib.astype(out_ref.dtype)


def _slice_kernel(rgb_ref, g_ref, brg_ref, out_ref, *, nc, L, inv_step,
                  bb_taps):
    # fused color blur on the (D, C) cell grid (the z-blur across cells
    # happened in XLA) + slice
    out_ref[0] = _blur_slice(g_ref, brg_ref, rgb_ref, nc=nc, L=L,
                             inv_step=inv_step, bb_taps=bb_taps)


def _blur_slice(g_ref, brg_ref, rgb_ref, *, nc, L, inv_step, bb_taps):
    """Shared slice body: fused color blur of the cell grid + slice.
    Returns the filtered values (L, CHUNK) f32.  The grid may arrive bf16
    (the splat accumulated f32; the z-blur ships it back at half width);
    its d axis may carry ``_d_pad`` alignment rows (dropped here)."""
    g = jnp.dot(g_ref[0, :nc * L].astype(jnp.bfloat16),
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


def _mf_step_kernel(at_ref, g_ref, brg_ref, fg_ref, q_ref, out_ref,
                    *, nc, L, inv_step, bb_taps, cg, cb,
                    n_energy, p_energy, u_ref=None, out_sub_ref=None,
                    stride=1, cs_y=0, cs_x=0):
    """Fused mean-field iteration tail: slice + both message normalizations
    + compatibility combine + softmax -> Q_next.  One HBM write per
    iteration instead of five round-trips through XLA elementwise.  (The
    next iteration's spatial-filter input A = Q * g_norm is NOT emitted:
    the blur kernel multiplies by g_norm itself — see
    ``gaussian_blur_planes`` — which saves this kernel a whole padded
    (L, P) output stream per iteration.)

    Operands ride the packed attrs planes (see ``ATTR_*``): the rgb rows
    feed the slice, the normalization rows feed the messages, and — on the
    serving path — the unary is rebuilt in-kernel from the label row
    (two-level ``unary_from_labels`` energies are static scalars), so the
    (L, P) unary tensor is never streamed.  Measured: the kernel is
    DMA-issue-bound (~0.8 us per operand stream per grid step), so folding
    five streams into one and dropping the unary stream is worth ~25%."""
    filt = _blur_slice(g_ref, brg_ref, at_ref, nc=nc, L=L,
                       inv_step=inv_step, bb_taps=bb_taps)
    # inputs may be stored bf16 (HBM traffic); all arithmetic in f32
    q = q_ref[0].astype(jnp.float32)
    gn = at_ref[0, ATTR_GN:ATTR_GN + 1]
    bn = at_ref[0, ATTR_BN:ATTR_BN + 1]
    if u_ref is None:
        lab = at_ref[0, ATTR_LABEL:ATTR_LABEL + 1]
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).astype(
            jnp.float32)
        u = jnp.where(iota_l == lab, p_energy, n_energy)
    else:
        u = u_ref[0].astype(jnp.float32)
    # spatial message: fg is the raw filtered (Q * gn); exclude self, scale
    msg_g = (fg_ref[0].astype(jnp.float32) - q * gn) * gn
    # bilateral message: filt already excludes nothing; remove self-weight.
    # The exact message sum_{j!=i} k n_i n_j q_j is nonnegative — clamp at
    # 0 so approximation error (a subsampled splat that never captured an
    # off-lattice pixel's own mass, or bf16 grid rounding) cannot turn the
    # self-exclusion into a large spurious penalty on the pixel's own label
    msg_b = jnp.maximum(
        filt - at_ref[0, ATTR_BSELF:ATTR_BSELF + 1] * bn * q, 0.0) * bn
    logits = -u + cg * msg_g + cb * msg_b
    mx = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - mx)
    q_next = e / jnp.sum(e, axis=0, keepdims=True)
    out_ref[0] = q_next.astype(out_ref.dtype)
    if out_sub_ref is not None:
        # next iteration's splat input, subsampled in-kernel: the XLA
        # strided-slice alternative forces a whole-Q relayout copy per
        # iteration (profiled ~11% of CRF time)
        out_sub_ref[0] = _subsample_rows(q_next, stride, cs_y, cs_x).astype(
            out_sub_ref.dtype)


def _subsample_rows(x, stride: int, cs_y: int, cs_x: int,
                    exact: bool = False):
    """(R, cs_y*cs_x) -> (R, (cs_y/s)*(cs_x/s)): every stride-th pixel per
    axis, row-major subsample order (matches ``_PallasPlan.subsample``).

    y-stride: regroup the contiguous (cs_y, cs_x) pixel block to
    (cs_y/s, s*cs_x) and keep the first cs_x lanes (a free sublane-group
    reshape+slice); x-stride: per y-group (cs_x, cs_x/s) lane-selection
    matmuls, lane-concatenated (a direct (R*ys, xs) -> (R, ys*xs) shape
    cast is a sublane->lane merge Mosaic cannot lower, and batching the
    dots leaves per-group row slices at non-sublane-aligned offsets its
    lane-concat cannot take).  ``exact`` keeps the selection dots in f32
    (a bf16 dot would round the selected values — fine for the bf16 Q
    state, not for f32 normalization planes)."""
    R = x.shape[0]
    ys, xs = cs_y // stride, cs_x // stride
    dt = jnp.float32 if exact else jnp.bfloat16
    xy = x.reshape(R, ys, stride * cs_x)[:, :, :cs_x]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (cs_x, xs), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (cs_x, xs), 1)
    sel = (iota_i == iota_j * stride).astype(dt)
    pieces = [jnp.dot(xy[:, j].astype(dt), sel,
                      preferred_element_type=jnp.float32)
              for j in range(ys)]
    return jnp.concatenate(pieces, axis=1)                # (R, ys*xs) f32


# Packed per-pixel attribute planes, (Z, 8, P) f32.  The rgb rows already
# cost an 8-sublane tile in HBM/DMA; the 5 pad rows carry every other
# per-pixel operand of the iteration kernels for free (one DMA stream
# instead of five).
ATTR_RGB = 0      # rows 0-2: r, g, b in 0-255
ATTR_GN = 3       # spatial-Gaussian normalization 1/sqrt(ksum)
ATTR_BN = 4       # bilateral normalization 1/sqrt(ksum)
ATTR_BSELF = 5    # bilateral self-weight
ATTR_LABEL = 6    # hard label (exact small ints in f32)
ATTR_BSCALE = 7   # splat-side scale: b_norm * valid * stride^2
ATTR_ROWS = 8


def _rgb_spec(chunk, rows: int = 3):
    return pl.BlockSpec((1, rows, chunk), lambda z, k: (z, 0, k),
                        memory_space=pltpu.VMEM)


# ------------------------------------------------ cell-plane spatial blur ----
#
# The mean-field spatial message is a separable truncated Gaussian over the
# image.  The XLA formulation (``dense_crf._sep_conv_bwh_to_bhw``) runs two
# dense (H, H)/(W, W) band matmuls in image layout, which costs two full
# 6-D cell<->image relayouts of the (B, L, H, W) state per iteration —
# measured ~46% of total CRF time at the serving config.  These kernels do
# the same blur directly on the cell planes with neighbor-cell halos
# (radius <= cell size, checked by the caller).
#
# Measured design rules (v5e, 512x512 / 64x128 cells / L=21):
#
# - the y contraction must ride the MXU: transpose the halo tile in VMEM,
#   run one canonical (L*cs_x, cs_y+2r) @ (cs_y+2r, cs_y) matmul, transpose
#   back (0.128 ms/img) — both a 17-tap sublane slice-FMA formulation
#   (0.223: VPU-bound, one unaligned sublane rotate + convert per tap) and
#   a dot_general sublane contraction (0.137) measure slower, and writing
#   the output in swapped (L, X, Y) layout to skip the transpose back is
#   slower still (0.196: HBM tiling of the 64-lane minor axis);
# - the x contraction of the 128-lane minor axis is canonical from the
#   start: (L*cs_y, cs_x) @ (cs_x, cs_x) against banded blocks of the
#   column blur matrix (left / center / right neighbor);
# - fusing both passes into ONE kernel over a full cell ROW removes the
#   midpoint HBM round-trip and fetches only 16-row neighbor strips for
#   the y halo instead of full neighbor blocks — the pass is HBM-bound, so
#   traffic is the budget: 2 reads + 1 write per element vs 7 for the
#   two-kernel chain.
#
# Boundary cells mask their missing neighbors (zero padding — exactly the
# truncated band matrix semantics of the image-layout path).  Cell-pad
# pixels (beyond H/W) carry A = Q * g_norm = 0 (g_norm is zero-padded), so
# blurring across the pad boundary is also exact.


def _y_halo_matrix(cs_y: int, r: int, taps) -> "object":
    """(cs_y + 2r, cs_y) matrix: out row y draws tap[(k - r) - y + r] from
    halo row k (halo = r rows of up-neighbor + cell + r rows of down)."""
    import numpy as _np
    m = _np.zeros((cs_y + 2 * r, cs_y), _np.float32)
    for k in range(cs_y + 2 * r):
        for y in range(cs_y):
            d = k - (y + r)
            if -r <= d <= r:
                m[k, y] = taps[d + r]
    return m


def _blur_row_kernel(up_ref, c_ref, dn_ref, ty_ref, tl_ref, t0_ref, tr_ref,
                     out_ref, *, ny, r, strip, cs_y, cs_x,
                     gup_ref=None, gc_ref=None, gdn_ref=None):
    """Fused y+x blur of one full cell row (nx cells).  up/dn are thin
    ``strip``-row neighbor slices; left/right halos live inside the block.

    The refs are (nx, L, P)-shaped block views of the 3-D cell-plane
    tensor — pixel-group splits of the contiguous minor P axis are free
    in-kernel, where an XLA-level 3-D <-> 5-D reshape of the state would
    drop/re-add the L-axis sublane padding = a full-tensor copy per
    iteration (profiled at ~20% of CRF device time).

    With g*_ref present the input is pre-multiplied by the (nx, 1, ...)
    g_norm planes in-kernel (the blur is compute-bound; folding the
    multiply here lets the mean-field step kernel drop its whole
    A = Q * g_norm output stream)."""
    zr = pl.program_id(0)
    iy = zr % ny
    bf = jnp.bfloat16
    m_up = jnp.where(iy > 0, 1.0, 0.0).astype(bf)
    m_dn = jnp.where(iy < ny - 1, 1.0, 0.0).astype(bf)
    nx, L = c_ref.shape[:2]
    c = c_ref[...].reshape(nx, L, cs_y, cs_x)
    up = up_ref[...].reshape(nx, L, strip, cs_x)
    dn = dn_ref[...].reshape(nx, L, strip, cs_x)
    if gc_ref is not None:
        c = (c.astype(jnp.float32)
             * gc_ref[...].reshape(nx, 1, cs_y, cs_x)).astype(bf)
        up = (up.astype(jnp.float32)
              * gup_ref[...].reshape(nx, 1, strip, cs_x)).astype(bf)
        dn = (dn.astype(jnp.float32)
              * gdn_ref[...].reshape(nx, 1, strip, cs_x)).astype(bf)
    halo = jnp.concatenate(
        [up[:, :, strip - r:].astype(bf) * m_up,
         c.astype(bf),
         dn[:, :, :r].astype(bf) * m_dn], axis=2)         # (nx, L, Yh, X)
    ht = jnp.swapaxes(halo, 2, 3)                         # (nx, L, X, Yh)
    t1 = jnp.dot(ht.reshape(nx * L * cs_x, cs_y + 2 * r),
                 ty_ref[:].astype(bf),
                 preferred_element_type=jnp.float32)      # (.., Y)
    t2 = jnp.swapaxes(t1.reshape(nx, L, cs_x, cs_y), 2, 3).astype(bf)
    tl, t0, tr = (m[:].astype(bf) for m in (tl_ref, t0_ref, tr_ref))
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    flat = lambda n: t2[n].reshape(L * cs_y, cs_x)
    for n in range(nx):
        acc = dot(flat(n), t0)
        if n > 0:
            acc += dot(flat(n - 1), tl)
        if n < nx - 1:
            acc += dot(flat(n + 1), tr)
        out_ref[n] = acc.reshape(L, cs_y * cs_x).astype(out_ref.dtype)


def _blur_y_kernel(up_ref, c_ref, dn_ref, ty_ref, out_ref, *, ny, nx, Z, r,
                   strip, cs_y, cs_x, gup_ref=None, gc_ref=None,
                   gdn_ref=None):
    """Fallback per-cell y pass (rows too large for the fused row kernel):
    transpose -> canonical matmul -> transpose (see module design rules).
    Refs are (1, L, P) / (1, L, strip*cs_x) 3-D blocks (see
    _blur_row_kernel); the r halo rows are sliced from the strips.  The
    optional g*_refs pre-multiply by the g_norm planes (see row kernel)."""
    z = pl.program_id(0)
    iy = (z % Z) // nx
    bf = jnp.bfloat16
    m_up = jnp.where(iy > 0, 1.0, 0.0).astype(bf)
    m_dn = jnp.where(iy < ny - 1, 1.0, 0.0).astype(bf)
    L = c_ref.shape[1]
    c = c_ref[0].reshape(L, cs_y, cs_x)
    up = up_ref[0].reshape(L, strip, cs_x)
    dn = dn_ref[0].reshape(L, strip, cs_x)
    if gc_ref is not None:
        c = (c.astype(jnp.float32)
             * gc_ref[0].reshape(1, cs_y, cs_x)).astype(bf)
        up = (up.astype(jnp.float32)
              * gup_ref[0].reshape(1, strip, cs_x)).astype(bf)
        dn = (dn.astype(jnp.float32)
              * gdn_ref[0].reshape(1, strip, cs_x)).astype(bf)
    halo = jnp.concatenate(
        [up[:, strip - r:].astype(bf) * m_up, c.astype(bf),
         dn[:, :r].astype(bf) * m_dn],
        axis=1)                                           # (L, Yh, X)
    ht = jnp.swapaxes(halo, 1, 2)                         # (L, X, Yh)
    t1 = jnp.dot(ht.reshape(L * cs_x, cs_y + 2 * r),
                 ty_ref[:].astype(bf),
                 preferred_element_type=jnp.float32)
    out_ref[0] = jnp.swapaxes(t1.reshape(L, cs_x, cs_y), 1, 2).reshape(
        L, cs_y * cs_x).astype(out_ref.dtype)


def _blur_x_kernel(lf_ref, c_ref, rt_ref, tl_ref, t0_ref, tr_ref, out_ref,
                   *, nx, Z, cs_y, cs_x):
    z = pl.program_id(0)
    ix = z % nx
    m_lf = jnp.where(ix > 0, 1.0, 0.0).astype(jnp.float32)
    m_rt = jnp.where(ix < nx - 1, 1.0, 0.0).astype(jnp.float32)
    L = c_ref.shape[1]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    flat = lambda ref: ref[0].reshape(L * cs_y, cs_x).astype(jnp.bfloat16)
    acc = dot(flat(c_ref), t0_ref[:].astype(jnp.bfloat16))
    acc += dot(flat(lf_ref), tl_ref[:].astype(jnp.bfloat16)) * m_lf
    acc += dot(flat(rt_ref), tr_ref[:].astype(jnp.bfloat16)) * m_rt
    out_ref[0] = acc.reshape(L, cs_y * cs_x).astype(out_ref.dtype)


def _x_blur_blocks(cs_x: int, taps) -> "tuple":
    """Banded (cs_x, cs_x) blocks (TL, T0, TR) of the column blur: column j
    of the output draws tap[(j - i) + r] from column i of the left (i-cs_x),
    center (i), or right (i+cs_x) neighbor cell."""
    import numpy as _np
    r = len(taps) // 2
    blocks = []
    for shift in (-cs_x, 0, cs_x):
        m = _np.zeros((cs_x, cs_x), _np.float32)
        for i in range(cs_x):
            for j in range(cs_x):
                d = j - (i + shift)
                if -r <= d <= r:
                    m[i, j] = taps[d + r]
        blocks.append(m)
    return tuple(blocks)


# fused row kernel VMEM budget: center/out blocks are double-buffered and
# the halo/transpose/matmul intermediates are block-sized; ~8x the block
# must fit comfortably in the ~16 MB of VMEM
_ROW_BLOCK_BYTES = 1 << 21


@functools.partial(jax.jit, static_argnames=("taps", "B", "ny", "nx",
                                             "cs_y", "cs_x", "interpret"))
def gaussian_blur_planes(a, gn=None, *, taps: tuple, B: int, ny: int,
                         nx: int, cs_y: int, cs_x: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Separable spatial Gaussian over cell planes.  a: (B*Z, L, P) with
    P = cs_y*cs_x; returns the blurred planes, same shape/dtype.  Matches
    ``dense_crf._sep_conv_bwh_to_bhw`` on the un-celled image (bf16 taps,
    zero padding outside the image) without the image-layout relayouts.
    Requires len(taps)//2 <= min(cs_y, cs_x).

    gn: optional per-pixel multiplier applied to ``a`` in-kernel before
    blurring — equals ``blur(a * gn)`` but the producer of ``a`` never
    writes the pre-multiplied tensor (the mean-field loop passes Q and
    g_norm; the blur is compute-bound, the multiply is free here and a
    whole output stream in the step kernel otherwise).  Shape (B*Z, 1, P),
    or (Z, 1, P) for a batch-invariant multiplier (the spatial
    normalization depends only on image position) — index-mapped across
    the batch, never materialized B times."""
    BZ, L, P = a.shape
    Z = ny * nx
    r = len(taps) // 2
    assert P == cs_y * cs_x and r <= min(cs_y, cs_x), (P, cs_y, cs_x, r)
    # taps rounded to bf16 to match the band-matrix astype of the XLA path
    import ml_dtypes
    import numpy as _np
    taps_b = tuple(float(_np.asarray(t, ml_dtypes.bfloat16)) for t in taps)
    ty = jnp.asarray(_y_halo_matrix(cs_y, r, taps_b))
    tyspec = pl.BlockSpec((cs_y + 2 * r, cs_y), lambda z: (0, 0),
                          memory_space=pltpu.VMEM)
    tl, t0, tr = (jnp.asarray(m) for m in _x_blur_blocks(cs_x, taps_b))
    mspec = pl.BlockSpec((cs_x, cs_x), lambda z: (0, 0),
                         memory_space=pltpu.VMEM)
    arb = pltpu.CompilerParams(dimension_semantics=("arbitrary",))

    # All block specs carve the 3-D (BZ, L, P) tensor directly — strips of
    # image rows are contiguous P-subranges, so the kernels reshape their
    # blocks for free and no XLA 3-D <-> multi-D relayout of the (L-padded)
    # state ever happens (it profiled as ~20% of CRF device time).
    strip = 16  # sublane-tile-aligned thin halo slice
    row_bytes = nx * L * P * a.dtype.itemsize
    if r <= strip <= cs_y and cs_y % strip == 0 \
            and row_bytes <= _ROW_BLOCK_BYTES:
        rspec = pl.BlockSpec((nx, L, P), lambda z: (z, 0, 0),
                             memory_space=pltpu.VMEM)
        hi = B * ny - 1
        sp = strip * cs_x
        up = pl.BlockSpec((nx, L, sp),
                          lambda z: (jnp.clip(z - 1, 0, hi), 0,
                                     cs_y // strip - 1),
                          memory_space=pltpu.VMEM)
        dn = pl.BlockSpec((nx, L, sp),
                          lambda z: (jnp.clip(z + 1, 0, hi), 0, 0),
                          memory_space=pltpu.VMEM)
        in_specs = [up, rspec, dn, tyspec, mspec, mspec, mspec]
        operands = [a, a, a, ty, tl, t0, tr]
        if gn is None:
            kern = functools.partial(_blur_row_kernel, ny=ny, r=r,
                                     strip=strip, cs_y=cs_y, cs_x=cs_x)
        else:
            def kern(up_ref, c_ref, dn_ref, ty_ref, tl_ref, t0_ref, tr_ref,
                     gup_ref, gc_ref, gdn_ref, out_ref):
                _blur_row_kernel(up_ref, c_ref, dn_ref, ty_ref, tl_ref,
                                 t0_ref, tr_ref, out_ref, ny=ny, r=r,
                                 strip=strip, cs_y=cs_y, cs_x=cs_x,
                                 gup_ref=gup_ref, gc_ref=gc_ref,
                                 gdn_ref=gdn_ref)
            if gn.shape[0] == Z:     # batch-invariant: index by image row
                gz = lambda z: z % ny
                ghi = ny - 1
            else:
                gz = lambda z: z
                ghi = hi
            g1 = pl.BlockSpec((nx, 1, P), lambda z: (gz(z), 0, 0),
                              memory_space=pltpu.VMEM)
            gu = pl.BlockSpec((nx, 1, sp),
                              lambda z: (jnp.clip(gz(z) - 1, 0, ghi), 0,
                                         cs_y // strip - 1),
                              memory_space=pltpu.VMEM)
            gd = pl.BlockSpec((nx, 1, sp),
                              lambda z: (jnp.clip(gz(z) + 1, 0, ghi), 0, 0),
                              memory_space=pltpu.VMEM)
            in_specs += [gu, g1, gd]
            gn_f = gn.astype(jnp.float32)
            operands += [gn_f, gn_f, gn_f]
        return pl.pallas_call(
            kern,
            grid=(B * ny,),
            in_specs=in_specs,
            out_specs=rspec,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            compiler_params=arb,
            interpret=interpret,
        )(*operands)

    spec = pl.BlockSpec((1, L, P), lambda z: (z, 0, 0),
                        memory_space=pltpu.VMEM)

    def shifted(dz, lo, hi):
        return pl.BlockSpec(
            (1, L, P),
            lambda z: (jnp.clip(z + dz, lo, hi), 0, 0),
            memory_space=pltpu.VMEM)

    # neighbor strip: the smallest divisor of cs_y that covers the r halo
    # rows (block indexing must tile P exactly)
    strip_y = next(s for s in range(r, cs_y + 1) if cs_y % s == 0)
    sp = strip_y * cs_x
    up_y = pl.BlockSpec((1, L, sp),
                        lambda z: (jnp.clip(z - nx, 0, BZ - 1), 0,
                                   cs_y // strip_y - 1),
                        memory_space=pltpu.VMEM)
    dn_y = pl.BlockSpec((1, L, sp),
                        lambda z: (jnp.clip(z + nx, 0, BZ - 1), 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs_y = [up_y, spec, dn_y, tyspec]
    operands_y = [a, a, a, ty]
    if gn is None:
        kern_y = functools.partial(_blur_y_kernel, ny=ny, nx=nx, Z=Z, r=r,
                                   strip=strip_y, cs_y=cs_y, cs_x=cs_x)
    else:
        def kern_y(up_ref, c_ref, dn_ref, ty_ref, gup_ref, gc_ref, gdn_ref,
                   out_ref):
            _blur_y_kernel(up_ref, c_ref, dn_ref, ty_ref, out_ref, ny=ny,
                           nx=nx, Z=Z, r=r, strip=strip_y, cs_y=cs_y,
                           cs_x=cs_x, gup_ref=gup_ref, gc_ref=gc_ref,
                           gdn_ref=gdn_ref)
        if gn.shape[0] == Z:         # batch-invariant: index by image cell
            gz = lambda z: z % Z
            ghi = Z - 1
        else:
            gz = lambda z: z
            ghi = BZ - 1
        g1 = pl.BlockSpec((1, 1, P), lambda z: (gz(z), 0, 0),
                          memory_space=pltpu.VMEM)
        gu = pl.BlockSpec((1, 1, sp),
                          lambda z: (jnp.clip(gz(z) - nx, 0, ghi), 0,
                                     cs_y // strip_y - 1),
                          memory_space=pltpu.VMEM)
        gd = pl.BlockSpec((1, 1, sp),
                          lambda z: (jnp.clip(gz(z) + nx, 0, ghi), 0, 0),
                          memory_space=pltpu.VMEM)
        in_specs_y += [gu, g1, gd]
        gn_f = gn.astype(jnp.float32)
        operands_y += [gn_f, gn_f, gn_f]
    fy = pl.pallas_call(
        kern_y,
        grid=(BZ,),
        in_specs=in_specs_y,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        compiler_params=arb,
        interpret=interpret,
    )(*operands_y)

    fx = pl.pallas_call(
        functools.partial(_blur_x_kernel, nx=nx, Z=Z, cs_y=cs_y, cs_x=cs_x),
        grid=(BZ,),
        in_specs=[shifted(-1, 0, BZ - 1), spec, shifted(1, 0, BZ - 1),
                  mspec, mspec, mspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        compiler_params=arb,
        interpret=interpret,
    )(fy, fy, fy, tl, t0, tr)
    return fx


@functools.partial(jax.jit,
                   static_argnames=("nc", "L", "inv_step", "chunk",
                                    "out_dtype", "interpret"))
def splat_planes(rgb, values, scale=None, *, nc: int, L: int,
                 inv_step: float, chunk: int = 0, out_dtype=jnp.float32,
                 interpret: bool = False) -> jnp.ndarray:
    """rgb: (Z, 3, P) f32 0-255 planes OR packed (Z, 8, P) attrs planes —
    in the packed case the splat scale is the ``ATTR_BSCALE`` row (one DMA
    stream instead of two) and ``scale`` must be None.  values: (Z, L, P);
    scale: optional (Z, 1, P) per-pixel multiplier folded into the splat
    (the mean-field normalization).  Returns the transposed splatted grid
    G: (Z, D, C) in ``out_dtype`` with D = nc*L (d = b*L + l),
    C = nc*nc (c = r*nc+g).  ``out_dtype=bf16`` (only valid when a single
    chunk covers P, i.e. no cross-chunk accumulation) writes the grid at
    half width directly, saving the downstream astype pass."""
    Z, rows, P = rgb.shape
    chunk = chunk or P
    assert P % chunk == 0, (P, chunk)
    assert nc >= 255.0 * inv_step + 1, (nc, inv_step)  # hat-pad invariant
    packed = rows == ATTR_ROWS
    # chunked low-precision grids accumulate in an f32 VMEM scratch and
    # write once (see _splat_kernel); in-out accumulation stays f32-exact
    scratch = chunk != P and out_dtype != jnp.float32
    scratch_shapes = ([pltpu.VMEM((_d_pad(nc, L), _c_pad(nc)), jnp.float32)]
                      if scratch else [])
    out_spec = pl.BlockSpec((1, _d_pad(nc, L), _c_pad(nc)),
                            lambda z, k: (z, 0, 0),
                            memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, L, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    if packed:
        assert scale is None

        def kern(rgb_ref, v_ref, out_ref, *acc):
            _splat_kernel(rgb_ref, v_ref, out_ref,
                          acc[0] if scratch else None, nc=nc, L=L,
                          inv_step=inv_step, packed_scale=True)
        in_specs = [_rgb_spec(chunk, ATTR_ROWS), vspec]
        operands = [rgb, values]
    else:
        if scale is None:
            scale = jnp.ones((Z, 1, P), jnp.float32)

        def kern(rgb_ref, v_ref, n_ref, out_ref, *acc):
            _splat_kernel(rgb_ref, v_ref, out_ref,
                          acc[0] if scratch else None, nc=nc, L=L,
                          inv_step=inv_step, n_ref=n_ref)
        in_specs = [_rgb_spec(chunk), vspec,
                    pl.BlockSpec((1, 1, chunk), lambda z, k: (z, 0, k),
                                 memory_space=pltpu.VMEM)]
        operands = [rgb, values, scale.astype(jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(Z, P // chunk),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Z, _d_pad(nc, L), _c_pad(nc)),
                                       out_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)


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
    assert nc >= 255.0 * inv_step + 1, (nc, inv_step)  # hat-pad invariant
    C = _c_pad(nc)
    return pl.pallas_call(
        functools.partial(_slice_kernel, nc=nc, L=L, inv_step=inv_step,
                          bb_taps=bb_taps),
        grid=(Z, P // chunk),
        in_specs=[_rgb_spec(chunk),
                  pl.BlockSpec((1, _d_pad(nc, L), C), lambda z, k: (z, 0, 0),
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


def _slice_attrs_kernel(rgb_ref, g_ref, brg_ref, gn_ref, lab_ref, at_ref,
                        q0_ref, ats_ref, q0s_ref, *, nc, L, inv_step,
                        bb_taps, stride, cs_y, cs_x, h, w, nx, Z, q0_lab,
                        q0_other):
    """Norm-pass tail: slice the valid-mask grid and EMIT the packed attrs
    planes (+ the initial Q and the stride-subsampled copies) in one pass.

    Everything the XLA formulation materialized between the norm slice and
    the first iteration — b_self, valid, b_norm, b_scale, the 6-tensor
    attrs concat, the two-level unary and its softmax — is closed-form
    per pixel, so it is computed in VMEM here and written once.  gn is
    streamed per image position (it is identical across the batch)."""
    f32 = jnp.float32
    rgb = rgb_ref[0].astype(f32)                            # (3, CHUNK)
    # ksum of the bilateral kernel over valid pixels (self included)
    filt = _blur_slice(g_ref, brg_ref, rgb_ref, nc=nc, L=1,
                       inv_step=inv_step, bb_taps=bb_taps)  # (1, CHUNK)
    # closed-form self weight (see _PallasPlan.self_weight)
    coords = rgb * inv_step
    frac = coords - jnp.floor(coords)
    s0, s1 = 1.0 - frac, frac
    b0 = bb_taps[len(bb_taps) // 2]
    b1 = bb_taps[len(bb_taps) // 2 + 1] if len(bb_taps) > 1 else 0.0
    per_dim = (s0 * s0 + s1 * s1) * b0 + 2.0 * s0 * s1 * b1
    b_self = (per_dim[0:1] * per_dim[1:2] * per_dim[2:3])   # (1, CHUNK)
    # cell-pad mask from geometry: is this pixel inside the h x w image?
    z = pl.program_id(0)
    iy = (z % Z) // nx
    ix = (z % Z) % nx
    if cs_x % 128 == 0:
        # 2-D iota over the (cs_y, cs_x) pixel block + a free minor-merge
        # reshape (lane-aligned cs_x only — Mosaic cannot shape-cast a
        # non-128-multiple minor axis)
        py = jax.lax.broadcasted_iota(jnp.int32, (cs_y, cs_x), 0)
        px = jax.lax.broadcasted_iota(jnp.int32, (cs_y, cs_x), 1)
        valid = ((iy * cs_y + py < h) & (ix * cs_x + px < w)).astype(f32)
        valid = valid.reshape(1, cs_y * cs_x)
    else:
        # flat iota + float division (small-sigma cells, e.g. the
        # resolution_scale serving knob): the +0.5 offset keeps the floor
        # exact — the quotient never lands within f32 error of an integer
        p = jax.lax.broadcasted_iota(jnp.int32, (1, cs_y * cs_x), 1)
        py = jnp.floor((p.astype(f32) + 0.5)
                       * (1.0 / cs_x)).astype(jnp.int32)
        px = p - py * cs_x
        valid = ((iy * cs_y + py < h) & (ix * cs_x + px < w)).astype(f32)
    # With a subsampled splat the KDE norm estimate can miss a pixel's own
    # mass entirely (a color-isolated pixel off the stride lattice):
    # filt - b_self goes to ~0 or negative, the 1e-20 clamp sends bn to
    # 1e10, and the bilateral message -b_self*bn^2*q assigns the pixel an
    # arbitrary label.  Floor the denominator at b_self — "an isolated
    # pixel's neighbor mass is at least its own self-weight" — which
    # bounds |msg_b| <= q and only engages exactly where the subsampled
    # estimate already failed.  At stride=1 the splat is exact and the
    # original tiny clamp keeps parity with the O(N^2) oracle.
    floor = b_self if stride > 1 else 1e-20
    bn = jax.lax.rsqrt(jnp.maximum(filt - b_self, floor))
    bscale = bn * valid * float(stride * stride)
    lab = lab_ref[0].astype(f32)
    attrs = jnp.concatenate(
        [rgb, gn_ref[0].astype(f32), bn, b_self, lab, bscale], axis=0)
    at_ref[0] = attrs
    # initial Q = softmax(-two-level unary): a two-value closed form
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).astype(f32)
    q0 = jnp.where(iota_l == lab, q0_lab, q0_other)         # (L, CHUNK)
    if q0_ref is not None:
        q0_ref[0] = q0.astype(q0_ref.dtype)
    if ats_ref is not None:
        ats_ref[0] = _subsample_rows(attrs, stride, cs_y, cs_x,
                                     exact=True).astype(ats_ref.dtype)
    if q0s_ref is not None:
        q0s_ref[0] = _subsample_rows(q0, stride, cs_y, cs_x).astype(
            q0s_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("nc", "L", "inv_step", "bb_taps",
                                    "stride", "cs_y", "cs_x", "h", "w",
                                    "nx", "Z", "gt_prob", "chunk",
                                    "interpret"))
def slice_attrs_planes(rgb, grid_t, brg, gn, labels, *, nc: int, L: int,
                       inv_step: float, bb_taps: tuple, stride: int,
                       cs_y: int, cs_x: int, h: int, w: int, nx: int,
                       Z: int, gt_prob: float, chunk: int = 0,
                       interpret: bool = False):
    """Fused norm-pass tail (see ``_slice_attrs_kernel``).

    rgb (B*Z, 3, P) f32; grid_t (B*Z, d_pad(nc,1), C) z-blurred norm grid
    (valid-mask splat, ALREADY stride^2-scaled); brg (C, C); gn (Z, 1, P)
    f32 spatial normalization per image position (index-mapped across the
    batch); labels (B*Z, 1, P) integer hard labels.
    Returns (attrs, q0) and, when ``stride`` > 1, also
    (attrs_sub, q0_sub): attrs (B*Z, 8, P) f32, q0 (B*Z, L, P) bf16.
    """
    import math as _math
    BZ, _, P = rgb.shape
    chunk = chunk or P
    sub = stride > 1 and chunk == P and cs_y * cs_x == P \
        and cs_y % stride == 0 and cs_x % stride == 0 \
        and cs_x % 128 == 0  # Mosaic shape-cast limit (see mf_step_planes)
    # the in-kernel valid-mask geometry assumes whole-cell blocks
    assert chunk == P and cs_y * cs_x == P, (chunk, P, cs_y, cs_x)
    assert nc >= 255.0 * inv_step + 1, (nc, inv_step)  # hat-pad invariant
    C = _c_pad(nc)
    n_e = -_math.log((1.0 - gt_prob) / (L - 1))
    p_e = -_math.log(gt_prob)
    # softmax(-U) of the two-level unary, closed form
    den = _math.exp(-p_e) + (L - 1) * _math.exp(-n_e)
    q0_lab = _math.exp(-p_e) / den
    q0_other = _math.exp(-n_e) / den
    nspec = pl.BlockSpec((1, 1, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    gnspec = pl.BlockSpec((1, 1, chunk), lambda z, k: (z % Z, 0, k),
                          memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, ATTR_ROWS, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, L, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    out_specs = [aspec, lspec]
    out_shapes = [jax.ShapeDtypeStruct((BZ, ATTR_ROWS, P), jnp.float32),
                  jax.ShapeDtypeStruct((BZ, L, P), jnp.bfloat16)]
    if sub:
        Ps = P // (stride * stride)
        out_specs += [
            pl.BlockSpec((1, ATTR_ROWS, Ps), lambda z, k: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Ps), lambda z, k: (z, 0, 0),
                         memory_space=pltpu.VMEM)]
        out_shapes += [
            jax.ShapeDtypeStruct((BZ, ATTR_ROWS, Ps), jnp.float32),
            jax.ShapeDtypeStruct((BZ, L, Ps), jnp.bfloat16)]

    def kern(rgb_ref, g_ref, brg_ref, gn_ref, lab_ref, *outs):
        _slice_attrs_kernel(
            rgb_ref, g_ref, brg_ref, gn_ref, lab_ref,
            outs[0], outs[1],
            outs[2] if sub else None, outs[3] if sub else None,
            nc=nc, L=L, inv_step=inv_step, bb_taps=bb_taps, stride=stride,
            cs_y=cs_y, cs_x=cs_x, h=h, w=w, nx=nx, Z=Z,
            q0_lab=q0_lab, q0_other=q0_other)

    return pl.pallas_call(
        kern,
        grid=(BZ, P // chunk),
        in_specs=[_rgb_spec(chunk),
                  pl.BlockSpec((1, _d_pad(nc, 1), C), lambda z, k: (z, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), lambda z, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  gnspec, nspec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(rgb, grid_t.astype(jnp.float32), brg.astype(jnp.float32),
      gn.astype(jnp.float32), labels)


@functools.partial(jax.jit,
                   static_argnames=("nc", "L", "inv_step", "bb_taps",
                                    "cg", "cb", "n_energy", "p_energy",
                                    "sub_stride", "cs_y", "cs_x",
                                    "chunk", "interpret"))
def mf_step_planes(attrs, grid_t, brg, f_gauss, q, unary=None, *, nc: int,
                   L: int, inv_step: float, bb_taps: tuple, cg: float,
                   cb: float, n_energy: float = 0.0, p_energy: float = 0.0,
                   sub_stride: int = 1, cs_y: int = 0, cs_x: int = 0,
                   chunk: int = 0, interpret: bool = False) -> jnp.ndarray:
    """Fused mean-field iteration tail (see ``_mf_step_kernel``).

    attrs (Z,8,P) f32 packed per-pixel planes (``ATTR_*`` rows);
    grid_t (Z,D,C) z-blurred (f32 or bf16); brg (C,C); q (Z,L,P);
    f_gauss (Z,L,P) = spatial-filtered (q * g_norm).  The unary is built
    in-kernel from the attrs label row with the static two-level
    ``(n_energy, p_energy)`` energies (serving path); pass an explicit
    ``unary`` (Z,L,P) tensor instead for arbitrary caller energies.
    Returns (Q_next,), (Z,L,P) in q's dtype; with ``sub_stride`` > 1
    (requires cell geometry ``cs_y``/``cs_x``) a second output
    (Z, L, P/stride^2) — Q_next subsampled every stride-th pixel per
    axis, the next iteration's splat input — is appended (an XLA strided
    slice would relayout-copy the whole Q tensor per iteration).
    """
    Z, rows, P = attrs.shape
    assert rows == ATTR_ROWS, attrs.shape
    C = _c_pad(nc)
    if not chunk:
        # keep the (D, CHUNK) slice intermediate + elementwise blocks in
        # VMEM.  When an in-kernel subsample output is at stake (it needs
        # whole-cell chunks), allow a larger budget before halving —
        # falling back to the XLA strided slice costs a whole-Q relayout
        # copy per iteration, far worse than the VMEM pressure.
        budget = (8 << 20) if sub_stride > 1 else (6 << 20)
        chunk = P
        while nc * L * chunk * 4 > budget and chunk % 2 == 0:
            chunk //= 2
    # the in-kernel subsample's lane-group reshape needs a 128-aligned
    # cs_x (Mosaic shape-cast limit); other geometries fall back to the
    # caller's XLA subsample
    sub = sub_stride > 1 and chunk == P and cs_y * cs_x == P \
        and cs_y % sub_stride == 0 and cs_x % sub_stride == 0 \
        and cs_x % 128 == 0
    assert P % chunk == 0, (P, chunk)
    assert nc >= 255.0 * inv_step + 1, (nc, inv_step)  # hat-pad invariant
    lspec = pl.BlockSpec((1, L, chunk), lambda z, k: (z, 0, k),
                         memory_space=pltpu.VMEM)
    in_specs = [_rgb_spec(chunk, ATTR_ROWS),
                pl.BlockSpec((1, _d_pad(nc, L), C), lambda z, k: (z, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda z, k: (0, 0),
                             memory_space=pltpu.VMEM),
                lspec, lspec]
    operands = [attrs, grid_t, brg.astype(jnp.float32), f_gauss, q]
    sub_kw = dict(stride=sub_stride, cs_y=cs_y, cs_x=cs_x) if sub else {}

    if unary is None:
        def kern(at_ref, g_ref, brg_ref, fg_ref, q_ref, *outs):
            _mf_step_kernel(at_ref, g_ref, brg_ref, fg_ref, q_ref,
                            outs[0], nc=nc, L=L,
                            inv_step=inv_step, bb_taps=bb_taps, cg=cg,
                            cb=cb, n_energy=n_energy, p_energy=p_energy,
                            out_sub_ref=outs[1] if sub else None, **sub_kw)
    else:
        def kern(at_ref, g_ref, brg_ref, fg_ref, q_ref, u_ref, *outs):
            _mf_step_kernel(at_ref, g_ref, brg_ref, fg_ref, q_ref,
                            outs[0], nc=nc, L=L,
                            inv_step=inv_step, bb_taps=bb_taps, cg=cg,
                            cb=cb, n_energy=0.0, p_energy=0.0,
                            u_ref=u_ref,
                            out_sub_ref=outs[1] if sub else None, **sub_kw)
        in_specs.append(lspec)
        operands.append(unary)
    out_specs = [lspec]
    out_shapes = [jax.ShapeDtypeStruct((Z, L, P), q.dtype)]
    if sub:
        P_sub = P // (sub_stride * sub_stride)
        out_specs.append(pl.BlockSpec((1, L, P_sub), lambda z, k: (z, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((Z, L, P_sub), q.dtype))
    return pl.pallas_call(
        kern,
        grid=(Z, P // chunk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*operands)
