"""Fused inverted-residual TRAINING kernels (forward + custom backward).

The measured wall for the bf16 train step is HBM bandwidth: XLA round-trips
every block's 6x-expanded activations through HBM ~10 times per step (fwd
write/read around the expand, depthwise and project, the saved-for-backward
reads, and the backward chain), while the MXU sits at ~7.5% utilization
(IMPLEMENTATION_NOTES.md: 2.65 GB/img, 84-94% of the HBM roofline).  The
FLOP/byte asymmetry means recompute is nearly free — so these kernels trade
~3x recompute of the expand matmul for never materializing the expanded
tensor: every phase re-reads the NARROW block input (C channels) and
rebuilds the 6C-wide activations tile-by-tile in VMEM.

Training-mode BatchNorm forces the phase structure.  Batch statistics of a
tensor must be known before the next op can consume its normalized values,
and the block chains three BNs, so the minimum schedule is:

  forward                                        HBM traffic (narrow units)
    F1  batch stats of the expand output          read x           (Pallas)
    F2  batch stats of the depthwise output       read 3x x        (Pallas)
    F3  recompute block, emit raw project output  read 3x x, write y_raw
    EP  stats of y_raw, project-BN affine, skip   read y_raw + x, write out
  backward (g = dL/dout)
    B1  project-BN grad sums S1/S2                read g, y_raw      (XLA)
    B2  dw-BN grad sums T1/T2 + dW2               read 3x x, g, y_raw
    B3  expand-BN grad sums U1/U2 + dWdw          read 3(x + g + y_raw)
    B4  dx partials + dW1                         read 3(x+g+y), write dx

(the "3x" reads are the prev/cur/next row-tile planes that provide the
depthwise halo, exactly as in the eval-mode kernel kernels/fused_mbconv.py).
Total ~= 37 narrow passes vs ~110 for the XLA composition whose passes are
mostly 6x wider.  Recompute raises the step's matmul FLOPs ~2.5x, which the
idle MXU absorbs.

Numerics: activations are re-quantized to bf16 at the same points as the
XLA path (ops/conv.py + ops/bn.py round conv outputs and BN affines to the
compute dtype), tap/stat accumulation is f32, and the BN backward uses the
standard full training-mode formula (through the batch mean/var), so grads
match the XLA path to bf16 tolerance; in f32 (tests / interpret mode) they
match tightly.  Batch variance is the biased E[x^2]-E[x]^2 form, matching
jnp.var in ops/bn.py:31 (stats are sequential per-tile f32 accumulations).
f32 dots run at Precision.HIGHEST (see _prec) — DEFAULT bf16-rounds f32
matmul operands on both the MXU and the CPU backend.  Caveat measured on
real TPUs: f32 cross-implementation grad comparisons are ill-conditioned
there regardless — relu6' masks have pre-activation margins down to
~1e-5, and even HIGHEST MXU passes carry enough rounding (which shifts
with XLA's compile-cache-dependent tilings) to flip isolated masks,
producing rare O(1) per-pixel grad differences between ANY two f32
implementations (TPU-XLA vs CPU-XLA differs the same way).  Exact parity
is therefore asserted on CPU (interpret mode); on-chip validation uses
structured probes and the bf16 production contract instead.

Semantics mirror reference _inverted_res_block (deeplabv3p.py:167-206) in
Keras training mode: expand 1x1 (no bias) -> BN(eps 1e-3) -> relu6 ->
3x3 depthwise (stride 1, dilation `rate`, 'same') -> BN -> relu6 ->
project 1x1 -> BN [-> + skip].  Moving-stat EMA (momentum 0.999) is applied
by the ctx wrapper exactly as ops/bn.py does.

Chunking: blocks whose expanded width would blow VMEM (Ce=960 at rate 4)
split Ce into chunks via a second grid dimension.  Reduction outputs
(stats, weight grads) run chunk-OUTER so their accumulator blocks stay
VMEM-resident across the z sweep; z-indexed outputs (y_raw, dx) run
chunk-INNER with an f32 scratch accumulator (y_raw) or per-chunk partial
outputs summed in XLA (dx) — Pallas output blocks only accumulate across
CONSECUTIVE grid steps mapping to the same block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeplab_tpu.kernels.fused_mbconv import pallas_available  # noqa: F401

# opt-out knob for A/B runs: fused_mbconv_train.ENABLED = False
ENABLED = True
# test hook: run the Pallas phases in interpret mode (CPU), see tests/
INTERPRET = False


_CHUNK_LIMIT = 3277 * 1024  # bytes for the (n2, ch) f32 extended-act tile


def _pick_nch(Ce: int, n2: int) -> int:
    """Channel-chunk count keeping the largest per-chunk VMEM array under
    ~3.2MB.  Mosaic requires block lane dims divisible by 128 (or full),
    so chunks must be x128; `_plan_chunks` pads Ce to make one exist."""
    if n2 * Ce * 4 <= _CHUNK_LIMIT:
        return 1
    for nch in range(2, Ce + 1):
        ch = Ce // nch
        if Ce % nch == 0 and ch % 128 == 0 and n2 * ch * 4 <= _CHUNK_LIMIT:
            return nch
    return 1


def _plan_chunks(Ce: int, n2: int):
    """(padded_Ce, nch): pad Ce so a lane-legal chunking exists (e.g.
    Ce=960 at rate 4 -> 1024 in 2 chunks of 512)."""
    if n2 * Ce * 4 <= _CHUNK_LIMIT:
        return Ce, 1
    nch = 2
    while True:
        cep = -(-Ce // (128 * nch)) * 128 * nch
        if n2 * (cep // nch) * 4 <= _CHUNK_LIMIT:
            return cep, nch
        nch += 1


def _shift_cols(arr, shift: int, col, W: int):
    """rolled[i] = arr[i + shift], zeroed where the lookup crosses a row end
    (column + shift leaves [0, W)).  `col` is an (L, 1) iota % W.  Mosaic:
    pltpu.roll + offset-0/aligned slices is the only fast tap access."""
    if shift == 0:
        return arr
    L = arr.shape[0]
    r = pltpu.roll(arr, (L - shift) % L, 0)
    if shift > 0:
        return jnp.where(col < W - shift, r, 0.0)
    return jnp.where(col >= -shift, r, 0.0)


def _plane_specs(ZT: int, P: int, C: int, czo: bool):
    """prev/cur/next row-plane BlockSpecs.  `czo`: grid is (chunk, z);
    else (z, chunk)."""
    zi = 1 if czo else 0

    def idx_c(*ids):
        return (ids[zi], 0, 0)

    def idx_p(*ids):
        return (jnp.maximum(ids[zi] - 1, 0), 0, 0)

    def idx_n(*ids):
        return (jnp.minimum(ids[zi] + 1, ZT - 1), 0, 0)

    mk = lambda im: pl.BlockSpec((1, P, C), im, memory_space=pltpu.VMEM)
    return mk(idx_p), mk(idx_c), mk(idx_n)


def _cspec(shape, czo: bool, chunk_dim=None):
    """BlockSpec for a per-chunk operand block; the chunk grid index selects
    along `chunk_dim` (None = unchunked, always block (0,..))."""
    ci = 0 if czo else 1

    def im(*ids):
        if chunk_dim is None:
            return (0,) * len(shape)
        return tuple(ids[ci] if d == chunk_dim else 0
                     for d in range(len(shape)))

    return pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)


def _make_q(dt):
    if dt == jnp.bfloat16:
        return lambda v: v.astype(jnp.bfloat16).astype(jnp.float32)
    return lambda v: v


def _prec(dt):
    """f32 dots run at HIGHEST precision — DEFAULT bf16-rounds f32 matmul
    operands (on TPU MXU and on the CPU interpret backend alike), which
    silently broke the f32 parity contract this kernel shares with
    ops/conv.py:30.  bf16 operands are MXU-native; DEFAULT is exact."""
    return (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _ext3(prev_ref, cur_ref, nxt_ref, P: int, lo: int):
    """(P + 2*lo, C) extended row tile from the three planes."""
    top = prev_ref[0, P - lo:, :]
    bot = nxt_ref[0, :lo, :]
    return jnp.concatenate([top, cur_ref[0], bot], axis=0)


def _expand_act(xt, w1_ref, a1_ref, c1_ref, *, q, dt, t, nt, P, lo):
    """Recompute the expanded activation a = relu6(BN1(x @ w1)) on an
    extended tile, zeroing out-of-image halo rows ('same' padding acts on
    the depthwise INPUT).  Returns (aq, eq, v1) — the masked activation,
    the quantized conv output (for ehat), and the pre-relu6 affine (for
    the relu6' mask); all (L, ch) f32 holding dt-rounded values."""
    L = xt.shape[0]
    e = jnp.dot(xt.astype(dt), w1_ref[...],
                preferred_element_type=jnp.float32,
                precision=_prec(dt))
    eq = q(e)
    v1 = q(q(eq * a1_ref[0]) + c1_ref[0])  # rounded like ops/bn.py's affine
    a = jnp.clip(v1, 0.0, 6.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    ok = ((row >= lo) | (t != 0)) & ((row < lo + P) | (t != nt - 1))
    return jnp.where(ok, a, 0.0), eq, v1


def _dw_from_aq(aq, wdw_ref, col, *, W, rate, HP, M):
    """Depthwise taps: out[k] = sum_taps w[dy,dx] * aq[k + HP + dy*W + dx]
    for k in [0, M).  Slice offsets are multiples of W (sublane-aligned).
    Holds for both frame layouts used here (aq base lo, out base lo - HP)."""
    ch = aq.shape[1]
    acc = jnp.zeros((M, ch), jnp.float32)
    for j, dx in enumerate((-rate, 0, rate)):
        sa = _shift_cols(aq, dx, col, W)
        for i, dy in enumerate((-rate, 0, rate)):
            off = HP + dy * W
            acc = acc + sa[off:off + M, :] * wdw_ref[i * 3 + j]
    return acc


def _bn2_mid(dq, a2_ref, c2_ref, mu2_ref, rstd2_ref, q):
    """v2 (pre-relu6 affine), its relu6' mask, and dhat for BN2 backward."""
    v2 = q(q(dq * a2_ref[0]) + c2_ref[0])
    mask2 = ((v2 > 0.0) & (v2 < 6.0)).astype(jnp.float32)
    dhat = (dq - mu2_ref[0]) * rstd2_ref[0]
    return v2, mask2, dhat


# v5e VMEM is far larger than the 16M default scoped limit; the widest
# backward phases (B3/B4 on the Ce=1024/rate-4 blocks) peak ~19-24MB of
# live f32 tiles, so raise the cap rather than shrink chunks (smaller
# chunks multiply the per-chunk plane re-reads).
_CP = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"),
                           vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# forward phases
# ---------------------------------------------------------------------------

def _run_f1(xp, w1, *, dt, nch, interpret):
    """Batch sum/sumsq of the quantized expand output.  Grid (chunk, z)."""
    ZT, P, Cin = xp.shape
    Ce = w1.shape[1]
    ch = Ce // nch
    q = _make_q(dt)

    def mbt_f1(xc_ref, w1_ref, s_ref, ss_ref):
        z = pl.program_id(1)
        e = jnp.dot(xc_ref[0].astype(dt), w1_ref[...],
                    preferred_element_type=jnp.float32,
                precision=_prec(dt))
        eq = q(e)

        @pl.when(z == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            ss_ref[...] = jnp.zeros_like(ss_ref)

        s_ref[...] += jnp.sum(eq, axis=0, keepdims=True)
        ss_ref[...] += jnp.sum(eq * eq, axis=0, keepdims=True)

    s, ss = pl.pallas_call(
        mbt_f1,
        grid=(nch, ZT),
        in_specs=[pl.BlockSpec((1, P, Cin), lambda c, z: (z, 0, 0),
                               memory_space=pltpu.VMEM),
                  _cspec((Cin, ch), True, 1)],
        out_specs=[_cspec((1, ch), True, 1)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, Ce), jnp.float32)] * 2,
        compiler_params=_CP, interpret=interpret,
    )(xp, w1)
    return s[0], ss[0]


def _run_f2(xp, w1, a1, c1, wdw, *, rate, nt, W, dt, nch, interpret):
    """Depthwise output dq (SAVED to HBM for F3/B2/B34) + its batch
    sum/sumsq.  Grid (chunk, z).  Materializing dq costs one 6C round
    trip but removes the expand-dot + 9-tap recompute from every later
    phase — measured, that trade wins by a wide margin (the taps are VPU
    work, and the VPU is this design's scarce resource)."""
    ZT, P, Cin = xp.shape
    Ce = w1.shape[1]
    ch = Ce // nch
    HP = rate * W
    lo = HP
    L = P + 2 * lo
    q = _make_q(dt)

    def mbt_f2(xp_ref, xc_ref, xn_ref, w1_ref, a1_ref, c1_ref, wdw_ref,
               s_ref, ss_ref, dq_ref):
        z = pl.program_id(1)
        t = z % nt
        xt = _ext3(xp_ref, xc_ref, xn_ref, P, lo)
        aq, _, _ = _expand_act(xt, w1_ref, a1_ref, c1_ref, q=q, dt=dt,
                               t=t, nt=nt, P=P, lo=lo)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % W
        d = _dw_from_aq(aq, wdw_ref, col, W=W, rate=rate, HP=HP, M=P)
        dq = q(d)
        dq_ref[0] = dq.astype(dq_ref.dtype)

        @pl.when(z == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            ss_ref[...] = jnp.zeros_like(ss_ref)

        s_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
        ss_ref[...] += jnp.sum(dq * dq, axis=0, keepdims=True)

    pln = _plane_specs(ZT, P, Cin, True)
    s, ss, dqs = pl.pallas_call(
        mbt_f2,
        grid=(nch, ZT),
        in_specs=[*pln, _cspec((Cin, ch), True, 1), _cspec((1, ch), True, 1),
                  _cspec((1, ch), True, 1), _cspec((16, ch), True, 1)],
        out_specs=[_cspec((1, ch), True, 1), _cspec((1, ch), True, 1),
                   pl.BlockSpec((1, P, ch), lambda c, z: (z, 0, c),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((1, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((ZT, P, Ce), dt)],
        compiler_params=_CP, interpret=interpret,
    )(xp, xp, xp, w1, a1, c1, wdw)
    return s[0], ss[0], dqs


def _run_f3(dqs, a2, c2, w2, *, dt, nch, interpret):
    """Project output y_raw (pre-BN3) from the saved dq.  Grid (z, chunk):
    y_raw accumulates over chunks in an f32 scratch."""
    ZT, P, Ce = dqs.shape
    Cout = w2.shape[1]
    ch = Ce // nch
    q = _make_q(dt)

    def mbt_f3(dq_ref, a2_ref, c2_ref, w2_ref, y_ref, acc_ref):
        c = pl.program_id(1)
        dq = dq_ref[0].astype(jnp.float32)
        v2 = q(q(dq * a2_ref[0]) + c2_ref[0])
        b = jnp.clip(v2, 0.0, 6.0)
        part = jnp.dot(b.astype(dt), w2_ref[...],
                       preferred_element_type=jnp.float32,
                precision=_prec(dt))

        @pl.when(c == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += part

        @pl.when(c == nch - 1)
        def _():
            y_ref[0] = acc_ref[...].astype(y_ref.dtype)

    return pl.pallas_call(
        mbt_f3,
        grid=(ZT, nch),
        in_specs=[pl.BlockSpec((1, P, ch), lambda z, c: (z, 0, c),
                               memory_space=pltpu.VMEM),
                  _cspec((1, ch), False, 1), _cspec((1, ch), False, 1),
                  _cspec((ch, Cout), False, 0)],
        out_specs=pl.BlockSpec((1, P, Cout), lambda z, c: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ZT, P, Cout), dt),
        scratch_shapes=[pltpu.VMEM((P, Cout), jnp.float32)],
        compiler_params=_CP, interpret=interpret,
    )(dqs, a2, c2, w2)


# ---------------------------------------------------------------------------
# backward phases
# ---------------------------------------------------------------------------

def _run_b2(dqs, gp, yp, a2, c2, mu2, rstd2, w2t, gA3, k0, k1,
            *, dt, nch, interpret):
    """dw-BN grad sums T1/T2 + dW2, from the saved dq.  Grid (chunk, z).
    gy = gA3*g + k0 + k1*yq is dL/dy_raw (project-BN backward in closed
    form over its grad sums); ddh = (gy @ w2^T) * relu6'(v2)."""
    ZT, P, Ce = dqs.shape
    Cout = w2t.shape[0]
    ch = Ce // nch
    q = _make_q(dt)

    def mbt_b2(dq_ref, g_ref, y_ref, a2_ref, c2_ref, mu2_ref, rstd2_ref,
               w2t_ref, gA3_ref, k0_ref, k1_ref, t1_ref, t2_ref, dw2_ref):
        z = pl.program_id(1)
        dq = dq_ref[0].astype(jnp.float32)
        v2, mask2, dhat = _bn2_mid(dq, a2_ref, c2_ref, mu2_ref, rstd2_ref, q)
        gf = g_ref[0].astype(jnp.float32)
        yq = y_ref[0].astype(jnp.float32)
        gy = gA3_ref[0] * gf + k0_ref[0] + k1_ref[0] * yq      # (P, Cout)
        ddh = jnp.dot(gy.astype(dt), w2t_ref[...],
                      preferred_element_type=jnp.float32,
                precision=_prec(dt)) * mask2
        b = jnp.clip(v2, 0.0, 6.0)
        dw2c = jax.lax.dot_general(
            b.astype(dt), gy.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_prec(dt))                # (ch, Cout)

        @pl.when(z == 0)
        def _():
            t1_ref[...] = jnp.zeros_like(t1_ref)
            t2_ref[...] = jnp.zeros_like(t2_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)

        t1_ref[...] += jnp.sum(ddh, axis=0, keepdims=True)
        t2_ref[...] += jnp.sum(ddh * dhat, axis=0, keepdims=True)
        dw2_ref[...] += dw2c

    gspec = pl.BlockSpec((1, P, Cout), lambda c, z: (z, 0, 0),
                         memory_space=pltpu.VMEM)
    cw = lambda s, d=1: _cspec(s, True, d)
    t1, t2, dw2 = pl.pallas_call(
        mbt_b2,
        grid=(nch, ZT),
        in_specs=[pl.BlockSpec((1, P, ch), lambda c, z: (z, 0, c),
                               memory_space=pltpu.VMEM),
                  gspec, gspec, cw((1, ch)), cw((1, ch)), cw((1, ch)),
                  cw((1, ch)), cw((Cout, ch)), _cspec((1, Cout), True),
                  _cspec((1, Cout), True), _cspec((1, Cout), True)],
        out_specs=[cw((1, ch)), cw((1, ch)), _cspec((ch, Cout), True, 0)],
        out_shape=[jax.ShapeDtypeStruct((1, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((1, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((Ce, Cout), jnp.float32)],
        compiler_params=_CP, interpret=interpret,
    )(dqs, gp, yp, a2, c2, mu2, rstd2, w2t, gA3, k0, k1)
    return t1[0], t2[0], dw2


def _run_b34(xp, dqs, gp, yp, w1, a1, c1, wdw, a2, c2, mu2, rstd2, w2t,
             w1t, gA3, k0, k1, m0, m1, mu1, rstd1, *, rate, nt, W, dt, nch,
             interpret):
    """Merged BN1-backward phase: expand-BN grad sums U1/U2, dWdw taps,
    dW1, and the MAIN part of dx — all in one pass over the saved dq.

    dd = a2*ddh + m0 + m1*dq is dL/d(dw output) via BN2's closed form;
    da = transpose-taps(dd); dv1 = da * relu6'(v1).  The BN1 mean terms
    (-U1/N - ehat*U2/N) would force a second pass (U is a full-batch sum),
    but their contribution to dx and dW1 is ANALYTIC in x:
        de_corr = l0 + l1*eq   with eq ~= x @ w1
        dx_corr = 1 (x) (l0 @ w1^T)  +  x @ ((w1 * l1) @ w1^T)
        dW1_corr = colsum(x) (x) l0  +  (x^T x) @ (w1 * l1)
    so the kernel emits only the a1*dv1 terms plus the U sums, and
    `_bwd_impl` adds the rank-1/narrow-matmul corrections in XLA.  This
    halves the backward's heaviest phase (the old B3/B4 pair recomputed
    the whole chain twice; profiled at 66+63 ms/step of the 328 ms total).

    Grid (chunk, z): U/dWdw/dW1 accumulate chunk-outer; dx partials are
    write-only per (chunk, z) and summed with the corrections in XLA."""
    ZT, P, Cin = xp.shape
    Ce = w1.shape[1]
    Cout = w2t.shape[0]
    ch = Ce // nch
    HP = rate * W
    lo2 = 2 * HP
    L2 = P + 4 * HP
    m = P + 2 * HP
    q = _make_q(dt)

    def mbt_b34(xp_ref, xc_ref, xn_ref, dp_ref, dc_ref, dn_ref, gp_ref,
                gc_ref, gn_ref, yp_ref, yc_ref, yn_ref, w1_ref, a1_ref,
                c1_ref, wdw_ref, a2_ref, c2_ref, mu2_ref, rstd2_ref,
                w2t_ref, w1t_ref, gA3_ref, k0_ref, k1_ref, m0_ref, m1_ref,
                mu1_ref, rstd1_ref, u1_ref, u2_ref, dwdw_ref, dxp_ref,
                dw1t_ref):
        z = pl.program_id(1)
        t = z % nt
        xt = _ext3(xp_ref, xc_ref, xn_ref, P, lo2)
        aq, eq, v1 = _expand_act(xt, w1_ref, a1_ref, c1_ref, q=q, dt=dt,
                                 t=t, nt=nt, P=P, lo=lo2)
        dq3 = _ext3(dp_ref, dc_ref, dn_ref, P, HP).astype(jnp.float32)
        g3 = _ext3(gp_ref, gc_ref, gn_ref, P, HP).astype(jnp.float32)
        y3 = _ext3(yp_ref, yc_ref, yn_ref, P, HP).astype(jnp.float32)
        v2 = q(q(dq3 * a2_ref[0]) + c2_ref[0])
        mask2 = ((v2 > 0.0) & (v2 < 6.0)).astype(jnp.float32)
        gy = gA3_ref[0] * g3 + k0_ref[0] + k1_ref[0] * y3       # (m, Cout)
        ddh = jnp.dot(gy.astype(dt), w2t_ref[...],
                      preferred_element_type=jnp.float32,
                precision=_prec(dt)) * mask2
        dd = a2_ref[0] * ddh + m0_ref[0] + m1_ref[0] * dq3
        # out-of-image rows of dd contribute nothing to da/dWdw
        rowm = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        okm = ((rowm >= HP) | (t != 0)) & ((rowm < HP + P) | (t != nt - 1))
        dd = jnp.where(okm, dd, 0.0)
        colm = rowm % W

        @pl.when(z == 0)
        def _():
            u1_ref[...] = jnp.zeros_like(u1_ref)
            u2_ref[...] = jnp.zeros_like(u2_ref)
            dwdw_ref[...] = jnp.zeros_like(dwdw_ref)
            dw1t_ref[...] = jnp.zeros_like(dw1t_ref)

        # da[p] = sum_taps w[dy,dx] * dd[HP + p - dy*W - dx]  (transpose),
        # dWdw[dy,dx] = sum_p dd[HP+p] * aq[2HP + p + dy*W + dx]
        #            = sum_p dd[HP+p-dx] * aq[2HP + p + dy*W]
        # (the column shift rides the SAME sd used for da: shifting the
        # per-tile summation window by dx is absorbed across the tile sum
        # — the traded boundary terms are zero via okm / the out-of-image
        # aq mask — so aq needs no shifted copies of its (L2, ch) array)
        da = jnp.zeros((P, ch), jnp.float32)
        for j, dx_ in enumerate((-rate, 0, rate)):
            sd = _shift_cols(dd, -dx_, colm, W)
            sdc = sd[HP:HP + P, :]
            for i, dy in enumerate((-rate, 0, rate)):
                da = da + sd[HP - dy * W:HP - dy * W + P, :] * wdw_ref[i * 3 + j]
                off = lo2 + dy * W
                dwdw_ref[i * 3 + j:i * 3 + j + 1, :] += jnp.sum(
                    sdc * aq[off:off + P, :], axis=0, keepdims=True)

        v1c = v1[lo2:lo2 + P, :]
        mask1 = ((v1c > 0.0) & (v1c < 6.0)).astype(jnp.float32)
        eqc = eq[lo2:lo2 + P, :]
        ehat = (eqc - mu1_ref[0]) * rstd1_ref[0]
        dv1 = da * mask1
        u1_ref[...] += jnp.sum(dv1, axis=0, keepdims=True)
        u2_ref[...] += jnp.sum(dv1 * ehat, axis=0, keepdims=True)
        dvl = a1_ref[0] * dv1                                   # (P, ch)
        dxp_ref[0] = jnp.dot(dvl.astype(dt), w1t_ref[...],
                             preferred_element_type=jnp.float32,
                precision=_prec(dt)
                             ).astype(dxp_ref.dtype)
        dw1t_ref[...] += jax.lax.dot_general(
            dvl.astype(dt), xc_ref[0].astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_prec(dt))                 # (ch, Cin)

    pln = _plane_specs(ZT, P, Cin, True)

    # dq planes are chunk-sliced along the lane dim as well as z-indexed
    def dqi(sel):
        def im(c, z):
            return (sel(z), 0, c)
        return pl.BlockSpec((1, P, ch), im, memory_space=pltpu.VMEM)
    dpl = (dqi(lambda z: jnp.maximum(z - 1, 0)), dqi(lambda z: z),
           dqi(lambda z: jnp.minimum(z + 1, ZT - 1)))
    gpl = _plane_specs(ZT, P, Cout, True)
    ypl = _plane_specs(ZT, P, Cout, True)
    cw = lambda s, d=1: _cspec(s, True, d)

    def dx_idx(c, z):
        return (c * ZT + z, 0, 0)

    u1, u2, dwdw, dxp, dw1t = pl.pallas_call(
        mbt_b34,
        grid=(nch, ZT),
        in_specs=[*pln, *dpl, *gpl, *ypl, cw((Cin, ch)), cw((1, ch)),
                  cw((1, ch)), cw((16, ch)), cw((1, ch)), cw((1, ch)),
                  cw((1, ch)), cw((1, ch)), cw((Cout, ch)),
                  _cspec((ch, Cin), True, 0), _cspec((1, Cout), True),
                  _cspec((1, Cout), True), _cspec((1, Cout), True),
                  cw((1, ch)), cw((1, ch)), cw((1, ch)), cw((1, ch))],
        out_specs=[cw((1, ch)), cw((1, ch)), cw((16, ch)),
                   pl.BlockSpec((1, P, Cin), dx_idx,
                                memory_space=pltpu.VMEM),
                   _cspec((ch, Cin), True, 0)],
        out_shape=[jax.ShapeDtypeStruct((1, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((1, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((16, Ce), jnp.float32),
                   jax.ShapeDtypeStruct((nch * ZT, P, Cin), dt),
                   jax.ShapeDtypeStruct((Ce, Cin), jnp.float32)],
        compiler_params=_CP, interpret=interpret,
    )(xp, xp, xp, dqs, dqs, dqs, gp, gp, gp, yp, yp, yp, w1, a1, c1, wdw,
      a2, c2, mu2, rstd2, w2t, w1t, gA3, k0, k1, m0, m1, mu1, rstd1)
    return u1[0], u2[0], dwdw, dxp, dw1t


# ---------------------------------------------------------------------------
# custom-vjp block
# ---------------------------------------------------------------------------

def _finalize(s, ss, N):
    mu = s / N
    var = jnp.maximum(ss / N - mu * mu, 0.0)
    return mu, var


def _affine(gamma, beta, mu, var, eps, dt):
    """ops/bn.py's scale/shift, rounded to the compute dtype but held f32."""
    rstd = jax.lax.rsqrt(var + eps)
    scale = gamma * rstd
    a = scale.astype(dt).astype(jnp.float32)
    c = (beta - mu * scale).astype(dt).astype(jnp.float32)
    return a, c, rstd, scale


def _row(v):
    return v.reshape(1, -1)


def _fwd_impl(rate, skip, rows_t, interpret, eps,
              x, w1, g1, b1, wdw, g2, b2, w2, g3, b3):
    B, H, W, Cin = x.shape
    assert H % rows_t == 0 and 2 * rate <= rows_t, (H, rows_t, rate)
    nt = H // rows_t
    P = rows_t * W
    ZT = B * nt
    Ce, Cout = w2.shape
    dt = x.dtype
    nch = _pick_nch(Ce, P + 4 * rate * W)
    N = jnp.float32(B * H * W)

    xp = x.reshape(ZT, P, Cin)
    w1d = w1.astype(dt)
    w2d = w2.astype(dt)
    wdwf = wdw.astype(jnp.float32)

    s1, ss1 = _run_f1(xp, w1d, dt=dt, nch=nch, interpret=interpret)
    mu1, var1 = _finalize(s1, ss1, N)
    a1, c1, rstd1, _ = _affine(g1, b1, mu1, var1, eps, dt)

    s2, ss2, dqs = _run_f2(xp, w1d, _row(a1), _row(c1), wdwf, rate=rate,
                           nt=nt, W=W, dt=dt, nch=nch, interpret=interpret)
    mu2, var2 = _finalize(s2, ss2, N)
    a2, c2, rstd2, _ = _affine(g2, b2, mu2, var2, eps, dt)

    y_raw = _run_f3(dqs, _row(a2), _row(c2), w2d, dt=dt, nch=nch,
                    interpret=interpret)

    yqf = y_raw.astype(jnp.float32)
    s3 = jnp.sum(yqf, axis=(0, 1))
    ss3 = jnp.sum(yqf * yqf, axis=(0, 1))
    mu3, var3 = _finalize(s3, ss3, N)
    a3, c3, rstd3, _ = _affine(g3, b3, mu3, var3, eps, dt)

    out = y_raw * a3.astype(dt) + c3.astype(dt)
    if skip:
        out = out + xp
    out = out.reshape(B, H, W, Cout)
    stats = (mu1, var1, mu2, var2, mu3, var3)
    return out, stats, y_raw, dqs


def _bwd_impl(rate, skip, rows_t, interpret, eps, res, cts):
    (x, y_raw, dqs, w1, wdw, w2, g1, b1, g2, b2, g3, b3, stats) = res
    mu1, var1, mu2, var2, mu3, var3 = stats
    ct_out, _ct_stats = cts  # moving-stat EMA is stop_gradient'd by caller
    B, H, W, Cin = x.shape
    nt = H // rows_t
    P = rows_t * W
    ZT = B * nt
    Ce, Cout = w2.shape
    dt = x.dtype
    nch = _pick_nch(Ce, P + 4 * rate * W)
    N = jnp.float32(B * H * W)
    kw = dict(rate=rate, nt=nt, W=W, dt=dt, nch=nch, interpret=interpret)

    xp = x.reshape(ZT, P, Cin)
    gp = ct_out.astype(dt).reshape(ZT, P, Cout)
    w1d = w1.astype(dt)
    w2t = jnp.swapaxes(w2, 0, 1).astype(dt)
    w1t = jnp.swapaxes(w1, 0, 1).astype(dt)
    wdwf = wdw.astype(jnp.float32)

    # B1: project-BN grad sums (XLA: one fused pass over narrow tensors)
    gf = gp.astype(jnp.float32)
    yqf = y_raw.astype(jnp.float32)
    rstd1 = jax.lax.rsqrt(var1 + eps)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    rstd3 = jax.lax.rsqrt(var3 + eps)
    yhat = (yqf - mu3) * rstd3
    S1 = jnp.sum(gf, axis=(0, 1))
    S2 = jnp.sum(gf * yhat, axis=(0, 1))
    dg3, db3 = S2, S1

    scale3 = g3 * rstd3
    gA3 = scale3
    k0 = scale3 * (-S1 / N + S2 * mu3 * rstd3 / N)
    k1 = -scale3 * S2 * rstd3 / N

    a1, c1, _, scale1 = _affine(g1, b1, mu1, var1, eps, dt)
    a2, c2, _, scale2 = _affine(g2, b2, mu2, var2, eps, dt)

    T1, T2, dw2 = _run_b2(dqs, gp, y_raw, _row(a2), _row(c2), _row(mu2),
                          _row(rstd2), w2t, _row(gA3), _row(k0), _row(k1),
                          dt=dt, nch=nch, interpret=interpret)
    dg2, db2 = T2, T1
    m0 = scale2 * (-T1 / N + T2 * mu2 * rstd2 / N)
    m1 = -scale2 * T2 * rstd2 / N

    U1, U2, dwdw, dxp, dw1t = _run_b34(
        xp, dqs, gp, y_raw, w1d, _row(a1), _row(c1), wdwf, _row(a2),
        _row(c2), _row(mu2), _row(rstd2), w2t, w1t, _row(gA3), _row(k0),
        _row(k1), _row(m0), _row(m1), _row(mu1), _row(rstd1), **kw)
    dg1, db1 = U2, U1
    l0 = scale1 * (-U1 / N + U2 * mu1 * rstd1 / N)
    l1 = -scale1 * U2 * rstd1 / N

    # BN1 mean-term corrections, analytic in x (see _run_b34 docstring):
    #   de_corr = l0 + l1*eq with eq = x @ w1, so
    #   dx   += broadcast(l0 @ w1^T) + x @ ((w1*l1) @ w1^T)
    #   dW1  += colsum(x) (x) l0     + (x^T x) @ (w1*l1)
    dx = jnp.sum(dxp.reshape(nch, ZT, P, Cin).astype(jnp.float32), axis=0)
    prec = _prec(dt)
    w1f = w1d.astype(jnp.float32)
    xf = xp.astype(jnp.float32)
    M = jnp.matmul(w1f * l1, w1f.T, precision=prec)
    dx = (dx + jnp.matmul(l0[None], w1f.T, precision=prec)[0]
          + jnp.matmul(xf, M, precision=prec))
    if skip:
        dx = dx + gf
    dx = dx.astype(dt).reshape(B, H, W, Cin)
    x2 = xf.reshape(ZT * P, Cin)
    dw1 = (jnp.swapaxes(dw1t, 0, 1)
           + jnp.outer(jnp.sum(x2, axis=0), l0)
           + jnp.matmul(jnp.matmul(x2.T, x2, precision=prec), w1f * l1,
                        precision=prec))
    return (dx, dw1, dg1, db1, dwdw, dg2, db2, dw2, dg3, db3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _block_train(rate, skip, rows_t, interpret, eps,
                 x, w1, g1, b1, wdw, g2, b2, w2, g3, b3):
    out, stats, _, _ = _fwd_impl(rate, skip, rows_t, interpret, eps,
                                 x, w1, g1, b1, wdw, g2, b2, w2, g3, b3)
    return out, stats


def _block_train_fwd(rate, skip, rows_t, interpret, eps,
                     x, w1, g1, b1, wdw, g2, b2, w2, g3, b3):
    out, stats, y_raw, dqs = _fwd_impl(rate, skip, rows_t, interpret, eps,
                                       x, w1, g1, b1, wdw, g2, b2, w2,
                                       g3, b3)
    res = (x, y_raw, dqs, w1, wdw, w2, g1, b1, g2, b2, g3, b3, stats)
    return (out, stats), res


_block_train.defvjp(_block_train_fwd, _bwd_impl)


def block_train(x, w1, g1, b1, wdw, g2, b2, w2, g3, b3, *, rate: int,
                skip: bool, rows_t: int = 8, eps: float = 1e-3,
                interpret: bool = False):
    """Training-mode fused inverted-residual block.

    x (B,H,W,Cin) in the compute dtype; w1 (Cin,Ce) f32; wdw (16,Ce) f32
    raw taps ((dy,dx) row-major in rows 0-8, sublane-padded); w2 (Ce,Cout)
    f32; g*/b* the three BNs' gamma/beta (f32).  Stride 1, 'same',
    dilation `rate`; `skip` adds the residual.  Returns (out, stats) with
    stats = (mu1, var1, mu2, var2, mu3, var3) — the BATCH statistics, for
    the caller's moving-average update (Keras momentum semantics).

    When the expanded width must be chunked (VMEM), Ce is zero-padded so
    chunk lane sizes are x128 (Mosaic block constraint); padded channels
    are inert (gamma=0 -> zero activation) and grads flow back through the
    pad's vjp, so callers never see them."""
    B, H, W, _ = x.shape
    Ce = w1.shape[1]
    cep, _ = _plan_chunks(Ce, rows_t * W + 4 * rate * W)
    if cep != Ce:
        p = cep - Ce
        w1 = jnp.pad(w1, ((0, 0), (0, p)))
        wdw = jnp.pad(wdw, ((0, 0), (0, p)))
        w2 = jnp.pad(w2, ((0, p), (0, 0)))
        g1, b1, g2, b2 = (jnp.pad(v, (0, p)) for v in (g1, b1, g2, b2))
    out, stats = _block_train(rate, skip, rows_t, interpret, eps,
                              x, w1, g1, b1, wdw, g2, b2, w2, g3, b3)
    if cep != Ce:
        mu1, var1, mu2, var2, mu3, var3 = stats
        stats = (mu1[:Ce], var1[:Ce], mu2[:Ce], var2[:Ce], mu3, var3)
    return out, stats


# ---------------------------------------------------------------------------
# ctx-level wrapper (models/mobilenetv2.py hook)
# ---------------------------------------------------------------------------

def fused_train_block_apply(ctx, x, prefix: str, rate: int, skip: bool,
                            interpret: bool = False):
    """Run one inverted-residual block (expand present, stride 1) through
    the fused TRAINING kernels, reading the same ctx params as the XLA
    path (models/mobilenetv2.py) and applying the same moving-stat EMA
    (momentum 0.999, ops/bn.py) from the kernels' batch statistics."""
    eps = 1e-3
    momentum = 0.999
    pr = ctx.param
    w1 = pr(prefix + "expand", "kernel", None, None)[0, 0]       # (Cin, Ce)
    g1 = pr(prefix + "expand_BN", "gamma", None, None)
    b1 = pr(prefix + "expand_BN", "beta", None, None)
    wdw4 = pr(prefix + "depthwise", "depthwise_kernel", None, None)
    g2 = pr(prefix + "depthwise_BN", "gamma", None, None)
    b2 = pr(prefix + "depthwise_BN", "beta", None, None)
    w2 = pr(prefix + "project", "kernel", None, None)[0, 0]      # (Ce, Cout)
    g3 = pr(prefix + "project_BN", "gamma", None, None)
    b3 = pr(prefix + "project_BN", "beta", None, None)
    Ce = w1.shape[1]
    wdw = jnp.pad(wdw4[..., 0].reshape(9, Ce), ((0, 7), (0, 0)))

    out, stats = block_train(x.astype(ctx.compute_dtype), w1, g1, b1, wdw,
                             g2, b2, w2, g3, b3, rate=rate, skip=skip,
                             eps=eps, interpret=interpret)
    stats = jax.tree_util.tree_map(jax.lax.stop_gradient, stats)
    mu1, var1, mu2, var2, mu3, var3 = stats
    for name, mu, var in ((prefix + "expand_BN", mu1, var1),
                          (prefix + "depthwise_BN", mu2, var2),
                          (prefix + "project_BN", mu3, var3)):
        mov_mean = ctx.stat(name, "moving_mean", None, 0.0)
        mov_var = ctx.stat(name, "moving_variance", None, 1.0)
        ctx.update_stat(name, "moving_mean",
                        mov_mean * momentum + mu * (1.0 - momentum))
        ctx.update_stat(name, "moving_variance",
                        mov_var * momentum + var * (1.0 - momentum))
    return out


def use_fused_train_block(ctx, x, stride: int, block_id, prefix: str) -> bool:
    """Training fast path: stride-1 blocks with an expand conv, bf16,
    un-frozen, on a single device.  Init/calibration/f32-parity keep
    XLA.  Multi-chip: a sharded jit cannot partition the Pallas custom
    calls (no SPMD rule), so either the run owns ONE global device, or
    the caller executes per-device inside shard_map (Trainer(ddp=True))
    and sets ctx.shard_local — the phase kernels then compute batch
    statistics over the LOCAL shard (torch-DDP BatchNorm semantics; the
    ddp step pmeans the moving-stat updates across devices)."""
    if not (ENABLED and block_id and stride == 1
            and ctx.mode == "apply" and ctx.training
            and not ctx.bn_calibrate
            and ctx.compute_dtype == jnp.bfloat16
            and x.shape[1] % 8 == 0
            and (ctx.shard_local or len(jax.devices()) == 1)
            and pallas_available()):
        return False
    layers = (prefix + "expand", prefix + "expand_BN", prefix + "depthwise",
              prefix + "depthwise_BN", prefix + "project",
              prefix + "project_BN")
    return not any(l in ctx.frozen for l in layers)
