"""Per-kernel measured-wall + roofline table for a dense-CRF bench trace.

VERDICT r3 task 6 / r4 #4 asked whether the literal reference-parameter
CRF mirror (color_step=1, gaussian taps — pydensecrf's exact kernel
parameters, reference utils.py:78-86) can reach 250 img/s/chip, or for a
measured per-kernel wall table proving the remaining cost irreducible.
This tool produces that table: it itemizes a ``BENCH_PROFILE`` xplane
trace of a CRF-only stage by kernel family and joins the two dominant
Pallas families with their ANALYTIC MXU FLOP counts (derived from the
same geometry/chunk formulas the engine uses — _PallasPlan in
crf/dense_crf.py, the wrappers in kernels/crf_fused.py), so each row
shows achieved TFLOP/s and % of the chip's bf16 peak.

The punchline it measures (see IMPLEMENTATION_NOTES.md): at nc=21 the
grid matmuls run at ~80-90% of MXU peak, and the algorithm's total
matmul work is ~88 TFLOP per 64-image call — so even a 100%-of-peak
oracle tops out well under 250 img/s.  The remaining cost is FLOPs, not
kernel inefficiency; the only lever is a smaller/better quadrature grid,
which is exactly what FAST_FAITHFUL_CONFIG/PRODUCTION_CONFIG do at
equal-or-better golden agreement (crf/__init__.py).

Usage (repo root, TPU):

  BENCH_PROFILE=/tmp/prof BENCH_STAGES=crf_ref python bench.py
  python tools/profile_crf.py /tmp/prof/crf_ref          # mirror config
  python tools/profile_crf.py /tmp/prof/crf_fast --cfg fast_faithful

Prints the family table + a one-line JSON record.
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# v5e (TPU v5 lite) bf16 MXU peak; override for other chips.
PEAK_TFLOPS = float(os.environ.get("TPU_PEAK_BF16_TFLOPS", "197"))

BATCH, H, W, L = 64, 512, 512, 21
TRACED_CALLS = 3  # bench timeit traces 3 calls per stage


def geometry(cfg):
    """Replicate _PallasPlan's cell/grid geometry + the wrappers' chunk
    halving (dense_crf.py::_PallasPlan.__init__, _splat_chunk;
    crf_fused.py::mf_step_planes) for the bench image size."""
    from deeplab_tpu.kernels.crf_fused import _c_pad, _d_pad

    cs = max(int(round(cfg.sxy_bilateral)), 1)
    cs_y = cs
    for d in range(cs, max(cs // 2, 1) - 1, -1):
        if H % d == 0:
            cs_y = d
            break
    cs_x = 128 if cs >= 80 else cs
    nc = int(math.floor(255.0 / (cfg.srgb * cfg.color_step))) + 2
    ny, nx = -(-H // cs_y), -(-W // cs_x)
    Z, P = ny * nx, cs_y * cs_x
    D, C = _d_pad(nc, L), _c_pad(nc)

    def splat_chunk(P_v, Lv):
        budget, chunk = 12 << 20, P_v
        while ((_d_pad(nc, Lv) + 2 * _c_pad(nc)) * chunk * 2 > budget
               and chunk % 2 == 0):
            chunk //= 2
        return chunk

    stride = (cfg.splat_stride if cfg.splat_stride > 1
              and cs_y % cfg.splat_stride == 0
              and cs_x % cfg.splat_stride == 0 else 1)
    P_sub = P // (stride * stride)
    mf_budget, mf_chunk = (8 << 20) if stride > 1 else (6 << 20), P
    while nc * L * mf_chunk * 4 > mf_budget and mf_chunk % 2 == 0:
        mf_chunk //= 2
    return dict(nc=nc, Z=Z, P=P, P_sub=P_sub, D=D, C=C, cs_y=cs_y,
                cs_x=cs_x, stride=stride,
                splat_chunks=P_sub // splat_chunk(P_sub, L),
                mf_chunks=P // mf_chunk)


def analytic_tflops(cfg):
    """MXU TFLOP per bench call (B=64), by family, for the dominant
    kernels.  Per plane (B*Z of them):
    - splat (_splat_kernel): the (nc*L, chunk) @ (chunk, C_pad) dot over
      all chunks = 2 * nc*L * P_sub * C_pad
    - mf_step (_blur_slice): color blur (nc*L, C) @ (C, C) RECOMPUTED per
      chunk + slice (nc*L, C) @ (C, chunk) over all chunks
    - z_blur (XLA einsum): 2 * B * Z * Z * D * C per application
    n_iters applications each; z_blur has one extra (the norm grid)."""
    g = geometry(cfg)
    nc, Z, C, D = g["nc"], g["Z"], g["C"], g["D"]
    planes = BATCH * Z
    it = cfg.n_iters
    splat = 2 * (nc * L) * g["P_sub"] * C * planes * it
    blur = 2 * (nc * L) * C * C * g["mf_chunks"] * planes * it
    slc = 2 * (nc * L) * C * g["P"] * planes * it
    zblur = 2 * BATCH * Z * Z * D * C * (it + 1)
    return g, {"splat_planes(Q)": splat / 1e12,
               "mf_step_planes": (blur + slc) / 1e12,
               "z_blur (XLA)": zblur / 1e12}


def _family(full_name: str) -> str:
    """Kernel family of one XLA-Ops event.  Matched against the HLO
    instruction name only (the text after ' = ' carries operand names,
    which cross-match other families)."""
    instr = full_name.split(" = ")[0]
    if "mf_step_planes" in instr:
        return "mf_step_planes"
    if "splat_planes" in instr:
        # the norm pass (values = ones, L=1) emits an f32 grid; the
        # per-iteration Q splats emit bf16
        return ("splat_planes(norm)" if " = f32[" in full_name
                else "splat_planes(Q)")
    if "gaussian_blur_planes" in instr:
        return "gaussian_blur_planes"
    if "slice_attrs_planes" in instr:
        return "slice_attrs_planes"
    if "reshape" in instr or "copy" in instr:
        # the z-blur einsum's free-bitcast reshapes + state copies
        return "reshapes/copies"
    return "xla_glue (z_blur et al)"


def itemize(logdir: str, cfg_name: str = "mirror"):
    import xplane
    from deeplab_tpu.crf import (FAST_FAITHFUL_CONFIG, PRODUCTION_CONFIG,
                                 THROUGHPUT_CONFIG)
    from deeplab_tpu.crf.dense_crf import CrfConfig

    cfg = {"mirror": CrfConfig(), "fast_faithful": FAST_FAITHFUL_CONFIG,
           "production": PRODUCTION_CONFIG,
           "throughput": THROUGHPUT_CONFIG}[cfg_name]
    g, tflops = analytic_tflops(cfg)

    space = xplane.load_xspace(xplane.newest_trace(logdir))
    totals = {}
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            # ONLY the synchronous op stream: "Async XLA Ops" carries
            # overlapped DMA (it does not add wall time) and "XLA Modules"
            # would double-count children
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                fam = _family(plane.event_metadata[ev.metadata_id].name)
                totals[fam] = totals.get(fam, 0.0) + ev.duration_ps / 1e9

    per_call = {k: v / TRACED_CALLS for k, v in totals.items()}
    tot = sum(per_call.values())
    print(f"dense-CRF {cfg_name} cfg — nc={g['nc']} grid "
          f"(D={g['D']}, C={g['C']}), {cfg.n_iters} iters, B={BATCH}, "
          f"cells {g['cs_y']}x{g['cs_x']}, splat stride {g['stride']}")
    print(f"{'family':<22} {'ms/call':>9} {'share':>6} {'TFLOP':>7} "
          f"{'TF/s':>6} {'%peak':>6}")
    sol_ms = 0.0
    for fam, ms in sorted(per_call.items(), key=lambda kv: -kv[1]):
        fl = tflops.get(fam)
        if fl is not None:
            tfs = fl / (ms / 1e3)
            sol_ms += fl / PEAK_TFLOPS * 1e3
            print(f"{fam:<22} {ms:9.2f} {100 * ms / tot:5.1f}% {fl:7.2f} "
                  f"{tfs:6.1f} {100 * tfs / PEAK_TFLOPS:5.1f}%")
        else:
            print(f"{fam:<22} {ms:9.2f} {100 * ms / tot:5.1f}%"
                  f" {'—':>7} {'—':>6} {'—':>6}")
    print(f"{'TOTAL':<22} {tot:9.2f} ms  ->  {BATCH / (tot / 1e3):.1f} "
          f"img/s/chip of device op time")
    mat = sum(tflops.values())
    print(f"speed-of-light check: {mat:.1f} TFLOP of matmul work per call "
          f"=> {mat / PEAK_TFLOPS * 1e3:.0f} ms at 100% of "
          f"{PEAK_TFLOPS:.0f} TF/s bf16 peak = "
          f"{BATCH / (mat / PEAK_TFLOPS):.0f} img/s/chip MAX")
    rec = {"metric": f"crf_{cfg_name}_kernel_ms",
           "families": {k: round(v, 2) for k, v in sorted(
               per_call.items(), key=lambda kv: -kv[1])},
           "analytic_tflop": {k: round(v, 2) for k, v in tflops.items()},
           "total_ms": round(tot, 2),
           "device_img_s": round(BATCH / (tot / 1e3), 1),
           "sol_img_s_at_peak": round(BATCH / (mat / PEAK_TFLOPS), 1)}
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof/crf_ref"
    cfg = "mirror"
    if "--cfg" in sys.argv:
        cfg = sys.argv[sys.argv.index("--cfg") + 1]
    itemize(logdir, cfg)
