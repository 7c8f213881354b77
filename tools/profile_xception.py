"""Itemize the Xception serving forward into per-region device-time buckets.

VERDICT r4 task 6: the Xception entry-flow attack must start from a
measured per-region table, not the aggregate "~30 mid-size conv fusions"
observation.  This itemizes the EXACT bench "xception" stage program
(SegNet(512, 21, 'xception').predict_ids bf16 + faithful CRF, bs=16 —
see bench.py) from a jax.profiler xplane trace, using the
``jax.named_scope`` region labels models/xception.py emits
(xstem / xentry1-3 / xmidNN / xexit1-2) plus deeplabv3p.py's aspp/head.

Usage (repo root, TPU):

  # 1. capture a trace of the bench xception stage (3 traced calls)
  BENCH_PROFILE=/tmp/prof BENCH_STAGES=xception python bench.py
  # 2. itemize it
  python tools/profile_xception.py /tmp/prof/xception

Prints the region table + a one-line JSON record.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

SZ = (512, 512)

# ordered first-match-wins region rules over the op_name scope string
RULES = [
    ("xstem", lambda s: "xstem" in s),
    ("xentry1", lambda s: "xentry1" in s),
    ("xentry2", lambda s: "xentry2" in s),
    ("xentry3", lambda s: "xentry3" in s),
    ("xmiddle(16)", lambda s: re.search(r"xmid\d{2}", s) is not None),
    ("xexit", lambda s: "xexit" in s),
    ("aspp", lambda s: "aspp" in s),
    ("head", lambda s: "head" in s),
]

_METADATA_RE = re.compile(r'%([\w.\-]+) = .*op_name="([^"]+)"')


def opname_map(bs: int = 16):
    """{hlo_instruction_name: op_name} for the bench xception stage.

    Lower+compile with CONCRETE arrays exactly like the bench stage so the
    persistent .jax_cache entry bench just wrote is hit.  Compile only."""
    import jax
    import jax.numpy as jnp
    from deeplab_tpu import crf
    from deeplab_tpu.crf.dense_crf import mean_field_batched
    from deeplab_tpu.models.seg_model import SegNet

    xm = SegNet(SZ, 21, "xception", "original")   # == bench.py xception stage
    xp, xs = xm.init(jax.random.key(0))
    crf_cfg = crf.CrfConfig()

    @jax.jit
    def xinfer(p, s, im):
        pr = xm.predict_ids(p, s, im, compute_dtype=jnp.bfloat16,
                            shard_local=True)
        return mean_field_batched(im, pr, crf_cfg)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(bs, SZ[0], SZ[1], 3) * 255, jnp.float32)
    compiled = xinfer.lower(xp, xs, img).compile()
    out = {}
    for m in _METADATA_RE.finditer(compiled.as_text()):
        out[m.group(1)] = m.group(2)
    return out


def itemize(logdir: str, bs: int = 16, steps: int = 3, top: int = 10):
    import xplane

    names = opname_map(bs)
    space = xplane.load_xspace(xplane.newest_trace(logdir))

    totals, members = {}, {}
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":   # Async XLA Ops = overlapped DMA
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                instr = md.display_name or md.name.split(" ", 1)[0].lstrip("%")
                scope = names.get(instr, "")
                ms = ev.duration_ps / 1e9
                for region, pred in RULES:
                    if pred(scope):
                        break
                else:
                    # CRF kernels are custom-calls with no model scope
                    region = "crf+other"
                totals[region] = totals.get(region, 0.0) + ms
                key = f"{instr} [{scope[-70:]}]" if scope else instr
                mem = members.setdefault(region, {})
                mem[key] = mem.get(key, 0.0) + ms

    per_step = {k: v / steps for k, v in totals.items()}
    tot = sum(per_step.values())

    print(f"xception serving bs={bs} bf16 model+CRF — device time per call "
          f"({steps} calls traced)")
    import xplane as xp
    xp.print_table(per_step, total_label="TOTAL")
    print(f"  => {bs / (tot / 1e3):.1f} img/s/chip of pure device op time")
    for region in [r for r, _ in RULES] + ["crf+other"]:
        if region not in members:
            continue
        print(f"\ntop ops in '{region}':")
        tops = sorted(members[region].items(), key=lambda kv: -kv[1])
        for k, v in tops[:(25 if region == "crf+other" else top)]:
            print(f"  {v / steps:8.3f} ms  {k[:110]}")
    rec = {"metric": "xception_serving_region_ms",
           "bs": bs,
           "regions": {k: round(v, 3) for k, v in sorted(
               per_step.items(), key=lambda kv: -kv[1])},
           "total_ms": round(tot, 3),
           "device_img_s": round(bs / (tot / 1e3), 2)}
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof/xception"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    itemize(logdir, bs, steps)
