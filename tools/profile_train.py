"""Itemize the full bf16 train step into per-region device-time buckets.

VERDICT r3 task 4 / r4 #5: the claim "~half the step is non-block ops"
must be a measured table, not an assertion.  This itemizes the EXACT
bench "train" stage program (Trainer._build_steps, bs=96, bf16, 1-device
mesh — see bench.py) from a jax.profiler xplane trace.

How attribution works: the TPU trace's "XLA Ops" line carries HLO
*instruction* names only (no framework scopes), so this tool ALSO lowers
and compiles the same train step abstractly (ShapeDtypeStructs — no
device arrays, and the persistent .jax_cache makes it instant when bench
just compiled it) and parses each instruction's ``metadata={op_name=...}``
from the optimized HLO text.  op_name carries the jax.named_scope region
labels the model emits (models/mobilenetv2.py: stem/mbNNsS,
deeplabv3p.py: aspp/head, train/trainer.py: loss/optimizer/step_metrics)
plus autodiff markers (``transpose(jvp(...))`` = backward), so joining
trace durations with op_names by instruction name gives per-region
device-time totals with a fwd/bwd split.

Usage (repo root, TPU):

  # 1. capture a trace of the bench train stage (3 traced steps)
  BENCH_PROFILE=/tmp/prof BENCH_STAGES=train python bench.py
  # 2. itemize it
  python tools/profile_train.py /tmp/prof/train

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
N_PX = SZ[0] * SZ[1]

# stride-2 blocks from models/mobilenetv2.BLOCK_TABLE (ids 1 and 3)
_STRIDE2 = ("mb01s2", "mb03s2")

# ordered first-match-wins region rules over the op_name scope string
RULES = [
    ("stem", lambda s: "stem" in s),
    ("stride2_blocks", lambda s: any(t in s for t in _STRIDE2)),
    ("mb_blocks", lambda s: re.search(r"mb\d{2}s\d", s) is not None),
    ("aspp", lambda s: "aspp" in s),
    ("head", lambda s: "head" in s),
    ("loss", lambda s: "loss" in s),
    ("optimizer", lambda s: "optimizer" in s),
    ("step_metrics", lambda s: "step_metrics" in s),
]

_METADATA_RE = re.compile(r'%([\w.\-]+) = .*op_name="([^"]+)"')


def opname_map(bs: int = 96):
    """{hlo_instruction_name: op_name} for the bench train step.

    Lower+compile with CONCRETE arrays exactly like the bench stage so
    the persistent .jax_cache entry bench just wrote is hit (abstract
    ShapeDtypeStruct lowering takes the axon AOT "chipless" compile path,
    which both misses that cache and is flaky here).  Nothing executes —
    compile only."""
    import jax
    import jax.numpy as jnp
    from deeplab_tpu.models.seg_model import SegNet
    from deeplab_tpu.parallel.mesh import get_mesh
    from deeplab_tpu.train.trainer import Trainer

    model = SegNet(SZ, 21, "mobilenetv2", "original")   # == bench.py:236
    params, state = model.init(jax.random.key(0))
    tr = Trainer(model, verbose=0, compute_dtype=jnp.bfloat16,
                 mesh=get_mesh(jax.devices()[:1]))
    train_jit, _, tx = tr._build_steps(frozenset())
    o = tx.init(params)

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(bs, SZ[0], SZ[1], 3) * 255, jnp.float32)
    Y = jnp.asarray(rng.randint(0, 21, (bs, N_PX, 1)), jnp.float32)
    SW = jnp.ones((bs, N_PX), jnp.float32)
    lr = jnp.float32(1.0)
    key = jax.random.key(0)
    compiled = train_jit.lower(params, state, o, lr, key, X, Y, SW).compile()
    out = {}
    for m in _METADATA_RE.finditer(compiled.as_text()):
        out[m.group(1)] = m.group(2)
    return out


def itemize(logdir: str, bs: int = 96, steps: int = 3, top: int = 8):
    import xplane

    names = opname_map(bs)
    space = xplane.load_xspace(xplane.newest_trace(logdir))

    totals, members = {}, {}
    fwd = bwd = other_t = 0.0
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
                    region = "other"
                totals[region] = totals.get(region, 0.0) + ms
                key = f"{instr} [{scope[-70:]}]" if scope else instr
                mem = members.setdefault(region, {})
                mem[key] = mem.get(key, 0.0) + ms
                if "transpose" in scope:
                    bwd += ms
                elif scope:
                    fwd += ms
                else:
                    other_t += ms

    per_step = {k: v / steps for k, v in totals.items()}
    tot = sum(per_step.values())
    matched = 1.0 - per_step.get("other", 0.0) / max(tot, 1e-9)

    print(f"train step bs={bs} bf16 — device time per step "
          f"({steps} steps traced; {matched:.0%} of time scope-matched)")
    import xplane as xp
    xp.print_table(per_step, total_label="TOTAL")
    print(f"  fwd-scoped {fwd / steps:8.3f} ms   "
          f"bwd-scoped(transpose) {bwd / steps:8.3f} ms   "
          f"unscoped {other_t / steps:8.3f} ms")
    print(f"  => {bs / (tot / 1e3):.1f} img/s/chip of pure device op time")
    for region in ("other", "mb_blocks", "optimizer"):
        print(f"\ntop ops in '{region}':")
        tops = sorted(members.get(region, {}).items(), key=lambda kv: -kv[1])
        for k, v in tops[:top]:
            print(f"  {v / steps:8.3f} ms  {k[:110]}")
    rec = {"metric": "train_step_region_ms",
           "bs": bs,
           "regions": {k: round(v, 3) for k, v in sorted(
               per_step.items(), key=lambda kv: -kv[1])},
           "total_ms": round(tot, 3),
           "device_img_s": round(bs / (tot / 1e3), 2)}
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof/train"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    itemize(logdir, bs, steps)
