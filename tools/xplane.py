"""Parse jax.profiler xplane traces into per-op / per-region tables.

The profiler (train/profiling.trace, bench BENCH_PROFILE=dir) writes
TensorBoard xplane protobufs; this module reads them back WITHOUT
TensorBoard so a profile can be itemized in CI or committed as a table
(tensorboard_plugin_profile's converters are incompatible with the
installed protobuf runtime; tensorflow's bundled tsl xplane_pb2 parses
fine).

Typical use (see tools/profile_train.py):

    space = load_xspace(newest_trace("/tmp/prof/train"))
    ops   = device_ops(space)          # [(hlo_name, jax_scope, dur_ps)]
    table = bucket(ops, RULES)         # region -> ms
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict


def newest_trace(logdir: str) -> str:
    """Newest .xplane.pb under ``logdir`` (profiler nests by host/run)."""
    hits = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    return max(hits, key=os.path.getmtime)


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space


def device_ops(space, plane_substr: str = "TPU"):
    """Flatten the device plane's op-level events.

    Returns [(event_name, scope, dur_ps, stats)] where ``scope`` is the
    framework (JAX name-stack) annotation when present — the key we bucket
    regions by — and stats is the raw {stat_name: value} dict.
    Only lines named like op streams ("XLA Ops") are read; module/step
    lines would double-count their children.
    """
    out = []
    for plane in space.planes:
        if plane_substr not in plane.name:
            continue
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "Ops" not in line.name:      # "XLA Modules", "Steps", ...
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                stats = {}
                for st in ev.stats:
                    key = stat_names.get(st.metadata_id, str(st.metadata_id))
                    val = (st.str_value or st.int64_value or
                           st.uint64_value or st.double_value)
                    stats[key] = val
                scope = stats.get("tf_op") or stats.get("name") or ""
                out.append((md.name, str(scope), int(ev.duration_ps), stats))
    return out


def bucket(ops, rules, default="other"):
    """Aggregate op durations into named regions.

    ``rules``: ordered [(region, predicate(hlo_name, scope))]; first match
    wins.  Returns ({region: ms}, {region: [top ops]}) with ops sorted by
    time within each region.
    """
    totals = defaultdict(float)
    members = defaultdict(lambda: defaultdict(float))
    for name, scope, dur_ps, _ in ops:
        ms = dur_ps / 1e9
        for region, pred in rules:
            if pred(name, scope):
                break
        else:
            region = default
        totals[region] += ms
        members[region][f"{name} [{scope}]" if scope else name] += ms
    tops = {r: sorted(m.items(), key=lambda kv: -kv[1]) for r, m in
            members.items()}
    return dict(totals), tops


def print_table(totals, total_label="total", file=None):
    tot = sum(totals.values())
    width = max((len(k) for k in totals), default=10)
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<{width}}  {v:8.3f} ms  {100 * v / tot:5.1f}%",
              file=file)
    print(f"  {total_label:<{width}}  {tot:8.3f} ms", file=file)
    return tot
