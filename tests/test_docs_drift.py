"""README quoted-number drift guard (VERDICT r4 #8).

README.md's performance table annotates every quoted number with a
machine-readable marker::

    <!-- bench-quote: {"metric": "...", "value": N, "unit": "..."} -->

bench.py's ``docs_drift_check`` compares the quotes against the SAME
run's measured values and emits a drift line into every BENCH_r*.json
tail, so doc/record divergence is captured mechanically on the day the
record is made.  This test keeps the mechanism itself honest: markers
must parse, name real bench metrics, and cover the headline claims.
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric names bench.py can emit (un-tagged, BACKBONE=mobilenetv2 default)
KNOWN_METRICS = {
    "512x512 VOC inference (model only) images/sec/chip",
    "512x512 VOC dense-CRF only (5 iters, throughput cfg) images/sec/chip",
    "512x512 VOC dense-CRF only (5 iters, fast-faithful cfg) images/sec/chip",
    "512x512 VOC dense-CRF only (5 iters, reference-faithful cfg) "
    "images/sec/chip",
    "512x512 VOC inference+CRF (fast-faithful cfg) images/sec/chip",
    "512x512 VOC inference+CRF (production stack, mixed+PRODUCTION_CONFIG) "
    "images/sec/chip",
    "512x512 VOC B=1 serving latency (model+CRF, device)",
    "512x512 VOC training images/sec/chip",
    "512x512 VOC fine-tune (frozen trunk) images/sec/chip",
    "512x512 VOC inference+CRF [xception] images/sec/chip",
    "512x512 VOC inference+CRF images/sec/chip",
    "production-vs-parity mIoU shortfall (mini_voc, published metric)",
}


def _quotes():
    sys.path.insert(0, REPO)
    import bench
    return bench.readme_quotes()


def test_readme_quotes_parse_and_name_real_metrics():
    quotes = _quotes()
    assert quotes, "README.md has no bench-quote markers"
    for q in quotes:
        assert set(q) >= {"metric", "value", "unit"}, q
        assert isinstance(q["value"], (int, float)), q
        assert q["metric"] in KNOWN_METRICS, (
            f"marker names unknown bench metric: {q['metric']!r}")


def test_readme_quotes_cover_headline_claims():
    metrics = {q["metric"] for q in _quotes()}
    # the four load-bearing README claims must be drift-guarded
    for required in [
        "512x512 VOC inference+CRF images/sec/chip",
        "512x512 VOC inference+CRF (production stack, "
        "mixed+PRODUCTION_CONFIG) images/sec/chip",
        "512x512 VOC B=1 serving latency (model+CRF, device)",
        "512x512 VOC training images/sec/chip",
    ]:
        assert required in metrics, f"README quote missing for {required!r}"


def test_quote_values_match_readme_prose():
    """The marker value must equal the number rendered in the same table
    row (quoted bold/plain), so the marker can't silently diverge from
    what the reader sees."""
    with open(os.path.join(REPO, "README.md")) as f:
        lines = f.read().splitlines()
    found = 0
    for ln in lines:
        for m in re.finditer(r"<!--\s*bench-quote:\s*(\{.*?\})\s*-->", ln):
            q = json.loads(m.group(1))
            val = q["value"]
            # the rendered number: int -> "507", float -> "3.09"
            s = f"{val:g}"
            assert s in ln.replace(",", ""), (
                f"marker value {s} not rendered in its row: {ln[:120]}")
            found += 1
    assert found >= 4
