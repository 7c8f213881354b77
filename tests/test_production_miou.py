"""Plumbing test for tools/grade_production.py (the bench "miou" stage).

The real criterion run happens on TPU at 512x512 inside bench.py; this
pins the grading harness itself on CPU at a reduced size: both stacks
build, score with the published metric, and the record carries the fields
the bench stage emits.  On CPU the "mixed" production policy is bit-close
to f32 (see tests/test_mixed_policy.py), so the measured delta reduces to
the CRF-quadrature term — bounded loosely here (the tight <=0.1 pt
criterion is asserted against TPU numbers in BENCH_r*.json).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.slow
def test_grade_production_record():
    from grade_production import grade
    rec = grade(size=(128, 128), batch=4)
    for key in ("miou_published_parity", "miou_published_production",
                "delta_published_pt", "miou_std_parity",
                "miou_std_production", "delta_std_pt", "images",
                "production_policy"):
        assert key in rec, key
    assert rec["images"] == 20
    assert 0.0 < rec["miou_published_parity"] <= 1.0
    assert 0.0 < rec["miou_published_production"] <= 1.0
    # loose sanity bound at CPU/128^2 (the criterion bound is on TPU/512^2):
    # the production stack may not collapse vs parity
    shortfall = max(-rec["delta_published_pt"], -rec["delta_std_pt"], 0.0)
    assert shortfall < 2.0, rec
