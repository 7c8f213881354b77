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
    # the fast SELECT split pins the harness; the criterion number comes
    # from the TPU bench on the held-out eval split (see below)
    rec = grade(size=(128, 128), batch=4, split="select")
    for key in ("miou_published_parity", "miou_published_production",
                "delta_published_pt", "ci95_delta_published_pt",
                "miou_std_parity", "miou_std_production", "delta_std_pt",
                "images", "split", "production_policy"):
        assert key in rec, key
    assert rec["images"] == 20 and rec["split"] == "select"
    assert 0.0 < rec["miou_published_parity"] <= 1.0
    assert 0.0 < rec["miou_published_production"] <= 1.0
    lo, hi = rec["ci95_delta_published_pt"]
    assert lo <= rec["delta_published_pt"] <= hi
    # loose sanity bound at CPU/128^2 (the criterion bound is on TPU/512^2):
    # the production stack may not collapse vs parity
    shortfall = max(-rec["delta_published_pt"], -rec["delta_std_pt"], 0.0)
    assert shortfall < 2.0, rec


def test_eval_split_committed():
    """The held-out grading set exists, is the documented size, and is
    position-disjoint from the 20-tile selection set (VERDICT r4 #7)."""
    from grade_production import DATA_EVAL, DATA_SELECT
    eval_names = sorted(os.listdir(
        os.path.join(DATA_EVAL, "JPEGImages", "train")))
    assert len(eval_names) == 64
    # every eval tile has a label
    for n in eval_names:
        assert os.path.exists(os.path.join(
            DATA_EVAL, "SegmentationClassAug", n.replace(".jpg", ".png")))
    # eval filenames encode (photo, y, x); selection tiles are tile%02d —
    # recompute the selection positions the way make_mini_voc does and
    # assert disjointness
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import re
    from make_mini_voc import TILE, _photos, _tiles  # noqa: F401
    import numpy as np
    photos = _photos()
    pos = []
    for pi, img in enumerate(photos):
        H, W = img.shape[:2]
        for y in range(0, H - TILE + 1, TILE):
            for x in range(0, W - TILE + 1, TILE):
                pos.append((pi, y, x))
    sel = {pos[i] for i in np.linspace(0, len(pos) - 1, 20).astype(int)}
    for n in eval_names:
        m = re.match(r"eval\d+_p(\d)y(\d+)x(\d+)\.jpg", n)
        assert m, n
        assert (int(m.group(1)), int(m.group(2)),
                int(m.group(3))) not in sel, n
