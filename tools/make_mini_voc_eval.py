"""Generate the HELD-OUT grading tile set (tests/data/mini_voc_eval).

VERDICT r4 #7: the production-stack mIoU grade was computed on the same
20 tiles `crf.PRODUCTION_CONFIG` was *selected* on (selection bias), with
no reported noise band.  This script cuts a disjoint evaluation set from
the same three license-clean photos (see tools/make_mini_voc.py):

- candidate positions: the stride-64 tile grid of every photo;
- the 20 selection-set positions (make_mini_voc's stride-128 grid,
  linspace-subsampled) are EXCLUDED exactly;
- 64 tiles are kept, deterministically spread over the remainder.

Labels use the IDENTICAL label function as the selection set: the k-means
color model is fit on the SELECTION tiles' pixels (the task definition,
frozen), then predicted + Gaussian-smoothed on the eval tiles.  Eval tiles
may spatially overlap *training* tiles (3 photos only) — that can flatter
absolute mIoU, but the grade is a parity-vs-production DELTA on identical
weights, which pixel overlap does not bias.  What mattered was breaking
the config-selection circularity, which the disjoint positions do.

Run from the repo root:  python tools/make_mini_voc_eval.py
Deterministic; consumed by tools/grade_production.py (split="eval").
"""

import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.make_mini_voc import (N_CLUSTERS, TILE, _photos,  # noqa: E402
                                 _tiles)

OUT = os.path.join(REPO, "tests", "data", "mini_voc_eval")
N_EVAL = 64
STRIDE = 64


def _eval_tiles(photos):
    """All stride-64 tiles minus the exact selection-set positions."""
    sel_keys = set()
    tiles_all = []
    for pi, img in enumerate(photos):
        H, W = img.shape[:2]
        for y in range(0, H - TILE + 1, TILE):
            for x in range(0, W - TILE + 1, TILE):
                tiles_all.append((pi, y, x))
    idx = np.linspace(0, len(tiles_all) - 1, 20).astype(int)
    for i in idx:
        sel_keys.add(tiles_all[i])

    cand = []
    for pi, img in enumerate(photos):
        H, W = img.shape[:2]
        for y in range(0, H - TILE + 1, STRIDE):
            for x in range(0, W - TILE + 1, STRIDE):
                if (pi, y, x) not in sel_keys:
                    cand.append((pi, y, x))
    keep = np.linspace(0, len(cand) - 1, N_EVAL).astype(int)
    return [(pi, y, x, photos[pi][y:y + TILE, x:x + TILE])
            for pi, y, x in (cand[i] for i in keep)]


def _label_model(photos):
    """The selection set's k-means color model (task definition, frozen)."""
    from sklearn.cluster import KMeans
    sel = _tiles(photos, n=20)
    px = np.concatenate([t.reshape(-1, 3) for t in sel]).astype(np.float32)
    km = KMeans(n_clusters=N_CLUSTERS, random_state=0, n_init=3).fit(px[::7])
    order = np.argsort(np.linalg.norm(
        km.cluster_centers_ - px.mean(0), axis=1))
    remap = np.empty(N_CLUSTERS, np.int64)
    remap[order] = np.arange(N_CLUSTERS)
    return km, remap


def _label(km, remap, tile):
    from scipy.ndimage import gaussian_filter
    raw = remap[km.predict(tile.reshape(-1, 3).astype(np.float32))]
    raw = raw.reshape(TILE, TILE)
    oh = np.stack([gaussian_filter((raw == c).astype(np.float32), 6.0)
                   for c in range(N_CLUSTERS)])
    return np.argmax(oh, axis=0).astype(np.uint8)


def main():
    img_dir = os.path.join(OUT, "JPEGImages", "train")
    lbl_dir = os.path.join(OUT, "SegmentationClassAug")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    photos = _photos()
    km, remap = _label_model(photos)
    from deeplab_tpu.viz import voc_palette
    pal = voc_palette().reshape(-1).tolist()
    for i, (pi, y, x, t) in enumerate(_eval_tiles(photos)):
        name = f"eval{i:02d}_p{pi}y{y:03d}x{x:03d}"
        Image.fromarray(t).save(os.path.join(img_dir, name + ".jpg"),
                                quality=92)
        p = Image.fromarray(_label(km, remap, t), mode="P")
        p.putpalette(pal)
        p.save(os.path.join(lbl_dir, name + ".png"))
    print(f"wrote {N_EVAL} eval tiles to {OUT}")


if __name__ == "__main__":
    main()
