"""Generate the committed miniature real-photo VOC dataset (VERDICT r2 #4).

Real VOC is not available in this environment, so the convergence harness
(tests/test_real_data_convergence.py, examples/finetune_mini_voc.py) uses
real *photographs* from license-clean in-env sources:

- sklearn's sample images ``china.jpg`` and ``flower.jpg``
  (shipped with scikit-learn; creative-commons licensed sample data)
- matplotlib's ``grace_hopper.jpg`` (U.S. government photograph,
  public domain)

Each photo is cut into 128x128 tiles (20 total) laid out exactly like the
reference's dataset (utils.py:265-266): ``JPEGImages/train/*.jpg`` +
``SegmentationClassAug/*.png`` with class ids as palette indices.

Labels are an N_CLUSTERS-way (3) color clustering (k-means, fixed seed)
fit on ALL tile
pixels jointly, then spatially smoothed (Gaussian-blurred one-hot ->
argmax) so regions have object-like extent a stride-8 segmentation model
can actually represent.  The task is consistent across images, learnable
from photographs, and fully deterministic.  Label 0 is the cluster
closest to the global mean color ("background"-ish).

Run from the repo root:  python tools/make_mini_voc.py
"""

import os

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "mini_voc")
TILE = 128
N_CLUSTERS = 3


def _photos():
    from sklearn.datasets import load_sample_images
    import matplotlib
    imgs = [np.asarray(im, np.uint8) for im in load_sample_images().images]
    gh = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                      "sample_data", "grace_hopper.jpg")
    with Image.open(gh) as im:
        imgs.append(np.asarray(im.convert("RGB"), np.uint8))
    return imgs  # china (427x640), flower (427x640), grace_hopper (600x512)


def _tiles(photos, n=20):
    tiles = []
    for img in photos:
        H, W = img.shape[:2]
        for y in range(0, H - TILE + 1, TILE):
            for x in range(0, W - TILE + 1, TILE):
                tiles.append(img[y:y + TILE, x:x + TILE])
    # deterministic subsample spread across all photos
    idx = np.linspace(0, len(tiles) - 1, n).astype(int)
    return [tiles[i] for i in idx]


def _labels(tiles):
    from sklearn.cluster import KMeans
    px = np.concatenate([t.reshape(-1, 3) for t in tiles]).astype(np.float32)
    km = KMeans(n_clusters=N_CLUSTERS, random_state=0, n_init=3).fit(
        px[::7])  # subsample pixels for speed; deterministic stride
    # stable cluster ids: order by distance to the global mean color
    order = np.argsort(np.linalg.norm(
        km.cluster_centers_ - px.mean(0), axis=1))
    remap = np.empty(N_CLUSTERS, np.int64)
    remap[order] = np.arange(N_CLUSTERS)
    from scipy.ndimage import gaussian_filter
    out = []
    for t in tiles:
        raw = remap[km.predict(t.reshape(-1, 3).astype(np.float32))]
        raw = raw.reshape(TILE, TILE)
        # smooth: blur each cluster's indicator, take the argmax — regions
        # get object-like extent instead of per-pixel texture speckle
        oh = np.stack([gaussian_filter((raw == c).astype(np.float32), 6.0)
                       for c in range(N_CLUSTERS)])
        out.append(np.argmax(oh, axis=0).astype(np.uint8))
    return out


def main():
    img_dir = os.path.join(OUT, "JPEGImages", "train")
    lbl_dir = os.path.join(OUT, "SegmentationClassAug")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    tiles = _tiles(_photos())
    labels = _labels(tiles)
    # VOC-style palette so the label PNGs view correctly (class id = index)
    from deeplab_tpu.viz import voc_palette
    pal = voc_palette().reshape(-1).tolist()
    for i, (t, l) in enumerate(zip(tiles, labels)):
        Image.fromarray(t).save(os.path.join(img_dir, f"tile{i:02d}.jpg"),
                                quality=92)
        p = Image.fromarray(l, mode="P")
        p.putpalette(pal)
        p.save(os.path.join(lbl_dir, f"tile{i:02d}.png"))
    print(f"wrote {len(tiles)} tiles to {OUT}")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, REPO)
    main()
