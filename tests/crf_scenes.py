"""Deterministic structured scenes for CRF golden tests (shared by
tools/make_crf_goldens.py and tests/test_crf_goldens.py).

Each scene is a (image f32 0-255, mask int64) pair with smooth color
regions, colored blobs and speckle label noise — the input class the
reference's CRF post-processing sees (utils.py:74-91)."""

import numpy as np


def make_scene(H, W, n_labels, seed, n_blobs=None, speckle=0.06):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    im = np.stack([120 + 80 * np.sin(yy / 25 + seed),
                   100 + 60 * np.cos(xx / 19),
                   90 + 50 * np.sin((xx + yy) / 33)], -1)
    mask = np.zeros((H, W), np.int64)
    n_blobs = n_blobs if n_blobs is not None else max(n_labels // 2, 3)
    for k in range(1, n_blobs + 1):
        cy = rng.randint(H // 8, H - H // 8)
        cx = rng.randint(W // 8, W - W // 8)
        r = rng.randint(min(H, W) // 10, min(H, W) // 4)
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        mask[blob] = k % n_labels
        im[blob] = im[blob] * 0.3 + rng.randint(0, 255, 3) * 0.7
    sp = rng.rand(H, W) < speckle
    mask[sp] = rng.randint(0, n_labels, int(sp.sum()))
    im = np.clip(im + rng.randn(H, W, 3) * 6, 0, 255).astype(np.float32)
    return im, mask


# (name, H, W, n_labels, seed) — 21-label VOC-like cases incl. a 128x128
# and a wide 64x256 (exercises the anisotropic x cells of the TPU path)
SCENES = [
    ("s48_5l", 48, 48, 5, 0),
    ("s96_21l", 96, 96, 21, 3),
    ("s128_21l", 128, 128, 21, 5),
    ("s80x120_11l", 80, 120, 11, 7),
    ("s64x256_21l", 64, 256, 21, 9),
]
