"""Grade the production serving pipeline in the baseline's own mIoU units.

BASELINE.json's quality criterion is "mIoU within 0.1 pt" of the reference
pipeline.  The production serving path stacks three approximations — bf16
compute, fused Pallas MBConv serving blocks (TPU), and the throughput CRF
config (color_step=2.5, splat_stride=4) — whose per-stage agreements
(0.9943 argmax / 0.9962 MAP) do not compose into an mIoU bound.  This
script measures the composition directly: it runs BOTH stacks

  parity:      f32, XLA-only (fused kernels gate on bf16), reference-
               faithful CRF (color_step=1, splat_stride=1 — the exact
               pydensecrf parameter mirror of utils.py:78-86)
  production:  bf16, fused serving kernels (on TPU), throughput CRF

over the committed real-photo dataset (tests/data/mini_voc, 20 tiles) with
the committed trained weights (tests/data/mini_voc_trained.h5; see
tools/make_mini_voc_weights.py), scores each with the PUBLISHED metric
(the notebook cell-10/11 confusion-matrix mean, metrics.mean_iou_published,
including the conf_m[l-1, p-1] shift) plus standard mean-IoU, and reports
the delta in percentage points.  Referenced: reference notebook cells
10-11, /root/reference/README.md:34-38.

Run from the repo root:  python tools/grade_production.py
Used by bench.py (stage "miou") and tests/test_production_miou.py.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DATA = os.path.join(REPO, "tests", "data", "mini_voc")
WEIGHTS = os.path.join(REPO, "tests", "data", "mini_voc_trained.h5")
N_CLASSES = 3


def _load_tiles(size):
    """All 20 committed tiles as (images BGR f32, labels int32) at
    ``size`` (images bilinear, labels nearest — the generator's resize
    semantics, reference utils.py:322-327)."""
    from deeplab_tpu.data.generator import _imread_bgr, _imread_gray
    from deeplab_tpu.data.augment import resize_bilinear, resize_nearest

    img_dir = os.path.join(DATA, "JPEGImages", "train")
    lbl_dir = os.path.join(DATA, "SegmentationClassAug")
    names = sorted(os.listdir(img_dir))
    X, Y = [], []
    for n in names:
        im = _imread_bgr(os.path.join(img_dir, n))
        lb = _imread_gray(os.path.join(lbl_dir,
                                       n.replace(".jpg", ".png")))
        if (im.shape[0], im.shape[1]) != size:
            im = resize_bilinear(im, (size[1], size[0]))
            lb = resize_nearest(lb, (size[1], size[0]))
        X.append(im.astype(np.float32))
        Y.append(lb.astype(np.int32))
    return np.stack(X), np.stack(Y)


def _score(labels, preds, n_classes):
    """(published mean-IOU, standard mean-IoU) from dataset confusion."""
    import jax.numpy as jnp
    from deeplab_tpu.metrics import (confusion_matrix, iou_from_confusion,
                                     mean_iou_published)
    conf = np.zeros((n_classes, n_classes), np.int64)
    conf += np.asarray(confusion_matrix(jnp.asarray(labels),
                                        jnp.asarray(preds), n_classes),
                       np.int64)
    conf_ref = np.roll(conf, (-1, -1), axis=(0, 1))   # the cell-10 quirk
    pub = float(mean_iou_published(jnp.asarray(conf_ref.astype(np.float64))))
    std = float(np.nanmean(np.asarray(
        iou_from_confusion(jnp.asarray(conf.astype(np.float64))))))
    return pub, std


def grade(size=(512, 512), batch=4, weights=WEIGHTS):
    """Run both stacks; returns the record dict (see module docstring)."""
    import jax.numpy as jnp
    from deeplab_tpu.crf import CrfConfig
    from deeplab_tpu.models.seg_model import SegNet
    from deeplab_tpu.params import load_keras_h5
    from deeplab_tpu.predictor import Predictor

    net = SegNet(size, N_CLASSES, "mobilenetv2", "original")
    import jax
    params, state = net.init(jax.random.key(0))
    params, state = load_keras_h5(weights, params, state, strict=True)

    X, Y = _load_tiles(size)
    parity = Predictor(net, params, state, crf=CrfConfig(),
                       compute_dtype=jnp.float32)
    production = Predictor(net, params, state,
                           crf=CrfConfig(color_step=2.5, splat_stride=4),
                           compute_dtype=jnp.bfloat16)

    outs = {}
    for name, pred in (("parity", parity), ("production", production)):
        masks = np.concatenate([pred(X[i:i + batch])
                                for i in range(0, len(X), batch)])
        outs[name] = _score(Y, masks, N_CLASSES)

    (pub_par, std_par), (pub_pro, std_pro) = outs["parity"], outs["production"]
    from deeplab_tpu.kernels.fused_mbconv import pallas_available
    return {
        "miou_published_parity": round(pub_par, 4),
        "miou_published_production": round(pub_pro, 4),
        "delta_published_pt": round((pub_pro - pub_par) * 100.0, 3),
        "miou_std_parity": round(std_par, 4),
        "miou_std_production": round(std_pro, 4),
        "delta_std_pt": round((std_pro - std_par) * 100.0, 3),
        "images": int(len(X)),
        "size": f"{size[0]}x{size[1]}",
        "fused_kernels": bool(pallas_available()),
    }


if __name__ == "__main__":
    rec = grade()
    print(json.dumps(rec))
    worst = max(abs(rec["delta_published_pt"]), abs(rec["delta_std_pt"]))
    print(f"production-vs-parity mIoU delta: {worst:.3f} pt "
          f"({'MEETS' if worst <= 0.1 else 'MISSES'} the 0.1 pt criterion)")
