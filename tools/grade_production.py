"""Grade the production serving pipeline in the baseline's own mIoU units.

BASELINE.json's quality criterion is "mIoU within 0.1 pt" of the reference
pipeline.  Per-stage agreements (argmax / MAP golden numbers) do not
compose into an mIoU bound, so this script measures the composition
directly: it runs BOTH stacks

  parity:      f32 (HIGHEST precision), XLA-only, reference-faithful CRF
               (color_step=1, splat_stride=1 — the exact pydensecrf
               parameter mirror of utils.py:78-86)
  production:  the shipping serving defaults — "mixed" model policy (f32
               activations, single-pass bf16 MXU convs; core.Ctx.mxu_bf16,
               fused Pallas blocks on TPU) + crf.PRODUCTION_CONFIG

over committed real-photo tiles with the committed trained weights
(tests/data/mini_voc_trained.h5; see tools/make_mini_voc_weights.py),
scores each with the PUBLISHED metric (the notebook cell-10/11
confusion-matrix mean, metrics.mean_iou_published, including the
conf_m[l-1, p-1] shift) plus standard mean-IoU, and reports the delta in
percentage points with a bootstrap 95% CI over images.  Referenced:
reference notebook cells 10-11, /root/reference/README.md:34-38.

Two tile sets (VERDICT r4 #7 — selection/grading split):

  split="select"  tests/data/mini_voc, 20 tiles.  The set historic CRF
                  configs (incl. PRODUCTION_CONFIG) were chosen on; use it
                  ONLY to choose configs.
  split="eval"    tests/data/mini_voc_eval, 64 held-out tiles at disjoint
                  positions (tools/make_mini_voc_eval.py).  The grading
                  set — the criterion number reported by bench stage
                  "miou" comes from here, so the grade is not
                  selection-biased.

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

DATA_SELECT = os.path.join(REPO, "tests", "data", "mini_voc")
DATA_EVAL = os.path.join(REPO, "tests", "data", "mini_voc_eval")
WEIGHTS = os.path.join(REPO, "tests", "data", "mini_voc_trained.h5")
N_CLASSES = 3


def _load_tiles(size, data=DATA_SELECT):
    """All committed tiles under ``data`` as (images BGR f32, labels int32)
    at ``size`` (images bilinear, labels nearest — the generator's resize
    semantics, reference utils.py:322-327)."""
    from deeplab_tpu.data.generator import _imread_bgr, _imread_gray
    from deeplab_tpu.data.augment import resize_bilinear, resize_nearest

    img_dir = os.path.join(data, "JPEGImages", "train")
    lbl_dir = os.path.join(data, "SegmentationClassAug")
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


def _per_image_conf(labels, preds, n_classes):
    """(N, n, n) int64 per-image confusion matrices (void excluded)."""
    out = np.zeros((len(labels), n_classes, n_classes), np.int64)
    for i, (l, p) in enumerate(zip(labels, preds)):
        l = l.reshape(-1)
        p = p.reshape(-1)
        keep = l < n_classes
        idx = l[keep] * n_classes + p[keep]
        out[i] = np.bincount(idx, minlength=n_classes * n_classes).reshape(
            n_classes, n_classes)
    return out


def _published(conf):
    """The notebook cell-10/11 metric from a summed confusion matrix:
    roll by (-1, -1) (the conf_m[l-1, p-1] quirk), row-normalize, mean of
    the diagonal.  Pure numpy twin of metrics.mean_iou_published."""
    c = np.roll(conf, (-1, -1), axis=(0, 1)).astype(np.float64)
    row = c / np.maximum(c.sum(axis=1, keepdims=True), 1.0)
    return float(np.mean(np.diagonal(row)))


def _std_miou(conf):
    c = conf.astype(np.float64)
    diag = np.diagonal(c)
    denom = c.sum(axis=1) + c.sum(axis=0) - diag
    return float(np.nanmean(diag / np.maximum(denom, 1.0)))


def _bootstrap_ci(conf_par, conf_pro, n_boot=2000, seed=0):
    """95% CI of (published_production - published_parity) in points,
    bootstrap-resampling IMAGES (both stacks see the same resample — the
    delta's across-image correlation is preserved)."""
    rng = np.random.RandomState(seed)
    n = len(conf_par)
    deltas = np.empty(n_boot)
    for b in range(n_boot):
        idx = rng.randint(0, n, n)
        deltas[b] = (_published(conf_pro[idx].sum(0))
                     - _published(conf_par[idx].sum(0))) * 100.0
    lo, hi = np.percentile(deltas, [2.5, 97.5])
    return round(float(lo), 3), round(float(hi), 3)


def grade(size=(512, 512), batch=8, weights=WEIGHTS, split="eval",
          production_crf=None, production_dtype="mixed"):
    """Run both stacks over the ``split`` tiles; returns the record dict.

    ``production_crf``/``production_dtype`` override the production stack —
    for config-selection experiments on split="select" ONLY (grading a
    config on the tiles it was chosen on is the bias this split removes).
    """
    import jax
    import jax.numpy as jnp
    from deeplab_tpu.crf import CrfConfig, PRODUCTION_CONFIG
    from deeplab_tpu.models.seg_model import SegNet
    from deeplab_tpu.params import load_keras_h5
    from deeplab_tpu.predictor import Predictor

    data = DATA_EVAL if split == "eval" else DATA_SELECT
    net = SegNet(size, N_CLASSES, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    params, state = load_keras_h5(weights, params, state, strict=True)

    X, Y = _load_tiles(size, data)
    crf_pro = PRODUCTION_CONFIG if production_crf is None else production_crf
    parity = Predictor(net, params, state, crf=CrfConfig(),
                       compute_dtype=jnp.float32)
    production = Predictor(net, params, state, crf=crf_pro,
                           compute_dtype=production_dtype)

    outs = {}
    for name, pred in (("parity", parity), ("production", production)):
        masks = np.concatenate([pred(X[i:i + batch])
                                for i in range(0, len(X), batch)])
        outs[name] = _per_image_conf(Y, masks, N_CLASSES)

    conf_par, conf_pro = outs["parity"], outs["production"]
    pub_par, pub_pro = _published(conf_par.sum(0)), _published(conf_pro.sum(0))
    std_par, std_pro = _std_miou(conf_par.sum(0)), _std_miou(conf_pro.sum(0))
    lo, hi = _bootstrap_ci(conf_par, conf_pro)
    from deeplab_tpu.kernels.fused_mbconv import pallas_available
    return {
        "miou_published_parity": round(pub_par, 4),
        "miou_published_production": round(pub_pro, 4),
        "delta_published_pt": round((pub_pro - pub_par) * 100.0, 3),
        "ci95_delta_published_pt": [lo, hi],
        "miou_std_parity": round(std_par, 4),
        "miou_std_production": round(std_pro, 4),
        "delta_std_pt": round((std_pro - std_par) * 100.0, 3),
        "images": int(len(X)),
        "split": split,
        "size": f"{size[0]}x{size[1]}",
        "production_policy": ("mixed+" + _crf_tag(crf_pro)
                              if production_dtype == "mixed"
                              else str(production_dtype)),
        "fused_kernels_available": bool(pallas_available()),
    }


def _crf_tag(cfg):
    tag = f"cs{cfg.color_step:g}{cfg.color_taps}"
    if cfg.splat_stride > 1:
        tag += f"st{cfg.splat_stride}"
    return tag


if __name__ == "__main__":
    split = sys.argv[1] if len(sys.argv) > 1 else "eval"
    rec = grade(split=split)
    print(json.dumps(rec))
    # the criterion is a quality FLOOR: production may not score more than
    # 0.1 pt BELOW parity (a positive delta is production >= parity)
    shortfall = max(-rec["delta_published_pt"], -rec["delta_std_pt"], 0.0)
    print(f"production-vs-parity mIoU shortfall: {shortfall:.3f} pt "
          f"({'MEETS' if shortfall <= 0.1 else 'MISSES'} the 0.1 pt criterion)")
