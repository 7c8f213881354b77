"""Evaluation & visualization (reference utils.py:56-71 + notebook cells 8-11).

``plot_confusion_matrix`` mirrors the reference's row-normalized heatmap;
``mIOU`` and ``calculate_iou`` are the notebook's evaluation entry points with
the per-pixel Python loop replaced by one device-side bincount
(metrics.confusion_matrix), reproducing the published numbers including the
``conf_m[l-1, p-1]`` quirk.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

from deeplab_tpu.metrics import confusion_matrix as _confusion_matrix
from deeplab_tpu.metrics import iou_from_confusion, mean_iou_published


def plot_confusion_matrix(cm, classes, normalize=False,
                          title="Confusion matrix", cmap=None):
    """Reference utils.py:56-71 (matplotlib heatmap). Returns the (possibly
    normalized) matrix, like the reference."""
    import matplotlib.pyplot as plt
    cmap = cmap or plt.cm.Blues
    cm = np.asarray(cm)
    if normalize:
        cm = cm.astype("float") / cm.sum(axis=1)[:, np.newaxis]
    plt.imshow(cm, interpolation="nearest", cmap=cmap)
    plt.title(title, fontsize=11)
    tick_marks = np.arange(len(classes))
    plt.xticks(tick_marks, classes, rotation=90, fontsize=9)
    plt.yticks(tick_marks, classes, fontsize=9)
    thresh = cm.max() / 2.0
    for i, j in itertools.product(range(cm.shape[0]), range(cm.shape[1])):
        plt.text(j, i, np.round(cm[i, j], 2), horizontalalignment="center",
                 color="white" if cm[i, j] > thresh else "black", fontsize=7)
    plt.tight_layout()
    plt.ylabel("True label", fontsize=9)
    plt.xlabel("Predicted label", fontsize=9)
    return cm


def mIOU(gt: np.ndarray, preds: np.ndarray) -> float:
    """Per-image mean IoU over the labels present in gt (notebook cell 8)."""
    gt = np.asarray(gt)
    preds = np.asarray(preds)
    ulabels = np.unique(gt)
    iou = np.zeros(len(ulabels))
    for k, u in enumerate(ulabels):
        inter = np.sum((gt == u) & (preds == u))
        union = np.sum((gt == u) | (preds == u))
        iou[k] = inter / union if union else 0.0
    return float(np.round(iou.mean(), 2))


def calculate_iou(net, params, state, generator, nb_classes: int = 21,
                  ref_shift: bool = True, predict_fn=None):
    """Dataset-level confusion matrix (notebook cell 10), vectorized.

    ``ref_shift=True`` reproduces the notebook's ``conf_m[l-1, p-1]``
    indexing for the RETURNED matrix and the published mean (the shifted
    matrix is just a (-1, -1) roll of the standard one, so it is derived
    rather than re-accumulated).  The per-class IoU vector is ALWAYS in
    standard class order (iou[c] belongs to class c) — indexing it with the
    shifted matrix's order mislabels every class by one.
    ``predict_fn``: optional ``X -> (B, H*W) or (B, H, W) label ids``
    override of the plain forward-argmax — evaluate through a
    ``Predictor`` for TTA and/or CRF-refined numbers (beyond the
    reference's cell 10, which always evaluates the raw forward).
    Returns (conf_m, per-class IoU, published mean-IOU scalar).
    """
    import jax
    if predict_fn is None:
        fwd = jax.jit(lambda p, s, x: net.apply(p, s, x)[0])
        predict_fn = lambda X: jnp.argmax(
            fwd(params, state, jnp.asarray(X)), axis=-1)
    # host-side int64 accumulation: int32 diagonal cells wrap at ~2.1e9
    # pixels of one class (a few thousand high-res images)
    conf = np.zeros((nb_classes, nb_classes), np.int64)
    for i in range(len(generator)):
        X, Y, _ = generator[i]
        labels = jnp.asarray(Y[..., 0])
        preds = jnp.asarray(predict_fn(X)).reshape(labels.shape)
        conf += np.asarray(_confusion_matrix(labels, preds, nb_classes),
                           np.int64)
    conf_ref = np.roll(conf, (-1, -1), axis=(0, 1))    # the cell-10 quirk
    # cast to float on the HOST: jnp.asarray(int64) canonicalizes to int32
    # (x64 disabled), which would re-introduce the wrap the int64
    # accumulator exists to prevent
    iou = iou_from_confusion(jnp.asarray(conf.astype(np.float64)))
    mean_iou = mean_iou_published(jnp.asarray(conf_ref.astype(np.float64)))
    return (conf_ref if ref_shift else conf,
            np.asarray(iou), float(mean_iou))


# ---------------------------------------------------------- cell-9 figures --

def voc_palette(n: int = 256) -> np.ndarray:
    """The PASCAL VOC devkit color map ((n, 3) uint8) — the palette behind
    the reference's example figures (examples/exp1-4.JPG), generated with
    the devkit's bit-shuffle algorithm."""
    palette = np.zeros((n, 3), np.uint8)
    for i in range(n):
        lbl = i
        r = g = b = 0
        for j in range(8):
            r |= ((lbl >> 0) & 1) << (7 - j)
            g |= ((lbl >> 1) & 1) << (7 - j)
            b |= ((lbl >> 2) & 1) << (7 - j)
            lbl >>= 3
        palette[i] = (r, g, b)
    return palette


def colorize_mask(mask: np.ndarray, palette: np.ndarray = None) -> np.ndarray:
    """(H, W) int class-id mask -> (H, W, 3) uint8 VOC-colored image."""
    if palette is None:
        palette = voc_palette()
    return palette[np.asarray(mask).astype(np.int64) % len(palette)]


def plot_predictions(image_bgr, panels, path=None, figsize_per_panel=4):
    """Notebook cell-9 side-by-side figure: the input image followed by
    titled masks (e.g. GT / prediction / prediction + CRF), VOC-colorized.

    image_bgr: (H, W, 3) 0-255 BGR (the pipeline's image contract);
    panels: list of (title, mask) with (H, W) int masks.
    Writes a PNG (and closes the figure) when ``path`` is given; otherwise
    returns the open figure for interactive display — the caller owns it.
    """
    import matplotlib.pyplot as plt

    n = 1 + len(panels)
    fig, axes = plt.subplots(1, n, figsize=(figsize_per_panel * n,
                                            figsize_per_panel))
    axes = np.atleast_1d(axes)
    rgb = np.asarray(image_bgr).astype(np.uint8)[..., ::-1]
    axes[0].imshow(rgb)
    axes[0].set_title("image")
    for ax, (title, mask) in zip(axes[1:], panels):
        ax.imshow(colorize_mask(mask))
        ax.set_title(title)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    if path is not None:
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
    return fig
