"""Metrics with the reference's exact semantics (utils.py:132-157).

- ``sparse_accuracy_ignoring_last_label``: pixel accuracy over non-void pixels.
- ``Jaccard``: per-class IoU over flattened pixels, where each class's IoU is
  averaged only over batch items that contain the class (``legal_batches``,
  utils.py:148) and classes present in no batch item are dropped (NaN filter,
  utils.py:155-156).  The loop includes background (utils.py:143).
- ``confusion_matrix`` / ``calculate_iou``: the dataset-level evaluation the
  notebook runs per-pixel in Python (cell 10) — here one vectorized bincount
  on device, including the reference's ``conf_m[l-1, p-1]`` index shift.
"""

from __future__ import annotations

import jax.numpy as jnp


def sparse_accuracy_ignoring_last_label(y_true, y_pred):
    """y_true: (B, N, 1); y_pred: (B, N, C) probs/logits."""
    nb_classes = y_pred.shape[-1]
    pred = jnp.argmax(y_pred.reshape(-1, nb_classes), axis=-1)
    return accuracy_from_ids(y_true.reshape(-1), pred, nb_classes)


def accuracy_from_ids(labels, pred, nb_classes: int):
    """Masked pixel accuracy from flat label/prediction id arrays (the
    post-argmax core of :func:`sparse_accuracy_ignoring_last_label` —
    lets callers that already hold hard predictions skip the probs)."""
    correct, legal = accuracy_sums_from_ids(labels, pred, nb_classes)
    return correct / jnp.maximum(legal, 1.0)


def accuracy_sums_from_ids(labels, pred, nb_classes: int):
    """(correct_count, legal_count) partial sums of the masked accuracy.
    Sums over disjoint batch shards add exactly, so a data-parallel step
    can psum these across devices and recover the global accuracy."""
    labels = labels.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    legal = labels != nb_classes
    correct = jnp.sum((legal & (labels == pred)).astype(jnp.float32))
    return correct, jnp.sum(legal.astype(jnp.float32))


def Jaccard(y_true, y_pred):
    """Mean IoU with legal-batch semantics (utils.py:139-157)."""
    nb_classes = y_pred.shape[-1]
    labels = y_true[..., 0].astype(jnp.int32)              # (B, N)
    pred = jnp.argmax(y_pred, axis=-1).astype(jnp.int32)   # (B, N)
    return jaccard_from_ids(labels, pred, nb_classes)


def jaccard_from_ids(labels, pred, nb_classes: int):
    """Mean IoU from per-pixel id maps; labels/pred: (B, N) ints."""
    iou_sum, n_legal = jaccard_sums_from_ids(labels, pred, nb_classes)
    return jaccard_from_sums(iou_sum, n_legal)


def jaccard_sums_from_ids(labels, pred, nb_classes: int):
    """Per-class (iou_sum, legal_count) partial sums of the Jaccard.

    Both are sums over batch ITEMS (each item's IoU is intra-item), so the
    legal-batch semantics survive batch sharding exactly: a data-parallel
    step psums the pair across devices and finishes with
    :func:`jaccard_from_sums` to recover the global-batch metric."""
    labels = labels.astype(jnp.int32)
    pred = pred.astype(jnp.int32)
    class_ids = jnp.arange(nb_classes)
    true_oh = labels[..., None] == class_ids               # (B, N, C)
    pred_oh = pred[..., None] == class_ids

    inter = jnp.sum(true_oh & pred_oh, axis=1).astype(jnp.float32)  # (B, C)
    union = jnp.sum(true_oh | pred_oh, axis=1).astype(jnp.float32)
    legal = jnp.sum(true_oh, axis=1) > 0                   # (B, C)

    ious = inter / jnp.maximum(union, 1.0)
    n_legal = jnp.sum(legal.astype(jnp.float32), axis=0)   # (C,)
    return jnp.sum(jnp.where(legal, ious, 0.0), axis=0), n_legal


def jaccard_from_sums(iou_sum, n_legal):
    """Finish a (possibly psum-reduced) :func:`jaccard_sums_from_ids` pair:
    average per-class over legal items, NaN-drop classes in no item."""
    class_iou = iou_sum / jnp.maximum(n_legal, 1.0)
    valid = n_legal > 0
    return jnp.sum(jnp.where(valid, class_iou, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)


def confusion_matrix(labels, preds, n_classes: int, ref_shift: bool = False):
    """Dataset confusion matrix as one device-side bincount.

    ``ref_shift=True`` reproduces the notebook cell-10 quirk
    ``conf_m[l-1, p-1] += 1`` (labels 0 wrap to the last row/col).
    Void pixels (label == n_classes) are excluded, matching the notebook's
    filtering of flattened labels.
    """
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    keep = labels < n_classes
    l = labels
    p = preds
    if ref_shift:
        l = (l - 1) % n_classes
        p = (p - 1) % n_classes
    idx = l * n_classes + p
    counts = jnp.bincount(jnp.where(keep, idx, n_classes * n_classes),
                          length=n_classes * n_classes + 1)[:-1]
    return counts.reshape(n_classes, n_classes)


def iou_from_confusion(conf_m):
    """Per-class IoU = diag / (rowsum + colsum - diag) (notebook cell 10)."""
    conf_m = conf_m.astype(jnp.float32)
    diag = jnp.diagonal(conf_m)
    denom = conf_m.sum(axis=1) + conf_m.sum(axis=0) - diag
    return diag / jnp.maximum(denom, 1.0)


def mean_iou_published(conf_m):
    """The reference's published "Mean IOU": mean of the row-normalized
    confusion-matrix diagonal (notebook cell 11 / examples/iou.JPG)."""
    conf_m = conf_m.astype(jnp.float32)
    row = conf_m / jnp.maximum(conf_m.sum(axis=1, keepdims=True), 1.0)
    return jnp.mean(jnp.diagonal(row))
