"""Loss/metric semantics incl. void masking and legal_batches (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from deeplab_tpu.losses import (masked_sparse_ce,
                                sparse_crossentropy_ignoring_last_label,
                                weighted_loss)
from deeplab_tpu.metrics import (Jaccard, confusion_matrix,
                                 iou_from_confusion, mean_iou_published,
                                 sparse_accuracy_ignoring_last_label)


def _softmaxed(rng, b, n, c):
    logits = rng.randn(b, n, c).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_void_pixels_zero_loss():
    rng = np.random.RandomState(0)
    c = 4
    pred = _softmaxed(rng, 2, 10, c)
    y = np.full((2, 10, 1), c, np.float32)  # all void (label == n_classes)
    loss = sparse_crossentropy_ignoring_last_label(jnp.asarray(y),
                                                   jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(loss), 0.0)


def test_ce_matches_manual():
    rng = np.random.RandomState(1)
    c = 5
    pred = _softmaxed(rng, 1, 6, c)
    y = np.array([[0, 1, 2, 3, 4, 5]], np.float32)[..., None]  # last is void
    loss = np.asarray(sparse_crossentropy_ignoring_last_label(
        jnp.asarray(y), jnp.asarray(pred)))
    for i in range(5):
        np.testing.assert_allclose(loss[0, i], -np.log(pred[0, i, i]),
                                   rtol=1e-4)
    assert loss[0, 5] == 0.0


def test_weighted_loss_keras_semantics():
    loss = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    sw = jnp.asarray([[1.0, 0.0, 2.0, 0.0]])
    # sum(loss*sw)/count_nonzero = (1 + 6) / 2
    np.testing.assert_allclose(float(weighted_loss(loss, sw)), 3.5)


def test_masked_ce_with_weights():
    rng = np.random.RandomState(2)
    pred = _softmaxed(rng, 1, 4, 3)
    y = np.array([[0, 1, 2, 3]], np.float32)[..., None]
    sw = np.array([[1.0, 1.0, 1.0, 0.0]], np.float32)
    got = float(masked_sparse_ce(jnp.asarray(y), jnp.asarray(pred),
                                 jnp.asarray(sw)))
    expect = -np.mean([np.log(pred[0, i, i]) for i in range(3)])
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_accuracy_ignores_void():
    c = 3
    pred = np.zeros((1, 4, c), np.float32)
    pred[0, :, 1] = 1.0  # predict class 1 everywhere
    y = np.array([[1, 1, 0, c]], np.float32)[..., None]  # last is void
    acc = float(sparse_accuracy_ignoring_last_label(jnp.asarray(y),
                                                    jnp.asarray(pred)))
    np.testing.assert_allclose(acc, 2.0 / 3.0, rtol=1e-6)


def test_jaccard_perfect_prediction():
    c = 4
    y = np.array([[0, 1, 2, 2, 1, 0]], np.float32)[..., None]
    pred = np.eye(c, dtype=np.float32)[y[..., 0].astype(int)]
    assert float(Jaccard(jnp.asarray(y), jnp.asarray(pred))) == 1.0


def test_jaccard_legal_batches():
    # class 2 appears only in batch item 0; its IoU must be averaged only
    # over that item (utils.py:148).
    c = 3
    y = np.zeros((2, 8, 1), np.float32)
    y[0, :4, 0] = 2
    pred_lbl = np.zeros((2, 8), int)
    pred_lbl[0, :2] = 2       # item 0: inter 2, union 4 for class 2
    pred_lbl[1, :4] = 2       # item 1 has NO true class 2 -> illegal for cls 2
    pred = np.eye(c, dtype=np.float32)[pred_lbl]
    got = float(Jaccard(jnp.asarray(y), jnp.asarray(pred)))
    # class 0: item0 inter 4 (positions 4..8 overlap? compute):
    # item0 true0 = positions 4..7 (4 px), pred0 = positions 2..7 (6 px)
    #   inter 4, union 6 -> 4/6 ; item1 true0 = all 8, pred0 = 4..7 + 0..3?
    #   pred_lbl[1,:4]=2 so pred0 = positions 4..7 -> inter 4, union 8 -> .5
    # class 0 iou = (4/6 + 4/8)/2 ; class 2 iou = 2/4 (item 0 only)
    expect = np.mean([(4 / 6 + 4 / 8) / 2, 2 / 4])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_confusion_matrix_and_iou():
    n = 3
    labels = jnp.asarray([0, 0, 1, 1, 2, 2, 3])  # 3 == void, excluded
    preds = jnp.asarray([0, 1, 1, 1, 2, 0, 0])
    cm = np.asarray(confusion_matrix(labels, preds, n))
    expect = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 1]])
    np.testing.assert_array_equal(cm, expect)
    iou = np.asarray(iou_from_confusion(jnp.asarray(cm)))
    np.testing.assert_allclose(iou, [1 / 3, 2 / 3, 1 / 2], rtol=1e-6)
    mi = float(mean_iou_published(jnp.asarray(cm)))
    np.testing.assert_allclose(mi, np.mean([1 / 2, 1.0, 1 / 2]), rtol=1e-6)


def test_confusion_matrix_ref_shift_quirk():
    # notebook cell 10: conf_m[l-1, p-1] — label 0 wraps to the last index.
    n = 3
    labels = jnp.asarray([0, 1])
    preds = jnp.asarray([0, 1])
    cm = np.asarray(confusion_matrix(labels, preds, n, ref_shift=True))
    expect = np.zeros((3, 3), int)
    expect[2, 2] = 1  # label 0 -> index -1 -> 2
    expect[0, 0] = 1  # label 1 -> index 0
    np.testing.assert_array_equal(cm, expect)
