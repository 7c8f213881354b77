"""Losses with the reference's void-masking semantics (utils.py:127-130).

``sparse_crossentropy_ignoring_last_label``: labels in [0, n_classes] where
``n_classes`` is the void label; one-hot to n+1 classes and drop the last
column, so void pixels contribute exactly zero CE.  Combined at training time
with per-pixel "temporal" sample weights (Keras ``sample_weight_mode=
'temporal'``; notebook cell 2): the effective scalar is
``sum(loss * sw) / count_nonzero(sw)`` (Keras weighted-objective semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7  # Keras backend epsilon


def sparse_crossentropy_ignoring_last_label(y_true, y_pred):
    """Per-pixel CE. y_true: (B, N, 1) float/int labels; y_pred: (B, N, C) probs."""
    nb_classes = y_pred.shape[-1]
    labels = y_true[..., 0].astype(jnp.int32)
    one_hot = jnp.eye(nb_classes + 1, dtype=y_pred.dtype)[labels][..., :-1]
    pred = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    return -jnp.sum(one_hot * jnp.log(pred), axis=-1)


def weighted_loss(per_px_loss, sample_weights):
    """Keras temporal-sample-weight reduction: mean over nonzero-weight pixels
    of (loss * weight)."""
    num = jnp.sum(per_px_loss * sample_weights)
    den = jnp.sum((sample_weights != 0).astype(per_px_loss.dtype))
    return num / jnp.maximum(den, 1.0)


def masked_sparse_ce(y_true, y_pred, sample_weights=None):
    """Convenience: CE + optional temporal weighting in one call."""
    loss = sparse_crossentropy_ignoring_last_label(y_true, y_pred)
    if sample_weights is None:
        return jnp.mean(loss)
    return weighted_loss(loss, sample_weights)
