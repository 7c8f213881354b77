"""Optimizer + layer-freeze policy.

Reference compile (notebook cell 2): ``Adam(lr=7e-4, epsilon=1e-8,
decay=1e-6)``.  Keras legacy ``decay`` is the per-step schedule
``lr_t = lr / (1 + decay * step)``.  Freeze policy (cell 5): when
fine-tuning pretrained weights, every layer *before* ``concat_projection``
in the graph is frozen; it and everything after stays trainable.

The Trainer applies a runtime ``lr_scale`` multiplier on top of the schedule
(ReduceLROnPlateau) and zeroes updates of frozen layers — both as pure
device-side ops inside the jitted step.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

def freeze_set(params, freeze_before: Optional[str] = "concat_projection",
               order=None) -> frozenset:
    """Layer names to freeze: everything before ``freeze_before`` in graph
    order (notebook cell 5 anchors at 'concat_projection'; it and everything
    after stays trainable).  ``freeze_before=None`` freezes nothing.

    ``order`` is the canonical layer creation order (``model.layer_order``,
    captured at init).  ALWAYS pass it when available: a freshly-initialized
    params dict preserves graph insertion order, but any tree that went
    through ``jax.tree.map``/``tree_unflatten`` (e.g. after a training run
    or a checkpoint restore) has its keys re-sorted alphabetically, and
    deriving "before" from those keys would silently freeze the wrong
    layers."""
    if freeze_before is None:
        return frozenset()
    names = list(order) if order is not None else list(params)
    if freeze_before not in names:
        raise ValueError(
            f"freeze_before layer {freeze_before!r} not found in the model "
            f"(known layers include e.g. {names[:3]}...)")
    return frozenset(names[:names.index(freeze_before)])


def keras_adam_schedule(lr: float = 7e-4, decay: float = 1e-6):
    def schedule(step):
        return lr / (1.0 + decay * step)
    return schedule


def make_optimizer(lr: float = 7e-4, epsilon: float = 1e-8,
                   decay: float = 1e-6) -> optax.GradientTransformation:
    """Keras-Adam-equivalent optax chain (bias-corrected Adam + legacy decay
    schedule)."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=epsilon),
        optax.scale_by_learning_rate(keras_adam_schedule(lr, decay)),
    )


def mask_frozen(updates, frozen: frozenset):
    """Zero parameter updates for frozen layers (device-side, jit-safe)."""
    if not frozen:
        return updates
    return {layer: (jax.tree.map(lambda u: u * 0, sub)
                    if layer in frozen else sub)
            for layer, sub in updates.items()}
