"""Full train-state checkpointing (params + BN state + optimizer + schedule).

The reference checkpoints weights only (ModelCheckpoint h5, notebook cell 5) —
resume restarts Adam from scratch (SURVEY.md §5.4).  Here, preemption-safe
resume: the whole training state round-trips through one .npz (portable,
no format churn), with the Keras h5 export still available for weight
interop (params.save_keras_h5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return f"#{p.idx}"
    return str(p)


def save_train_state(path: str, params, state, opt_state, step: int,
                     lr_scale: float, extra: Dict[str, Any] | None = None):
    """Write a single-file checkpoint.  ``opt_state`` is stored by tree
    structure; restore requires the same optimizer chain."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for prefix, tree in (("params", params), ("state", state),
                         ("opt", opt_state)):
        for k, v in _flatten(tree).items():
            arrays[f"{prefix}::{k}"] = v
    meta = {"step": int(step), "lr_scale": float(lr_scale),
            "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)  # atomic — preemption-safe


def restore_train_state(path: str, params, state, opt_state
                        ) -> Tuple[Any, Any, Any, int, float, Dict]:
    """Restore onto template trees (shapes/structure must match)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))

        def rebuild(prefix, template):
            flat_template = _flatten(template)
            loaded = {}
            for k in flat_template:
                arr = data[f"{prefix}::{k}"]
                if arr.shape != flat_template[k].shape:
                    raise ValueError(
                        f"checkpoint shape mismatch at {prefix}::{k}: "
                        f"{arr.shape} vs {flat_template[k].shape}")
                loaded[k] = arr
            leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(
                template)
            new_leaves = []
            for path_, leaf in leaves_with_path:
                key = "/".join(_path_str(p) for p in path_)
                new_leaves.append(
                    np.asarray(loaded[key], dtype=np.asarray(leaf).dtype))
            return jax.tree_util.tree_unflatten(treedef, new_leaves)

        new_params = rebuild("params", params)
        new_state = rebuild("state", state)
        new_opt = rebuild("opt", opt_state)
    return (new_params, new_state, new_opt, meta["step"], meta["lr_scale"],
            meta["extra"])
