"""Keras .h5 weight interop + native checkpointing helpers.

The reference ships/loads weights as Keras HDF5 files keyed by layer name
(deeplabv3p.py:465 ``load_weights(by_name=True)``; utils.py:206-207 full
loads; ModelCheckpoint writes the same format, notebook cell 5).  Our param
tree uses the same layer names, so import/export is a structural walk.

Variable-name mapping (Keras -> ours):
  kernel:0 -> kernel, depthwise_kernel:0 -> depthwise_kernel, bias:0 -> bias,
  gamma:0/beta:0 -> gamma/beta, moving_mean:0/moving_variance:0 -> state.

Subpixel quirk: the Keras Subpixel layer gets an auto-generated name
(e.g. 'subpixel_1'); any file layer named 'subpixel*' maps onto our
'subpixel' layer.  Its kernel layout is (1,1,cin,f*r*r) with the reference's
channel order f*r^2 + dc*r + dr, which ops.pixel_shuffle consumes natively —
no permutation needed (SURVEY.md C9).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from deeplab_tpu.core import Params, State

_STATE_VARS = {"moving_mean", "moving_variance"}


def _strip(name: str) -> str:
    name = name.split("/")[-1]
    return name[:-2] if name.endswith(":0") else name


def _attr_list(g, name):
    """Read a Keras list attribute, including the legacy chunked form.

    Keras 2's ``save_attributes_to_hdf5_group`` splits a list that exceeds
    HDF5's 64 KB attribute limit into ``name0``, ``name1``, ... chunks
    (keras/engine/saving.py in 2.2.4); big models' ``layer_names`` /
    ``weight_names`` ship that way.  Returns [] when the attribute is
    absent in either form.
    """
    if name in g.attrs:
        vals = g.attrs[name]
    else:
        vals, k = [], 0
        while f"{name}{k}" in g.attrs:
            vals.extend(g.attrs[f"{name}{k}"])
            k += 1
    return [n.decode() if isinstance(n, bytes) else n for n in vals]


def _iter_h5_layers(f):
    """Yield (layer_name, {var_name: np.ndarray}) from a Keras weights h5."""
    g = f["model_weights"] if "model_weights" in f else f
    layer_names = _attr_list(g, "layer_names") or list(g.keys())
    for lname in layer_names:
        if lname not in g:
            continue
        grp = g[lname]
        weight_names = _attr_list(grp, "weight_names")
        if not weight_names:
            # fall back: walk datasets
            out = {}
            def visit(name, obj):
                if hasattr(obj, "shape") and obj.shape is not None:
                    out[_strip(name)] = np.asarray(obj)
            grp.visititems(visit)
            if out:
                yield lname, out
            continue
        out = {}
        for wn in weight_names:
            ds = grp[wn] if wn in grp else grp[wn.split("/", 1)[-1]]
            out[_strip(wn)] = np.asarray(ds)
        yield lname, out


def _canonical_layer(lname: str, params: Params, state: State) -> str:
    if lname in params or lname in state:
        return lname
    if lname.startswith("subpixel") and "subpixel" in params:
        return "subpixel"
    return lname


def _iter_keras3_layers(f):
    """Yield (layer_name, [arrays in save order]) from a Keras 3
    ``.weights.h5`` (layout: ``layers/<class>/vars/{0..N}`` with the layer
    name as an attr on the ``vars`` group)."""
    import h5py

    def walk(group):
        for key in group:
            item = group[key]
            if not isinstance(item, h5py.Group):
                continue
            if key == "vars":
                name = item.attrs.get("name", "")
                if isinstance(name, bytes):
                    name = name.decode()
                arrays = [np.asarray(item[k])
                          for k in sorted(item, key=lambda s: int(s))]
                if arrays and name:
                    yield name, arrays
            else:
                yield from walk(item)

    yield from walk(f)


def _assign_positional(tgt, arrays, new_params, new_state) -> int:
    """Map a Keras-3 positional weight list onto our named slots using the
    layer's structure (Keras save order: conv [kernel, bias]; depthwise
    [depthwise_kernel, bias]; BN [gamma, beta, moving_mean, moving_var])."""
    p = new_params.get(tgt, {})
    if "gamma" in p:
        names, trees = (["gamma", "beta", "moving_mean", "moving_variance"],
                        [new_params, new_params, new_state, new_state])
    elif "depthwise_kernel" in p:
        names, trees = ["depthwise_kernel", "bias"], [new_params] * 2
    elif "kernel" in p:
        names, trees = ["kernel", "bias"], [new_params] * 2
    else:
        return 0
    n = 0
    for arr, vname, tree in zip(arrays, names, trees):
        slot = tree[tgt]
        if vname not in slot:
            continue
        if tuple(slot[vname].shape) != tuple(arr.shape):
            raise ValueError(f"shape mismatch {tgt}/{vname}: model "
                             f"{tuple(slot[vname].shape)} vs {arr.shape}")
        slot[vname] = jnp.asarray(arr, dtype=slot[vname].dtype)
        n += 1
    return n


def _is_keras3_layout(f) -> bool:
    return ("layers" in f and "layer_names" not in f.attrs
            and "model_weights" not in f)


def load_keras_h5(path: str, params: Params, state: State,
                  strict: bool = False) -> Tuple[Params, State]:
    """Load a Keras weights file onto (params, state) by layer name.

    Mirrors Keras ``load_weights(by_name=True)``: file layers not present in
    the model are skipped (unless ``strict``).  Returns new trees.  Both the
    legacy Keras-2 HDF5 layout (what the reference shipped,
    deeplabv3p.py:465) and the Keras-3 ``.weights.h5`` layout are detected.
    """
    import h5py
    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}
    n_loaded = 0
    with h5py.File(path, "r") as f:
        if _is_keras3_layout(f):
            for lname, arrays in _iter_keras3_layers(f):
                tgt = _canonical_layer(lname, params, state)
                if tgt not in new_params and tgt not in new_state:
                    if strict:
                        raise KeyError(f"h5 layer {lname!r} not in model")
                    continue
                n_loaded += _assign_positional(tgt, arrays, new_params,
                                               new_state)
            if n_loaded == 0:
                raise ValueError(f"no weights matched model in {path}")
            return new_params, new_state
        for lname, vars_ in _iter_h5_layers(f):
            tgt = _canonical_layer(lname, params, state)
            known = tgt in new_params or tgt in new_state
            if not known:
                if strict:
                    raise KeyError(f"h5 layer {lname!r} not in model")
                continue
            for vname, arr in vars_.items():
                tree = new_state if vname in _STATE_VARS else new_params
                slot = tree.setdefault(tgt, {})
                if vname not in slot:
                    if strict:
                        raise KeyError(f"{tgt}/{vname} not in model")
                    continue
                if tuple(slot[vname].shape) != tuple(arr.shape):
                    raise ValueError(
                        f"shape mismatch {tgt}/{vname}: model "
                        f"{tuple(slot[vname].shape)} vs file {arr.shape}")
                slot[vname] = jnp.asarray(arr, dtype=slot[vname].dtype)
                n_loaded += 1
    if n_loaded == 0:
        raise ValueError(f"no weights matched model in {path}")
    return new_params, new_state


def save_keras_h5(path: str, params: Params, state: State) -> None:
    """Write a Keras-compatible weights h5 (readable by the reference's
    ``load_weights`` and by :func:`load_keras_h5`)."""
    import h5py
    layer_names = sorted(set(params) | set(state))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n in layer_names])
        f.attrs["backend"] = b"jax"
        for lname in layer_names:
            grp = f.create_group(lname)
            weight_names = []
            merged = {}
            merged.update(params.get(lname, {}))
            merged.update(state.get(lname, {}))
            # Keras ordering: kernel, depthwise_kernel, bias, gamma, beta,
            # moving_mean, moving_variance
            order = ["kernel", "depthwise_kernel", "bias", "gamma", "beta",
                     "moving_mean", "moving_variance"]
            for vname in sorted(merged, key=lambda v: order.index(v)
                                if v in order else 99):
                full = f"{lname}/{vname}:0"
                grp.create_dataset(full, data=np.asarray(merged[vname]))
                weight_names.append(full.encode())
            grp.attrs["weight_names"] = np.array(weight_names)


def load_pretrained_pascal_voc(params: Params, state: State, backbone: str):
    """Reference deeplabv3p.py:456-465 contract: load the bonlime release
    weights by name.  This environment has no network egress, so we resolve a
    local cache only; set ``DEEPLAB_TPU_WEIGHTS_DIR`` or place the file under
    ``weights/``."""
    fname = ("deeplabv3_xception_tf_dim_ordering_tf_kernels.h5"
             if backbone == "xception"
             else "deeplabv3_mobilenetv2_tf_dim_ordering_tf_kernels.h5")
    for root in (os.environ.get("DEEPLAB_TPU_WEIGHTS_DIR", ""), "weights",
                 os.path.expanduser("~/.keras/models")):
        if root and os.path.exists(os.path.join(root, fname)):
            return load_keras_h5(os.path.join(root, fname), params, state)
    raise FileNotFoundError(
        f"pretrained weights {fname} not found locally; no network egress. "
        "Place the file in ./weights or set DEEPLAB_TPU_WEIGHTS_DIR.")
