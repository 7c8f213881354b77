"""AOT serving export: the compiled image -> mask pipeline as an artifact.

The reference deploys by shipping Python + Keras + ``weights/*.h5`` and
rebuilding the graph at import time (``deeplabv3p.py:209``, notebook cell 7).
On TPU the production analogue is an ahead-of-time compiled artifact: this
module serializes the full serving pipeline (model forward -> argmax ->
optional dense-CRF refinement) to StableHLO via ``jax.export`` and packs it,
together with the weights, into ONE ``.npz`` file that can be reloaded and
run with **no model-building code** — loading needs jax and this module's
``load_serving``, not the network definition, the CRF engine, or the h5
importer.

Why params stay *inputs* rather than baked-in constants: (a) the artifact
then doubles as a weight container (arrays are stored once, uncompiled, and
can be hot-swapped with same-shaped fine-tuned weights via
``ServingArtifact.with_params``); (b) multi-hundred-MB MLIR constants make
compile payloads balloon (on tunneled dev environments they outright fail).

Batch handling: ``batch=None`` exports with a *symbolic* batch dimension
(``jax.export.symbolic_shape``) so one artifact serves any batch size with
one compile per concrete size actually seen; a fixed ``batch`` pins the
leading dim (the loader then pads/trims ragged batches like ``Predictor``).

Cross-platform: ``platforms=("tpu", "cpu")`` lowers for both targets where
the traced graph is platform-neutral.  Note the fused Pallas serving kernels
(`kernels/fused_mbconv.py`, `kernels/crf_fused.py`) engage based on the
*exporting* process's backend — an artifact exported on a TPU host contains
Mosaic custom calls and is TPU-only; export with ``platforms=("cpu",)`` on a
CPU host (or ``CrfConfig(backend='jnp')``) for a portable XLA-only graph.
"""

from __future__ import annotations

import io
import json
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu.crf import CrfConfig, mean_field_batched

ARTIFACT_VERSION = 1
_HLO_KEY = "__stablehlo__"
_META_KEY = "__meta__"


def build_serving_fn(net, crf: Optional[CrfConfig] = None,
                     compute_dtype="mixed",
                     n_classes: Optional[int] = None):
    """The single-device serving pipeline (the same math as ``Predictor``
    without a mesh): raw 0-255 BGR (B, H, W, 3) float32 -> (B, H, W) int32
    label maps, CRF-refined when ``crf`` is given."""
    n = n_classes or getattr(net, "n_classes", 21)

    def pipeline(params, state, img):
        # exported modules execute as single-device programs; shard_local
        # lets the fused Pallas serving kernels engage on multi-chip hosts
        preds = net.predict_ids(params, state, img,
                                compute_dtype=compute_dtype,
                                shard_local=True)
        if crf is not None:
            preds = mean_field_batched(img, preds, crf, n)
        return preds

    return pipeline


def _specs_like(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


def export_serving(net, params, state, crf: Optional[CrfConfig] = None,
                   batch: Optional[int] = None, compute_dtype="mixed",
                   platforms: Optional[Sequence[str]] = None,
                   n_classes: Optional[int] = None):
    """Trace + lower the serving pipeline; returns a ``jax.export.Exported``.

    ``batch=None`` uses a symbolic batch dimension (any B at run time).
    """
    from jax import export as jexport

    fn = jax.jit(build_serving_fn(net, crf, compute_dtype, n_classes))
    h, w = net.sz
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    img_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jexport.export(fn, **kw)(_specs_like(params), _specs_like(state),
                                    img_spec)


def _flat_keys(tree, prefix):
    """Two-level {layer: {var: array}} dict -> {npz key: array}; key is a
    JSON-encoded [prefix, layer, var] triple (unambiguous for any names)."""
    out = {}
    for layer, vars_ in tree.items():
        for var, arr in vars_.items():
            out[json.dumps([prefix, layer, var])] = np.asarray(arr)
    return out


def _unflatten(npz):
    params, state = {}, {}
    for key in npz.files:
        if key.startswith("__"):
            continue
        prefix, layer, var = json.loads(key)
        tree = params if prefix == "p" else state
        tree.setdefault(layer, {})[var] = npz[key]
    return params, state


def save_serving(path, net, params, state, crf: Optional[CrfConfig] = None,
                 batch: Optional[int] = None, compute_dtype="mixed",
                 platforms: Optional[Sequence[str]] = None,
                 n_classes: Optional[int] = None):
    """Export and write a self-contained serving artifact (one ``.npz``).

    Contents: serialized StableHLO module, every weight array, and a meta
    record (image size, class count, CRF config, batch mode, platforms).
    Returns the ``Exported`` for inspection.
    """
    exp = export_serving(net, params, state, crf=crf, batch=batch,
                         compute_dtype=compute_dtype, platforms=platforms,
                         n_classes=n_classes)
    meta = {
        "version": ARTIFACT_VERSION,
        "image_size": list(net.sz),
        "n_classes": n_classes or getattr(net, "n_classes", 21),
        "batch": batch,
        "compute_dtype": ("mixed" if isinstance(compute_dtype, str)
                          else jnp.dtype(compute_dtype).name),
        "platforms": list(exp.platforms),
        "crf": (None if crf is None else
                {f.name: getattr(crf, f.name)
                 for f in crf.__dataclass_fields__.values()}),
        "backbone": getattr(net, "backbone", None),
        "net": getattr(net, "net", None),
    }
    payload = dict(_flat_keys(params, "p"))
    payload.update(_flat_keys(state, "s"))
    payload[_HLO_KEY] = np.frombuffer(exp.serialize(), np.uint8)
    payload[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    with open(path, "wb") as f:          # atomic-ish single write
        f.write(buf.getvalue())
    return exp


class ServingArtifact:
    """A loaded serving artifact: ``artifact(images) -> (B, H, W) int32``.

    Mirrors ``Predictor.__call__`` semantics (ragged batches pad+trim when
    the artifact was exported with a fixed batch).  The underlying call is
    jitted so repeat invocations at the same shape reuse the executable.
    """

    def __init__(self, exported, params, state, meta):
        self.exported = exported
        self.params = params
        self.state = state
        self.meta = meta
        self.sz = tuple(meta["image_size"])
        self.batch = meta.get("batch")
        self._fn = jax.jit(exported.call)

    @classmethod
    def load(cls, path):
        from jax import export as jexport
        npz = np.load(path)
        meta = json.loads(bytes(npz[_META_KEY].tobytes()).decode("utf-8"))
        if meta.get("version", 0) > ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {meta['version']} is newer than this "
                f"loader ({ARTIFACT_VERSION})")
        exported = jexport.deserialize(npz[_HLO_KEY].tobytes())
        params, state = _unflatten(npz)
        return cls(exported, params, state, meta)

    def with_params(self, params, state=None):
        """Same compiled pipeline, new same-shaped weights (e.g. after a
        fine-tune) — no re-export needed."""
        art = ServingArtifact.__new__(ServingArtifact)
        art.exported, art.meta = self.exported, self.meta
        art.sz, art.batch, art._fn = self.sz, self.batch, self._fn
        art.params = params
        art.state = self.state if state is None else state
        return art

    def __call__(self, images):
        img = jnp.asarray(images, jnp.float32)
        b = img.shape[0]
        if self.batch is not None:
            if b > self.batch:
                raise ValueError(f"batch {b} exceeds the artifact's fixed "
                                 f"batch {self.batch}")
            pad = self.batch - b
            if pad:
                img = jnp.concatenate(
                    [img, jnp.repeat(img[-1:], pad, axis=0)], axis=0)
        out = self._fn(self.params, self.state, img)
        return np.asarray(out)[:b]


def load_serving(path) -> ServingArtifact:
    return ServingArtifact.load(path)
