"""Minimal functional parameter system.

Params live in a flat, name-keyed pytree: ``{layer_name: {var_name: array}}``.
Layer names follow the reference's Keras layer names exactly — that is the
weight-file contract (reference deeplabv3p.py:465 loads ``by_name=True``), so
the h5 importer can map shipped checkpoints onto this tree with zero renaming.

Model code is written once as a pure function over a :class:`Ctx`; the same
code path either *creates* params (init mode, shapes inferred from the traced
activations) or *consumes* them (apply mode, fully jittable).  Non-trainable
state (BatchNorm moving stats) lives in a parallel ``state`` tree so the
optimizer never sees it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jax.Array]]
State = Dict[str, Dict[str, jax.Array]]


@dataclasses.dataclass
class Ctx:
    """Threaded through model code; dispatches init vs apply behavior."""

    mode: str  # 'init' | 'apply'
    params: Params
    state: State
    training: bool = False
    rng: Optional[jax.Array] = None
    new_state: State = dataclasses.field(default_factory=dict)
    compute_dtype: Any = jnp.float32
    # Layers frozen for fine-tuning (notebook cell 5: everything before
    # 'concat_projection').  Frozen BatchNorm runs in inference mode and does
    # not update moving stats (Keras >= 2.1.3 semantics).
    frozen: frozenset = frozenset()
    # BN-recalibration mode (train/bn_calibrate.py): BatchNorm normalizes
    # with batch statistics and reports them RAW via update_stat (no EMA);
    # dropout stays off (training=False).
    bn_calibrate: bool = False
    # The 'mixed' compute policy (compute_dtype="mixed"): activations stay
    # float32 but conv/matmul MXU passes run at DEFAULT precision (one bf16
    # pass with f32 accumulation) instead of f32's HIGHEST (bf16x6).
    # Measured on mini_voc (tools/grade_production.py, 512x512): mIoU equals
    # the f32/HIGHEST parity path (+0.005 pt) at 1478 img/s/chip model-only
    # vs f32's 538 — the serving-accuracy production policy.  End-to-end
    # bf16 costs -0.11 pt on the same metric (activation rounding in the
    # backbone; an f32 head does not recover it).
    mxu_bf16: bool = False
    # True when this apply executes PER DEVICE inside a shard_map program
    # (e.g. Predictor's data-parallel serving).  Pallas custom calls have
    # no SPMD partitioning rule, so the fused-kernel gates normally demand
    # a single global device; inside shard_map each program owns exactly
    # one device, so the gates accept shard_local as the equivalent.
    shard_local: bool = False

    def param(self, layer: str, name: str, shape, init_fn: Callable, dtype=jnp.float32):
        if self.mode == "init":
            layer_params = self.params.setdefault(layer, {})
            if name not in layer_params:
                self.rng, sub = jax.random.split(self.rng)
                layer_params[name] = init_fn(sub, shape, dtype)
            return layer_params[name]
        try:
            p = self.params[layer][name]
        except KeyError as e:
            raise KeyError(f"missing param {layer}/{name}") from e
        if layer in self.frozen:
            # Freezing detaches the param from the autodiff graph (its grad
            # is zero by construction, matching Keras trainable=False).
            # Because the freeze region is a prefix of the network (the
            # notebook's freeze-before-'concat_projection' policy), no
            # trainable param lives upstream of it, so XLA dead-code
            # eliminates the ENTIRE trunk backward pass — fine-tune steps
            # cost roughly a forward pass instead of a full train step.
            p = jax.lax.stop_gradient(p)
        return p

    def stat(self, layer: str, name: str, shape, init_val: float, dtype=jnp.float32):
        """Fetch a non-trainable statistic (e.g. BN moving mean/var)."""
        if self.mode == "init":
            layer_state = self.state.setdefault(layer, {})
            if name not in layer_state:
                layer_state[name] = jnp.full(shape, init_val, dtype)
            return layer_state[name]
        try:
            return self.state[layer][name]
        except KeyError as e:
            raise KeyError(f"missing state {layer}/{name}") from e

    def update_stat(self, layer: str, name: str, value: jax.Array):
        self.new_state.setdefault(layer, {})[name] = value

    def next_rng(self) -> jax.Array:
        assert self.rng is not None, "rng required (dropout in training mode)"
        self.rng, sub = jax.random.split(self.rng)
        return sub


def init_model(model_fn: Callable, rng: jax.Array, *example_inputs, **kwargs):
    """Run ``model_fn`` in init mode; returns (params, state).

    Shape inference runs under ``jax.eval_shape``-style abstract values is not
    needed — we run eagerly on the example input (cheap at init time) so that
    initializers see concrete shapes.
    """
    ctx = Ctx(mode="init", params={}, state={}, training=False, rng=rng)
    model_fn(ctx, *example_inputs, **kwargs)
    return ctx.params, ctx.state


def resolve_compute_dtype(compute_dtype):
    """Translate a compute policy into (activation dtype, mxu_bf16 flag).

    Accepted anywhere ``compute_dtype`` is: a real dtype (float32 parity /
    bfloat16 turbo), or the string ``"mixed"`` — float32 activations with
    single-pass bf16 MXU convs (see Ctx.mxu_bf16)."""
    if isinstance(compute_dtype, str) and compute_dtype == "mixed":
        return jnp.float32, True
    return compute_dtype, False


def apply_model(model_fn: Callable, params: Params, state: State, *inputs,
                training: bool = False, rng: Optional[jax.Array] = None,
                frozen: frozenset = frozenset(), compute_dtype=jnp.float32,
                bn_calibrate: bool = False, shard_local: bool = False,
                **kwargs):
    """Run ``model_fn`` in apply mode. Returns (output, new_state).

    ``new_state`` contains updated BN moving stats when ``training=True``
    (merged over the old state), else it equals ``state``.
    ``compute_dtype=jnp.bfloat16`` selects the fast MXU path (params stay
    f32; activations and conv inputs run bf16); ``compute_dtype="mixed"``
    keeps f32 activations but runs the MXU at bf16 (serving accuracy at
    ~80% of the bf16 rate — see Ctx.mxu_bf16).
    """
    compute_dtype, mxu_bf16 = resolve_compute_dtype(compute_dtype)
    ctx = Ctx(mode="apply", params=params, state=state, training=training,
              rng=rng, frozen=frozen, compute_dtype=compute_dtype,
              bn_calibrate=bn_calibrate, shard_local=shard_local,
              mxu_bf16=mxu_bf16)
    out = model_fn(ctx, *inputs, **kwargs)
    if (training or bn_calibrate) and ctx.new_state:
        merged = {k: dict(v) for k, v in state.items()}
        for layer, vars_ in ctx.new_state.items():
            merged.setdefault(layer, {}).update(vars_)
        return out, merged
    return out, state


def param_count(params: Params) -> int:
    return sum(int(x.size) for lp in params.values() for x in lp.values())
