"""TPU trainer: jitted train/eval steps, mesh data parallelism, callbacks.

Replaces the reference's ``fit_generator`` path (utils.py:231-241 + Keras'
C++ fit loop): one jitted train step (forward, void-masked weighted CE,
backward, Adam update, metrics) with donated buffers, batch sharded over the
mesh 'data' axis; gradients reduce over ICI via the psum XLA inserts.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deeplab_tpu.losses import (
    masked_sparse_ce, masked_sparse_ce_logits,
    sparse_crossentropy_ignoring_last_label,
    sparse_logits_crossentropy_ignoring_last_label)
from deeplab_tpu.metrics import (accuracy_from_ids, accuracy_sums_from_ids,
                                 jaccard_from_ids, jaccard_from_sums,
                                 jaccard_sums_from_ids)
from deeplab_tpu.parallel.mesh import (data_sharding, get_mesh,
                                       is_coordinator, mesh_process_count,
                                       put_global, put_replicated,
                                       replicated_sharding)
from deeplab_tpu.train.optimizer import freeze_set, make_optimizer, mask_frozen


def _served_batch_sizes(gen):
    """Distinct batch sizes ``gen`` will serve this epoch, from metadata
    when possible (no image decode).

    Both in-repo generators slice ``[i*bs:(i+1)*bs]`` out of n samples, so
    batch i has ``min(bs, n - i*bs)`` rows — i.e. ``bs`` everywhere except
    possibly the last served batch.  Unknown generator types fall back to
    materializing batch 0 (and remain guarded per-batch in the fit loop).
    """
    bs = getattr(gen, "batch_size", None)
    n = None
    for attr in ("image_path_list", "X"):
        src = getattr(gen, attr, None)
        if src is not None:
            n = len(src)
            break
    if bs is not None and n is not None and len(gen) > 0:
        last = min(bs, n - (len(gen) - 1) * bs)
        return sorted({min(bs, n), last})
    X0, _, _ = gen[0]
    return [X0.shape[0]]


class Trainer:
    def __init__(self, model, epochs: int = 20, callbacks: Iterable = (),
                 lr: float = 7e-4, epsilon: float = 1e-8, decay: float = 1e-6,
                 freeze_before: Optional[str] = None, mesh=None, seed: int = 0,
                 verbose: int = 1, spatial: bool = False,
                 compute_dtype=None, eval_dtype=None, remat: bool = False,
                 workers: int = 1, use_multiprocessing: bool = False,
                 ddp: bool = False, profile_dir: Optional[str] = None,
                 profile_steps: tuple = (2, 5)):
        self.model = model
        self.epochs = epochs
        self.callbacks = list(callbacks)
        self.base_lr = lr
        self.lr_scale = 1.0
        self.decay = decay
        self.epsilon = epsilon
        self.freeze_before = freeze_before
        self.mesh = mesh if mesh is not None else get_mesh()
        # Shard image height over the mesh 'space' axis (XLA SPMD inserts
        # conv halo exchanges) — the TPU-native answer to large images
        # (SURVEY.md §5.7).
        self.spatial = spatial
        # bf16 activations halve HBM traffic and double MXU rate; params,
        # grads and the optimizer stay f32 (mixed precision).
        self.compute_dtype = compute_dtype or jnp.float32
        # separate knob for validation numerics (defaults to f32 — see
        # eval_step)
        self.eval_dtype = eval_dtype or jnp.float32
        # jax.checkpoint around the forward: trade recompute for activation
        # memory (large batches / big images).
        self.remat = remat
        # ddp=True runs the train step PER DEVICE under shard_map instead
        # of XLA SPMD: gradients / loss / metric sums reduce exactly over
        # ICI psums, but BatchNorm batch statistics are computed over the
        # LOCAL shard (the torch-DDP convention; moving stats update with
        # the cross-device mean of the local stats).  Each shard_map
        # program owns one device, which unlocks the fused Pallas training
        # kernels on multi-chip meshes — they have no SPMD partitioning
        # rule and are otherwise gated to a single global device.
        # Data-parallel only (spatial sharding needs XLA SPMD conv halos).
        if ddp and spatial:
            raise ValueError("ddp=True is data-parallel only; it cannot be "
                             "combined with spatial=True")
        self.ddp = ddp
        self.seed = seed
        # Host data pipeline (reference fit_generator semantics,
        # utils.py:240: workers=cpu_count//2, use_multiprocessing=True):
        # workers=0 loads batches synchronously in the step loop; workers=1
        # prefetches on a background thread; workers>1 with
        # use_multiprocessing forks an ordered worker pool.
        self.workers = workers
        self.use_multiprocessing = use_multiprocessing
        # profile_dir: capture a jax.profiler device trace of global train
        # steps [profile_steps[0], profile_steps[1]) into this directory
        # (open with TensorBoard / Perfetto).  SURVEY §5.1.
        self.profile_dir = profile_dir
        self.profile_steps = tuple(profile_steps)
        self.verbose = verbose
        self.stop_training = False
        self.params = None
        self.state = None
        self.opt_state = None
        self._predict_fns = None
        self._predict_mesh = None  # mesh the cached predict jits target
        self._profiler = None      # created per-fit from profile_dir
        for cb in self.callbacks:
            cb.set_trainer(self)

    def current_lr(self) -> float:
        return self.base_lr * self.lr_scale

    # ------------------------------------------------------------- steps ----

    def _build_steps(self, frozen: frozenset):
        tx = make_optimizer(self.base_lr, self.epsilon, self.decay)
        model = self.model
        # Fused path (models exposing apply_logits, i.e. SegNet): train on
        # (B, H, W, C) head logits with a fused log-softmax CE and
        # ids-based metrics.  Skipping the flatten + f32 softmax
        # materialization over every pixel removes the full-resolution
        # relayout copies that profiled at ~25% of the 512x512 train step;
        # loss/metrics match the probs path up to Keras's 1e-7 clip (see
        # losses.sparse_logits_crossentropy_ignoring_last_label).
        fused = hasattr(model, "apply_logits")

        def metrics_from(Y, per_px_ids, n_classes):
            labels = Y[..., 0].astype(jnp.int32)
            preds = per_px_ids.reshape(labels.shape)
            return {
                "Jaccard": jaccard_from_ids(labels, preds, n_classes),
                "sparse_accuracy": accuracy_from_ids(labels, preds,
                                                     n_classes),
            }

        # ddp runs per-device under shard_map; a 1-device mesh is likewise a
        # single-device program even on a multi-chip host (a multi-chip
        # process would otherwise disable the fused Pallas kernels via
        # their len(jax.devices())==1 fallback gate).  Only these cases
        # pass shard_local — and only to models that take the kwarg
        # (plain-apply models without it keep working on the default path).
        import inspect
        takes_kw = "shard_local" in inspect.signature(
            model.apply_logits if fused else model.apply).parameters
        extra = ({"shard_local": True}
                 if takes_kw and (self.ddp or self.mesh.devices.size == 1)
                 else {})
        if fused:
            def forward(p, state, X, rng):
                return model.apply_logits(p, state, X, training=True,
                                          rng=rng, frozen=frozen,
                                          compute_dtype=self.compute_dtype,
                                          **extra)
        else:
            def forward(p, state, X, rng):
                return model.apply(p, state, X, training=True, rng=rng,
                                   frozen=frozen,
                                   compute_dtype=self.compute_dtype,
                                   **extra)

        if self.remat:
            forward = jax.checkpoint(forward)

        def compute_loss(out, X, Y, SW):
            with jax.named_scope("loss"):
                if fused:
                    b, h, w = X.shape[0], X.shape[1], X.shape[2]
                    return masked_sparse_ce_logits(
                        Y[..., 0].reshape(b, h, w), out,
                        SW.reshape(b, h, w))
                return masked_sparse_ce(Y, out, SW)

        def train_step(params, state, opt_state, lr_scale, rng, X, Y, SW):
            def loss_fn(p):
                out, new_state = forward(p, state, X, rng)
                return compute_loss(out, X, Y, SW), (out, new_state)

            (loss, (out, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            with jax.named_scope("optimizer"):
                updates, opt_state = tx.update(grads, opt_state, params)
                updates = mask_frozen(updates, frozen)
                updates = jax.tree.map(lambda u: u * lr_scale, updates)
                params = optax.apply_updates(params, updates)
            with jax.named_scope("step_metrics"):
                metrics = {"loss": loss}
                metrics.update(metrics_from(Y, jnp.argmax(out, axis=-1),
                                            out.shape[-1]))
            return params, new_state, opt_state, metrics

        def ddp_train_step(params, state, opt_state, lr_scale, rng, X, Y, SW):
            """Per-device program (inside shard_map over the 'data' axis).

            Loss, gradients, and metric sums reduce over exact psums of
            per-shard partial sums, so everything except BatchNorm batch
            statistics matches the SPMD train_step bit-for-bit in exact
            arithmetic; BN normalizes with LOCAL-shard statistics (torch
            DDP semantics) and the moving stats update with their
            cross-device mean."""
            # decorrelate dropout across shards (the SPMD step draws one
            # mask over the global batch)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

            def loss_fn(p):
                out, new_state = forward(p, state, X, rng)
                if fused:
                    b, h, w = X.shape[0], X.shape[1], X.shape[2]
                    per_px = sparse_logits_crossentropy_ignoring_last_label(
                        Y[..., 0].reshape(b, h, w), out)
                    sw = SW.reshape(b, h, w)
                else:
                    per_px = sparse_crossentropy_ignoring_last_label(Y, out)
                    sw = SW
                # exact global Keras temporal-weight reduction: psum the
                # nonzero-weight count now, psum the weighted sums (via the
                # gradient/loss psums below) after differentiation
                num = jnp.sum(per_px * sw)
                den = jnp.sum((sw != 0).astype(per_px.dtype))
                den_g = jnp.maximum(jax.lax.psum(den, "data"), 1.0)
                return num / den_g, (out, new_state)

            (loss_part, (out, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            loss = jax.lax.psum(loss_part, "data")
            grads = jax.lax.psum(grads, "data")
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = mask_frozen(updates, frozen)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            # replicas saw different local batches -> different BN batch
            # stats; average the moving-stat updates so state stays
            # replicated (exact for means; var averages per-shard vars)
            new_state = jax.lax.pmean(new_state, "data")

            labels = Y[..., 0].astype(jnp.int32)
            preds = jnp.argmax(out, axis=-1).reshape(labels.shape)
            nc = out.shape[-1]
            iou_sum, n_legal = jaccard_sums_from_ids(labels, preds, nc)
            correct, legal = accuracy_sums_from_ids(labels, preds, nc)
            metrics = {
                "loss": loss,
                "Jaccard": jaccard_from_sums(
                    jax.lax.psum(iou_sum, "data"),
                    jax.lax.psum(n_legal, "data")),
                "sparse_accuracy": (jax.lax.psum(correct, "data")
                                    / jnp.maximum(
                                        jax.lax.psum(legal, "data"), 1.0)),
            }
            return params, new_state, opt_state, metrics

        def ddp_eval_step(params, state, X, Y, SW):
            """Per-device eval (inside shard_map over 'data').  Eval has no
            cross-sample coupling (moving-stat BN, no dropout), so with the
            psum'd partial-sum reductions below this equals the SPMD
            eval_step to float roundoff — unlike ddp training there is no
            local-BN semantic difference."""
            if fused:
                out, _ = model.apply_logits(params, state, X,
                                            compute_dtype=self.eval_dtype,
                                            shard_local=True)
                b, h, w = X.shape[0], X.shape[1], X.shape[2]
                per_px = sparse_logits_crossentropy_ignoring_last_label(
                    Y[..., 0].reshape(b, h, w), out)
                sw = SW.reshape(b, h, w)
            else:
                out, _ = model.apply(params, state, X,
                                     compute_dtype=self.eval_dtype,
                                     shard_local=True)
                per_px = sparse_crossentropy_ignoring_last_label(Y, out)
                sw = SW
            num = jnp.sum(per_px * sw)
            den = jnp.sum((sw != 0).astype(per_px.dtype))
            loss = (jax.lax.psum(num, "data")
                    / jnp.maximum(jax.lax.psum(den, "data"), 1.0))
            labels = Y[..., 0].astype(jnp.int32)
            preds = jnp.argmax(out, axis=-1).reshape(labels.shape)
            nc = out.shape[-1]
            iou_sum, n_legal = jaccard_sums_from_ids(labels, preds, nc)
            correct, legal = accuracy_sums_from_ids(labels, preds, nc)
            return {
                "loss": loss,
                "Jaccard": jaccard_from_sums(
                    jax.lax.psum(iou_sum, "data"),
                    jax.lax.psum(n_legal, "data")),
                "sparse_accuracy": (jax.lax.psum(correct, "data")
                                    / jnp.maximum(
                                        jax.lax.psum(legal, "data"), 1.0)),
            }

        def eval_step(params, state, X, Y, SW):
            # validation defaults to f32 regardless of compute_dtype:
            # val_Jaccard drives ModelCheckpoint/plateau/EarlyStopping
            # decisions, and the reference's Keras validation is f32 — a
            # bf16 eval can flip best-epoch selection.  Pass
            # eval_dtype=jnp.bfloat16 to trade that parity for HBM traffic.
            if fused:
                out, _ = model.apply_logits(params, state, X,
                                            compute_dtype=self.eval_dtype)
            else:
                out, _ = model.apply(params, state, X,
                                     compute_dtype=self.eval_dtype)
            metrics = {"loss": compute_loss(out, X, Y, SW)}
            metrics.update(metrics_from(Y, jnp.argmax(out, axis=-1),
                                        out.shape[-1]))
            return metrics

        repl = replicated_sharding(self.mesh)
        data = data_sharding(self.mesh)
        # images can additionally shard H over 'space'; flat labels/weights
        # shard batch only (XLA reshards activations at the flatten point).
        img_sh = data_sharding(self.mesh, spatial=self.spatial)
        if self.ddp:
            from jax.sharding import PartitionSpec as P
            train_jit = jax.jit(
                jax.shard_map(
                    ddp_train_step, mesh=self.mesh,
                    in_specs=(P(), P(), P(), P(), P(),
                              P("data"), P("data"), P("data")),
                    out_specs=(P(), P(), P(), P()),
                    check_vma=False),
                donate_argnums=(0, 1, 2),
            )
            eval_jit = jax.jit(
                jax.shard_map(
                    ddp_eval_step, mesh=self.mesh,
                    in_specs=(P(), P(), P("data"), P("data"), P("data")),
                    out_specs=P(), check_vma=False))
            return train_jit, eval_jit, tx
        else:
            train_jit = jax.jit(
                train_step,
                in_shardings=(repl, repl, repl, None, None, img_sh, data,
                              data),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1, 2),
            )
        eval_jit = jax.jit(
            eval_step,
            in_shardings=(repl, repl, img_sh, data, data),
            out_shardings=repl,
        )
        return train_jit, eval_jit, tx

    # --------------------------------------------------------------- fit ----

    def _make_pipeline(self, gen):
        """Build the (re-iterable, one per fit) host pipeline over a
        generator so augmentation overlaps the device step.  Built once so
        the multiprocess pipeline's per-epoch worker reseed advances."""
        if self.workers > 1 and self.use_multiprocessing:
            from deeplab_tpu.data.generator import MultiprocessPrefetcher
            return MultiprocessPrefetcher(gen, workers=self.workers,
                                          seed=self.seed)
        if self.workers >= 1:
            from deeplab_tpu.data.generator import Prefetcher
            return Prefetcher(gen)

        class _Sync:
            def __iter__(_s):
                for i in range(len(gen)):
                    yield gen[i]
        return _Sync()

    def fit(self, params, state, train_gen, valid_gen=None, initial_epoch=0,
            state_checkpoint: Optional[str] = None,
            resume_from: Optional[str] = None):
        self.stop_training = False  # a previous EarlyStopping must not
        # truncate a fresh fit() to one epoch
        frozen = freeze_set(params, self.freeze_before,
                            order=getattr(self.model, "layer_order", None))

        # Every served batch must divide over the mesh 'data' axis.  If it
        # doesn't (e.g. bs=2 on 8 chips, the notebook's config), shrink to
        # the largest usable submesh rather than padding — padding would
        # contaminate BN batch statistics.  The declared batch_size is not
        # enough: ArrayBatcher serves a SHORTER batch when the dataset is
        # smaller than batch_size, so also account for the final batch.
        # Metadata (sample count + batch size) answers both without
        # materializing a batch; only an unknown generator type pays an
        # actual __getitem__ probe.
        import math
        sizes = []
        for g in (train_gen, valid_gen):
            if g is None or len(g) == 0:
                continue
            sizes.extend(_served_batch_sizes(g))
        n_data = self.mesh.shape["data"]
        # multi-process: sizes are LOCAL batches; the global batch is
        # local * mesh-process-count, and shrinking to a submesh would
        # orphan whole processes — _check_batch_divides errors instead.
        # (Counted from the MESH, not jax.process_count(): a process-local
        # submesh in a distributed job is single-process, ADVICE r4 low#1.)
        n_proc = mesh_process_count(self.mesh)
        usable = n_data
        if n_proc == 1:
            for s in sizes:
                usable = math.gcd(usable, s)
        if usable != n_data:
            devs = self.mesh.devices.reshape(-1)[:usable * self.mesh.shape["space"]]
            self.mesh = get_mesh(devs, data=usable,
                                 space=self.mesh.shape["space"])
            if self.verbose:
                print(f"warning: batch sizes {sorted(set(sizes))} not "
                      f"divisible by data axis {n_data}; using "
                      f"{usable}-device submesh")

        train_jit, eval_jit, tx = self._build_steps(frozen)

        repl = replicated_sharding(self.mesh)
        # Copy before donating: on a 1-device mesh device_put is a no-op and
        # donate_argnums would otherwise delete the CALLER's arrays on the
        # first step.  put_replicated handles the multi-process mesh (every
        # process holds the same seeded init / restored checkpoint).
        self.params = put_replicated(jax.tree.map(jnp.array, params),
                                     self.mesh)
        self.state = put_replicated(jax.tree.map(jnp.array, state),
                                    self.mesh)
        self.opt_state = put_replicated(tx.init(self.params), self.mesh)
        step = 0

        if resume_from is not None and __import__("os").path.exists(resume_from):
            from deeplab_tpu.train.checkpoint import restore_train_state
            (p, s, o, step, self.lr_scale, extra) = restore_train_state(
                resume_from, self.params, self.state, self.opt_state)
            self.params = put_replicated(p, self.mesh)
            self.state = put_replicated(s, self.mesh)
            self.opt_state = put_replicated(o, self.mesh)
            initial_epoch = max(initial_epoch, extra.get("epoch", 0))
            # restore callback bookkeeping (ModelCheckpoint.best, plateau /
            # early-stop counters) — without it the first post-resume epoch
            # would overwrite the best-weights h5 with possibly worse ones.
            # States are keyed by callback class name (first-fit among
            # unmatched) so a changed callback list between save and resume
            # can't silently apply counters to the wrong callback; plain
            # dicts (pre-round-3 checkpoints) fall back to positional zip.
            saved = list(extra.get("callbacks", []))
            if saved and all(isinstance(s, (list, tuple)) and len(s) == 2
                             and isinstance(s[0], str) for s in saved):
                unmatched = list(self.callbacks)
                for name, cb_state in saved:
                    for cb in unmatched:
                        if type(cb).__name__ == name:
                            cb.set_state(cb_state)
                            unmatched.remove(cb)
                            break
            else:
                for cb, cb_state in zip(self.callbacks, saved):
                    cb.set_state(cb_state)
            if self.verbose:
                print(f"resumed from {resume_from} "
                      f"(epoch {initial_epoch}, step {step})")

        base_rng = jax.random.key(self.seed)
        history = {"loss": [], "Jaccard": [], "sparse_accuracy": []}
        if valid_gen is not None:
            history.update({"val_loss": [], "val_Jaccard": [],
                            "val_sparse_accuracy": []})
        data_sh = data_sharding(self.mesh)
        img_sh = data_sharding(self.mesh, spatial=self.spatial)
        train_pipe = self._make_pipeline(train_gen)
        valid_pipe = (self._make_pipeline(valid_gen)
                      if valid_gen is not None else None)
        self._profiler = None
        if self.profile_dir is not None:
            from deeplab_tpu.train.profiling import StepWindowProfiler
            self._profiler = StepWindowProfiler(self.profile_dir,
                                                *self.profile_steps)
        try:
            return self._fit_loop(train_gen, train_pipe, valid_gen,
                                  valid_pipe, initial_epoch, train_jit,
                                  eval_jit, base_rng, history, data_sh,
                                  img_sh, step, state_checkpoint)
        finally:
            # stop abandoned producers (an exception mid-epoch would
            # otherwise leave a worker looping over the shared generator)
            for pipe in (train_pipe, valid_pipe):
                if pipe is not None and hasattr(pipe, "close"):
                    pipe.close()
            if self._profiler is not None:
                self._profiler.close()  # an exception inside the window
                # must not leave jax.profiler tracing

    def _check_batch_divides(self, X):
        """Catch an indivisible batch (unknown generator type serving a
        ragged size the metadata probe could not predict) with an
        actionable error instead of a cryptic sharding failure.  Multi-
        process, X is this host's LOCAL slice: it must divide this
        process's share of the 'data' axis (the global batch is the local
        rows times process_count)."""
        n_data = self.mesh.shape["data"]
        n_proc = mesh_process_count(self.mesh)
        n_local = n_data // max(n_proc, 1)
        if n_local == 0 or n_data % n_proc:
            raise ValueError(
                f"mesh 'data' axis ({n_data}) must be a multiple of the "
                f"mesh's process count ({n_proc})")
        if X.shape[0] % n_local:
            raise ValueError(
                f"local batch of {X.shape[0]} does not divide this "
                f"process's share of the mesh 'data' axis ({n_local} of "
                f"{n_data}); make local batch sizes (including the final "
                f"batch) multiples of {n_local}, or pass a smaller mesh")

    def _fit_loop(self, train_gen, train_pipe, valid_gen, valid_pipe,
                  initial_epoch, train_jit, eval_jit, base_rng, history,
                  data_sh, img_sh, step, state_checkpoint):
        profiler = self._profiler
        from deeplab_tpu.train.profiling import StepTimer
        timer = StepTimer()
        for epoch in range(initial_epoch, self.epochs):
            t0 = time.time()
            sums, n_batches = {}, 0
            for X, Y, sw_dict in train_pipe:
                SW = sw_dict["pred_mask"] if isinstance(sw_dict, dict) else sw_dict
                self._check_batch_divides(X)
                if profiler is not None:
                    profiler.before_step(step, blockers=sums)
                timer.start()
                # host numpy -> per-shard transfer in one hop (jnp.asarray
                # first would land the whole batch on one device and
                # reshard); multi-process, these rows are this host's LOCAL
                # slice and put_global assembles the global batch
                items = X.shape[0] * jax.process_count()
                X = put_global(X, img_sh)
                Y = put_global(Y, data_sh)
                SW = put_global(SW, data_sh)
                rng = jax.random.fold_in(base_rng, step)
                self.params, self.state, self.opt_state, metrics = train_jit(
                    self.params, self.state, self.opt_state,
                    jnp.float32(self.lr_scale), rng, X, Y, SW)
                # accumulate on device: float() here would host-sync every
                # step and serialize augmentation with the device step
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + v
                timer.stop(items)
                if profiler is not None:
                    profiler.after_step(step, blockers=metrics)
                n_batches += 1
                step += 1
            logs = {k: float(v) / max(n_batches, 1) for k, v in sums.items()}

            if valid_gen is not None:
                vsums, vn = {}, 0
                for X, Y, sw_dict in valid_pipe:
                    SW = (sw_dict["pred_mask"] if isinstance(sw_dict, dict)
                          else sw_dict)
                    self._check_batch_divides(X)
                    X = put_global(X, img_sh)
                    Y = put_global(Y, data_sh)
                    SW = put_global(SW, data_sh)
                    m = eval_jit(self.params, self.state, X, Y, SW)
                    for k, v in m.items():
                        vsums[k] = vsums.get(k, 0.0) + v
                    vn += 1
                logs.update({f"val_{k}": float(v) / max(vn, 1)
                             for k, v in vsums.items()})

            for k, v in logs.items():
                history.setdefault(k, []).append(v)
            if self.verbose:
                msg = " - ".join(f"{k}: {v:.4f}" for k, v in logs.items())
                # dispatch-side step timing (device steps run async; the
                # aggregate items/s over the window is the true rate)
                print(f"Epoch {epoch + 1}/{self.epochs} "
                      f"({time.time() - t0:.1f}s, {timer.summary()}) - {msg}")

            train_gen.on_epoch_end()
            for cb in self.callbacks:
                cb.on_epoch_end(epoch, logs)
            if state_checkpoint is not None and is_coordinator():
                # process 0 owns the write; replicated trees are locally
                # addressable on every process so no gather is needed
                from deeplab_tpu.train.checkpoint import save_train_state
                save_train_state(
                    state_checkpoint, self.params, self.state,
                    self.opt_state, step, self.lr_scale,
                    extra={"epoch": epoch + 1,
                           "callbacks": [[type(cb).__name__, cb.get_state()]
                                         for cb in self.callbacks]})
            if self.stop_training:
                break
        return history

    # ------------------------------------------------------------ predict ----

    def predict(self, params, state, X, batch_size: int = 16):
        """Batched inference, sharded over the mesh 'data' axis when the
        batch divides it (multi-chip serving path)."""
        outs = []
        n = len(X)
        n_data = self.mesh.shape["data"]
        repl = replicated_sharding(self.mesh)
        data_sh = data_sharding(self.mesh)
        if self._predict_fns is None or self._predict_mesh is not self.mesh:
            # cache the jitted forwards: fresh lambdas would retrace (and
            # recompile) on every predict() call.  Keyed on the mesh object:
            # fit() may have shrunk self.mesh to a submesh, and a cached jit
            # bound to the old device set would reject arrays placed on the
            # new one.
            self._predict_mesh = self.mesh
            self._predict_fns = (
                jax.jit(lambda p, s, x: self.model.apply(p, s, x)[0],
                        in_shardings=(repl, repl, data_sh),
                        out_shardings=data_sh),
                jax.jit(lambda p, s, x: self.model.apply(p, s, x)[0]),
            )
        fwd, fwd_single = self._predict_fns
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        for i in range(0, n, batch_size):
            xb = jnp.asarray(X[i:i + batch_size])
            if xb.shape[0] % n_data == 0:
                xb = jax.device_put(xb, data_sh)
                outs.append(np.asarray(fwd(params, state, xb)))
            else:
                outs.append(np.asarray(fwd_single(params, state, xb)))
        return np.concatenate(outs, axis=0)
