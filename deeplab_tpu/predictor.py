"""High-level serving API: one jitted image -> logits -> CRF -> mask pipeline.

The reference's inference story is scattered across notebook cells 7-9
(predict, host argmax, CPU pydensecrf).  ``Predictor`` packages the whole
path as a single compiled function that never leaves the device, with
optional mesh sharding for multi-chip serving.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu.crf import CrfConfig, mean_field_batched


class Predictor:
    """Compiled end-to-end segmentation inference.

    Args:
      net: a SegNet / Deeplabv3-like object with ``apply``.
      params, state: the weight trees.
      crf: CrfConfig for on-device post-processing, or None to skip.
      compute_dtype: "mixed" (default) — f32 activations with single-pass
        bf16 MXU convs, the production policy (mIoU == f32 parity on
        mini_voc at 1478 img/s/chip model-only; core.Ctx.mxu_bf16);
        jnp.bfloat16 for the turbo path (1850 img/s, -0.11 pt mIoU);
        jnp.float32 for exact parity (538 img/s).
      mesh: optional jax Mesh; batches shard over its 'data' axis.
      tta_scales / tta_flip: multi-scale + horizontal-flip test-time
        augmentation (the upstream DeepLab eval protocol the reference
        inherits its mIoU claims from, deeplabv3p.py:6): softmax
        probabilities are averaged over every (scale, flip) variant before
        the argmax/CRF.  Scaled sizes snap to multiples of 8; scale 1.0 in
        the tuple reuses ``net`` itself.  Requires a ``net.at_size`` twin
        builder (SegNet has one); incompatible with ``spatial`` sharding.
    """

    def __init__(self, net, params, state, crf: Optional[CrfConfig] = None,
                 compute_dtype="mixed", mesh=None,
                 n_classes: Optional[int] = None, spatial: bool = False,
                 return_raw: bool = False,
                 tta_scales: Optional[tuple] = None, tta_flip: bool = False):
        self.net = net
        self.params = params
        self.state = state
        self.crf = crf
        # return (raw_preds, crf_preds) from ONE model forward — the
        # before/after-CRF comparison (notebook cell 9) without paying the
        # model twice
        self.return_raw = return_raw and crf is not None
        self.n_classes = n_classes or getattr(net, "n_classes", 21)
        h, w = net.sz
        # pad target for ragged batches (see __call__); the full device
        # count satisfies both the P('data') and P(('data','space')) specs
        self._mesh_n = mesh.devices.size if mesh is not None else 1

        def model_preds(params, state, img, shard_local=False):
            # argmax of the head logits — equals argmax of apply()'s
            # softmax output while skipping the softmax + f32 upcast over
            # every pixel (SegNet.predict_ids)
            return net.predict_ids(params, state, img,
                                   compute_dtype=compute_dtype,
                                   shard_local=shard_local)

        if tta_scales or tta_flip:
            if spatial:
                raise ValueError("TTA is incompatible with spatial "
                                 "sharding (per-scale resizes would cross "
                                 "the sharded height axis)")
            from deeplab_tpu.ops.resize import resize_bilinear_tf1
            h, w = net.sz
            twins, seen = [], set()
            for s in (tuple(tta_scales) if tta_scales else (1.0,)):
                hs = max(8, int(round(h * s / 8.0)) * 8)
                ws = max(8, int(round(w * s / 8.0)) * 8)
                if (hs, ws) in seen:   # scales that snap to the same size
                    continue           # would double-weight that forward
                seen.add((hs, ws))
                twins.append(net if (hs, ws) == (h, w)
                             else net.at_size((hs, ws)))

            def model_preds(params, state, img, shard_local=False):
                b = img.shape[0]
                acc = jnp.zeros((b, h, w, self.n_classes), jnp.float32)
                for m in twins:
                    im_s = (img if m.sz == (h, w)
                            else resize_bilinear_tf1(img, m.sz))
                    for flip in ((False, True) if tta_flip else (False,)):
                        x = im_s[:, :, ::-1, :] if flip else im_s
                        probs, _ = m.apply(params, state, x,
                                           compute_dtype=compute_dtype,
                                           shard_local=shard_local)
                        probs = probs.reshape((b,) + m.sz
                                              + (self.n_classes,))
                        if flip:
                            probs = probs[:, :, ::-1, :]
                        if m.sz != (h, w):
                            probs = resize_bilinear_tf1(probs, (h, w))
                        acc = acc + probs
                return jnp.argmax(acc, axis=-1)

        def pipeline(params, state, img):
            # The no-mesh Predictor is a single-device program even on a
            # multi-chip host (plain jit targets the default device), so
            # the fused Pallas serving kernels can always engage here —
            # shard_local=True bypasses their len(jax.devices())==1
            # conservative fallback gate.
            raw = model_preds(params, state, img, shard_local=True)
            preds = raw
            if crf is not None:
                preds = mean_field_batched(img, raw, crf, self.n_classes)
            if self.return_raw:
                return raw, preds
            return preds

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from deeplab_tpu.parallel.mesh import (data_sharding,
                                                   replicated_sharding)
            from deeplab_tpu.parallel.mesh import put_replicated
            repl = replicated_sharding(mesh)
            # Optionally shard the image height over the mesh 'space' axis
            # for big-image serving (XLA SPMD inserts the conv halo
            # exchanges — the serving twin of Trainer(spatial=True)).
            data = data_sharding(mesh, spatial=spatial)
            out_data = data_sharding(mesh)
            self.params = put_replicated(params, mesh)
            self.state = put_replicated(state, mesh)
            # Mesh spanning processes (multi-host serving): each process
            # feeds its LOCAL images and gets its local masks back; the
            # global batch is assembled via make_array_from_process_local_
            # data and the output unpacked from addressable shards.
            self._multiproc = any(
                d.process_index != jax.process_index()
                for d in mesh.devices.flat)
            self._in_sharding = data
            if self._multiproc:
                # local rows must tile this process's share of 'data'
                n_local = sum(d.process_index == jax.process_index()
                              for d in mesh.devices.flat)
                self._mesh_n = (n_local if not spatial else
                                n_local // mesh.shape["space"])

            def sharded_pipeline(params, state, img):
                if not spatial:
                    # Data-only mesh: the forward is embarrassingly
                    # data-parallel (eval-mode BN, per-sample pooling), so
                    # run it per-device via shard_map instead of XLA SPMD.
                    # Each program then owns one device, which lets the
                    # fused Pallas serving kernels engage on multi-chip
                    # (ctx.shard_local; they have no SPMD partitioning
                    # rule and would otherwise fall back to XLA).
                    raw = jax.shard_map(
                        lambda p, s, im: model_preds(p, s, im,
                                                     shard_local=True),
                        mesh=mesh, in_specs=(P(), P(), P("data")),
                        out_specs=P("data"), check_vma=False)(
                            params, state, img)
                else:
                    # Spatial sharding needs XLA SPMD's conv halo
                    # exchanges; the fused kernels stay off here.
                    raw = model_preds(params, state, img)
                preds = raw
                if crf is not None:
                    # The CRF is embarrassingly data-parallel and its Pallas
                    # kernels have no SPMD partitioning rule — run it
                    # per-device on local batch shards via shard_map (the
                    # model stays under XLA's SPMD partitioner; under
                    # spatial sharding XLA all-gathers H at this boundary
                    # since the CRF needs whole images).  When the batch
                    # also divides the full mesh, spread CRF images over
                    # BOTH axes so space-replicas don't do redundant work.
                    n_all = mesh.devices.size
                    if spatial and img.shape[0] % n_all == 0:
                        spec = P(("data", "space"))
                    else:
                        spec = P("data")
                    preds = jax.shard_map(
                        lambda im, pr: mean_field_batched(
                            im, pr, crf, self.n_classes),
                        mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                        check_vma=False)(img, raw)
                if self.return_raw:
                    return raw, preds
                return preds

            out_sh = ((out_data, out_data) if self.return_raw else out_data)
            self._fn = jax.jit(sharded_pipeline,
                               in_shardings=(repl, repl, data),
                               out_shardings=out_sh)
        else:
            self._multiproc = False
            self._fn = jax.jit(pipeline)

    def __call__(self, images):
        """images: (B, H, W, 3) raw 0-255 BGR float/uint8 -> (B, H, W) int32
        label maps (CRF-refined when configured).  With ``return_raw`` the
        result is a ``(raw, refined)`` pair of such maps from one forward.

        On a mesh, a batch that does not divide the device count is padded
        (by repeating the last image) up to the next multiple and the pad
        rows are dropped from the output — single images and ragged tails
        serve fine instead of tripping a sharding error."""
        img = jnp.asarray(images, jnp.float32)
        b = img.shape[0]
        if self._mesh_n > 1:
            pad = (-b) % self._mesh_n
            if pad:
                img = jnp.concatenate(
                    [img, jnp.repeat(img[-1:], pad, axis=0)], axis=0)
        if self._multiproc:
            from deeplab_tpu.parallel.mesh import local_batch_rows
            img = jax.make_array_from_process_local_data(
                self._in_sharding, np.asarray(img))
            out = self._fn(self.params, self.state, img)
            if self.return_raw:
                return (local_batch_rows(out[0])[:b],
                        local_batch_rows(out[1])[:b])
            return local_batch_rows(out)[:b]
        out = self._fn(self.params, self.state, img)
        if self.return_raw:
            return np.asarray(out[0])[:b], np.asarray(out[1])[:b]
        return np.asarray(out)[:b]

    def predict_files(self, paths, batch_size: int = 16, workers: int = 4):
        """Stream image FILES through the pipeline, overlapping host
        decode with device compute: a thread pool decodes+resizes the
        next batches (BGR contract, bilinear resize to the model size)
        while the device runs the current one, and results are fetched
        one batch behind the dispatch so the device never waits on the
        host.  Every batch is padded to the fixed ``batch_size``, so the
        whole stream compiles exactly once.

        Yields ``(path, mask)`` pairs in input order (``(path,
        (raw, refined))`` with ``return_raw``).  The reference's analogue
        is the notebook's sequential predict->do_crf loop over generator
        items (cells 7-9), which round-trips the host per image."""
        import collections
        from concurrent.futures import ThreadPoolExecutor
        from deeplab_tpu.data.generator import _imread_bgr
        from deeplab_tpu.data.augment import resize_bilinear

        paths = list(paths)
        workers = max(1, workers)
        h, w = self.net.sz
        batches = [paths[i:i + batch_size]
                   for i in range(0, len(paths), batch_size)]

        def load_batch(bp):
            return np.stack([resize_bilinear(_imread_bgr(p), (w, h))
                             for p in bp]).astype(np.float32)

        def dispatch(X):
            pad = batch_size - X.shape[0]
            if pad:
                X = np.concatenate([X, np.repeat(X[-1:], pad, axis=0)])
            img = np.asarray(X, np.float32)
            if self._mesh_n > 1:
                extra = (-batch_size) % self._mesh_n
                if extra:
                    img = np.concatenate(
                        [img, np.repeat(img[-1:], extra, axis=0)], axis=0)
            if self._multiproc:
                # multi-host mesh: img holds this process's LOCAL rows;
                # assemble the global array the same way __call__ does
                # (device_put on a cross-process sharding raises)
                arr = jax.make_array_from_process_local_data(
                    self._in_sharding, img)
            else:
                arr = jnp.asarray(img)
            return self._fn(self.params, self.state, arr)

        def _rows(out, n):
            # np.asarray on a non-fully-addressable multi-host output
            # raises; unpack this process's rows from its shards instead
            if self._multiproc:
                from deeplab_tpu.parallel.mesh import local_batch_rows
                return local_batch_rows(out)[:n]
            return np.asarray(out)[:n]

        def emit(bp, out, n):
            if self.return_raw:
                raw, ref = _rows(out[0], n), _rows(out[1], n)
                for i, p in enumerate(bp):
                    yield p, (raw[i], ref[i])
            else:
                arr = _rows(out, n)
                for i, p in enumerate(bp):
                    yield p, arr[i]

        window = workers
        with ThreadPoolExecutor(max_workers=workers) as ex:
            decoding = collections.deque()
            inflight = collections.deque()
            bi = 0
            while bi < len(batches) or decoding or inflight:
                while bi < len(batches) and len(decoding) < window:
                    decoding.append((batches[bi],
                                     ex.submit(load_batch, batches[bi])))
                    bi += 1
                if decoding:
                    bp, fut = decoding.popleft()
                    inflight.append((bp, dispatch(fut.result()), len(bp)))
                drained = bi >= len(batches) and not decoding
                while inflight and (len(inflight) > 2 or drained):
                    yield from emit(*inflight.popleft())
