"""Command-line interface: train / evaluate / predict / export-config.

The reference's entry point is a notebook; this CLI covers the same workflow
(notebook cells 0-11) reproducibly:

    python -m deeplab_tpu.cli export-config > config.json
    python -m deeplab_tpu.cli train --config config.json
    python -m deeplab_tpu.cli evaluate --config config.json --weights w.h5
    python -m deeplab_tpu.cli predict --config config.json --weights w.h5 \
        --images img1.jpg img2.jpg --crf --out-dir preds/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _build(cfg, load_weights=False, weights=None):
    from deeplab_tpu.models.seg_model import SegModel
    seg = SegModel(cfg.data.dataset, tuple(cfg.model.image_size))
    seg.set_batch_size(cfg.train.batch_size)
    seg.set_num_epochs(cfg.train.epochs)
    net = seg.create_seg_model(cfg.model.net, n=cfg.model.n_classes,
                               backbone=cfg.model.backbone,
                               load_weights=False,
                               OS=cfg.model.OS, alpha=cfg.model.alpha)
    # keep the facade's weight path consistent with where cmd_train's
    # ModelCheckpoint writes — a non-default checkpoint_dir would otherwise
    # silently break --resume-weights (it would look in 'weights/')
    seg.modelpath = os.path.join(
        cfg.train.checkpoint_dir,
        f"{cfg.model.backbone}_{cfg.model.net}.h5")
    if weights:
        from deeplab_tpu.params import load_keras_h5
        seg.params, seg.state = load_keras_h5(weights, seg.params, seg.state)
    elif load_weights and os.path.exists(seg.modelpath):
        seg.load_weights(net)
    return seg, net


def cmd_train(args):
    from deeplab_tpu.config import Config
    from deeplab_tpu.train.callbacks import (EarlyStopping, ModelCheckpoint,
                                             ReduceLROnPlateau)
    from deeplab_tpu.train.trainer import Trainer
    cfg = Config.load(args.config) if args.config else __default_cfg()
    seg, net = _build(cfg, load_weights=args.resume_weights,
                      weights=args.weights)

    d = cfg.data
    train_gen = seg.create_generators(
        blur=d.blur, crop_shape=d.crop_shape, mode="train",
        n_classes=cfg.model.n_classes, horizontal_flip=d.horizontal_flip,
        vertical_flip=d.vertical_flip, brightness=d.brightness,
        rotation=d.rotation, zoom=d.zoom,
        validation_split=d.validation_split, seed=d.seed,
        do_ahisteq=d.do_ahisteq)
    valid_gen = seg.create_generators(
        blur=0, crop_shape=d.crop_shape, mode="validation",
        n_classes=cfg.model.n_classes, horizontal_flip=False,
        vertical_flip=False, brightness=0.0, rotation=0.0, zoom=0.0,
        validation_split=d.validation_split, seed=d.seed, do_ahisteq=False)

    t = cfg.train
    ckpt_path = os.path.join(t.checkpoint_dir,
                             f"{cfg.model.backbone}_{cfg.model.net}.h5")
    callbacks = [
        ModelCheckpoint(ckpt_path, monitor=t.monitor, mode="max", verbose=1),
        ReduceLROnPlateau(monitor=t.monitor, factor=t.reduce_lr_factor,
                          patience=t.reduce_lr_patience, min_lr=t.min_lr),
        EarlyStopping(monitor=t.monitor, patience=t.early_stop_patience),
    ]
    # Freeze only when actually fine-tuning pretrained weights (notebook
    # cell 5 guards on load_pretrained_weights) — freezing a random trunk
    # would train the head against noise.
    have_weights = bool(args.weights) or (args.resume_weights
                                          and os.path.exists(seg.modelpath))
    freeze = t.freeze_before if (args.finetune and have_weights) else None
    if args.finetune and not have_weights:
        print("note: no pretrained weights loaded; training full network "
              "(freeze policy skipped)")
    trainer = Trainer(net, epochs=t.epochs, callbacks=callbacks, lr=t.lr,
                      epsilon=t.epsilon, decay=t.decay,
                      freeze_before=freeze,
                      spatial=t.spatial, ddp=getattr(t, "ddp", False),
                      seed=t.seed, profile_dir=args.profile_dir)
    if args.resume and not t.state_checkpoint:
        print("warning: --resume given but train.state_checkpoint is not "
              "configured; starting from epoch 0")
    history = trainer.fit(seg.params, seg.state, train_gen, valid_gen,
                          state_checkpoint=t.state_checkpoint,
                          resume_from=t.state_checkpoint if args.resume else None)
    print({k: v[-1] for k, v in history.items() if v})


def cmd_evaluate(args):
    from deeplab_tpu.config import Config
    from deeplab_tpu.viz import calculate_iou
    from deeplab_tpu.data.voc import get_VOC2012_classes
    cfg = Config.load(args.config) if args.config else __default_cfg()
    seg, net = _build(cfg, weights=args.weights)
    seg.set_batch_size(1)
    # default to the TRAINING split fraction so evaluation never overlaps
    # the train set (the reference notebook cell 10 hardcodes 0.05, which
    # can overlap when training used a different split — pass --eval-split
    # 0.05 to reproduce its published numbers verbatim).
    split = (args.eval_split if args.eval_split is not None
             else cfg.data.validation_split)
    gen = seg.create_generators(
        crop_shape=None, mode="validation", n_classes=cfg.model.n_classes,
        horizontal_flip=False, vertical_flip=False, brightness=0.0,
        rotation=0.0, zoom=0.0, validation_split=split, seed=cfg.data.seed,
        do_ahisteq=False)
    predict_fn = None
    if args.tta_scales or args.tta_flip or args.eval_crf:
        # evaluate through the serving pipeline: TTA probability averaging
        # and/or CRF refinement (beyond the reference's cell 10, which
        # always scores the raw forward)
        import jax.numpy as jnp
        from deeplab_tpu.predictor import Predictor
        predictor = Predictor(
            net, seg.params, seg.state,
            crf=_crf_config(cfg) if args.eval_crf else None,
            compute_dtype=jnp.float32,
            tta_scales=(tuple(args.tta_scales) if args.tta_scales
                        else None),
            tta_flip=args.tta_flip)
        predict_fn = predictor
    conf, iou, mean_iou = calculate_iou(net, seg.params, seg.state, gen,
                                        nb_classes=cfg.model.n_classes,
                                        predict_fn=predict_fn)
    names = list(get_VOC2012_classes().values())[:cfg.model.n_classes]
    for n, v in zip(names, iou):
        print(f"{n:>14s}: {v:.4f}")
    print(f"Mean IOU (published metric): {mean_iou:.4f}")


def _precision_dtype(args):
    """--precision {mixed,bf16,f32} (+ legacy --f32 alias) -> compute policy
    accepted by Predictor / save_serving (core.resolve_compute_dtype)."""
    import jax.numpy as jnp
    if getattr(args, "f32", False):
        return jnp.float32
    return {"mixed": "mixed", "bf16": jnp.bfloat16,
            "f32": jnp.float32}[getattr(args, "precision", "mixed")]


def _crf_config(cfg):
    from deeplab_tpu.crf import CrfConfig
    return CrfConfig(
        sxy_gaussian=cfg.crf.sxy_gaussian,
        compat_gaussian=cfg.crf.compat_gaussian,
        sxy_bilateral=cfg.crf.sxy_bilateral,
        srgb=cfg.crf.srgb,
        compat_bilateral=cfg.crf.compat_bilateral,
        n_iters=cfg.crf.n_iters)


def cmd_predict(args):
    import jax
    import jax.numpy as jnp
    from deeplab_tpu.config import Config
    from deeplab_tpu.data.generator import _imread_bgr
    cfg = Config.load(args.config) if args.config else __default_cfg()
    os.makedirs(args.out_dir, exist_ok=True)
    from deeplab_tpu.data.augment import resize_bilinear
    if args.artifact:
        # serve from an AOT-exported artifact (export-serving): no model
        # code, no h5 — geometry and the CRF choice are baked into the file
        from deeplab_tpu.export import load_serving
        art = load_serving(args.artifact)
        use_crf = art.meta.get("crf") is not None
        if (args.notebook_crf or args.tta_scales or args.tta_flip
                or (args.crf and not use_crf)):
            print("note: --crf/--notebook-crf/--tta-* are export-time "
                  "choices baked into the artifact (this one has CRF "
                  f"{'on' if use_crf else 'off'}); flags ignored")
        h, w = art.sz
        for path in args.images:
            bgr = resize_bilinear(_imread_bgr(path),
                                  (w, h)).astype(np.float32)
            _write_prediction(args, path, bgr, art(bgr[None])[0], None,
                              use_crf)
        return
    seg, net = _build(cfg, weights=args.weights)
    h, w = cfg.model.image_size
    use_crf = args.crf and cfg.crf.enabled
    if args.notebook_crf:
        if args.tta_scales or args.tta_flip:
            print("note: --tta-* flags apply to the Predictor pipeline "
                  "only; ignored with --notebook-crf")
        # the reference notebook's per-image path (forward -> host argmax ->
        # do_crf with label compression/remap, utils.py:74-91): cell-7-9
        # exact semantics, at the cost of one XLA compile per distinct
        # per-image label-set SIZE (mean_field's n_labels is static)
        fwd = jax.jit(lambda p, s, x: net.apply(p, s, x)[0])
        predict_plain = predict_crf = None
    else:
        # default serving path: the whole image -> logits -> CRF pipeline
        # as ONE compiled function (Predictor), full n_classes label space —
        # predicting N images with different label sets compiles once, and
        # return_raw yields the before/after-CRF pair from one forward
        from deeplab_tpu.predictor import Predictor
        predictor = Predictor(net, seg.params, seg.state,
                              crf=_crf_config(cfg) if use_crf else None,
                              compute_dtype=jnp.float32,
                              return_raw=use_crf,
                              tta_scales=(tuple(args.tta_scales)
                                          if args.tta_scales else None),
                              tta_flip=args.tta_flip)
    for path in args.images:
        bgr = resize_bilinear(_imread_bgr(path), (w, h)).astype(np.float32)
        if args.notebook_crf:
            probs = fwd(seg.params, seg.state, jnp.asarray(bgr[None]))
            pred = np.argmax(np.asarray(probs), -1)[0].reshape(h, w)
            pred_raw = pred
            if use_crf:
                from deeplab_tpu.crf import do_crf
                pred = do_crf(bgr, pred.astype(np.int32), zero_unsure=False,
                              cfg=_crf_config(cfg))
        elif use_crf:
            raw, refined = predictor(bgr[None])
            pred_raw, pred = raw[0], refined[0]
        else:
            pred_raw = pred = predictor(bgr[None])[0]
        _write_prediction(args, path, bgr, pred, pred_raw, use_crf)


def _write_prediction(args, path, bgr, pred, pred_raw, use_crf):
    """Per-image outputs: mask PNG, VOC-colorized PNG, cell-9 figure."""
    from PIL import Image
    stem = os.path.join(args.out_dir,
                        os.path.splitext(os.path.basename(path))[0])
    out = stem + "_mask.png"
    Image.fromarray(pred.astype(np.uint8), mode="L").save(out)
    # cell-9 style visual artifacts: VOC-colorized mask + side-by-side
    from deeplab_tpu.viz import colorize_mask
    Image.fromarray(colorize_mask(pred)).save(stem + "_color.png")
    try:  # the figure needs matplotlib (optional 'viz' extra)
        from deeplab_tpu.viz import plot_predictions
        panels = [("prediction" + (" + CRF" if use_crf else ""), pred)]
        if use_crf and pred_raw is not None:
            panels.insert(0, ("prediction", pred_raw))
        plot_predictions(bgr, panels, path=stem + "_viz.png")
    except Exception as e:  # matplotlib missing OR a broken backend
        print(f"note: skipping _viz.png ({e})")
    print(f"{path} -> {out} (classes: {sorted(set(pred.flat))})")


def cmd_serve(args):
    import jax.numpy as jnp
    from deeplab_tpu.config import Config
    from deeplab_tpu.serve import BatchingServer
    max_batch = args.max_batch
    if args.artifact:
        from deeplab_tpu.export import load_serving
        art = load_serving(args.artifact)
        pipeline, sz = art, art.sz
        if art.batch is not None:     # fixed-batch artifact bounds batching
            max_batch = min(max_batch, art.batch)
        meta = {"pipeline": "artifact",
                "crf": art.meta.get("crf") is not None}
    else:
        from deeplab_tpu.predictor import Predictor
        cfg = Config.load(args.config) if args.config else __default_cfg()
        seg, net = _build(cfg, load_weights=not args.weights,
                          weights=args.weights)
        if not args.weights and not os.path.exists(seg.modelpath):
            print(f"warning: no --weights and no checkpoint at "
                  f"{seg.modelpath} — serving freshly-initialized "
                  "(untrained) weights")
        use_crf = args.crf and cfg.crf.enabled   # same gate as cmd_predict
        pipeline = Predictor(
            net, seg.params, seg.state,
            crf=_crf_config(cfg) if use_crf else None,
            compute_dtype=_precision_dtype(args))
        sz = net.sz
        meta = {"pipeline": "predictor", "crf": use_crf}
    server = BatchingServer(pipeline, sz, max_batch=max_batch,
                            max_wait_ms=args.max_wait_ms, meta=meta)
    server.serve_forever(host=args.host, port=args.port)


def cmd_export_serving(args):
    import jax.numpy as jnp
    from deeplab_tpu.config import Config
    from deeplab_tpu.export import save_serving
    cfg = Config.load(args.config) if args.config else __default_cfg()
    # like cmd_serve: fall back to the config's checkpoint when --weights is
    # absent, and never silently bake random init into a deployable artifact
    seg, net = _build(cfg, load_weights=not args.weights,
                      weights=args.weights)
    if not args.weights and not os.path.exists(seg.modelpath):
        print(f"warning: no --weights and no checkpoint at {seg.modelpath} "
              "— exporting freshly-initialized (untrained) weights")
    use_crf = args.crf and cfg.crf.enabled       # same gate as cmd_predict
    exp = save_serving(
        args.out, net, seg.params, seg.state,
        crf=_crf_config(cfg) if use_crf else None,
        batch=args.batch,
        compute_dtype=_precision_dtype(args),
        platforms=args.platforms)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"{args.out}: {size_mb:.1f} MB, platforms={list(exp.platforms)}, "
          f"batch={'symbolic' if args.batch is None else args.batch}, "
          f"crf={'on' if use_crf else 'off'}")


def cmd_export_config(args):
    from deeplab_tpu.config import Config
    sys.stdout.write(Config().to_json() + "\n")


def __default_cfg():
    from deeplab_tpu.config import Config
    return Config()


def main(argv=None):
    p = argparse.ArgumentParser(prog="deeplab_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="fine-tune or train the model")
    pt.add_argument("--config")
    pt.add_argument("--weights", help="initial weights h5")
    pt.add_argument("--resume-weights", action="store_true",
                    help="load weights/{backbone}_{net}.h5 if present")
    pt.add_argument("--resume", action="store_true",
                    help="resume full train state from state_checkpoint")
    pt.add_argument("--finetune", action="store_true", default=True)
    pt.add_argument("--no-finetune", dest="finetune", action="store_false")
    pt.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler device trace of train "
                         "steps 2-4 into this directory (TensorBoard/"
                         "Perfetto)")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("evaluate", help="dataset confusion-matrix IoU")
    pe.add_argument("--config")
    pe.add_argument("--weights")
    pe.add_argument("--eval-split", type=float, default=None,
                    help="validation fraction (default: config's "
                         "validation_split; reference notebook used 0.05)")
    pe.add_argument("--tta-scales", type=float, nargs="+", default=None,
                    help="evaluate with multi-scale TTA probability "
                         "averaging (e.g. 0.75 1.0 1.25)")
    pe.add_argument("--tta-flip", action="store_true",
                    help="also average over horizontal flips")
    pe.add_argument("--eval-crf", action="store_true",
                    help="score CRF-refined predictions (config's CRF "
                         "parameters) instead of the raw forward")
    pe.set_defaults(fn=cmd_evaluate)

    pp = sub.add_parser("predict", help="predict masks for images")
    pp.add_argument("--config")
    pp.add_argument("--weights")
    pp.add_argument("--images", nargs="+", required=True)
    pp.add_argument("--artifact",
                    help="serve from an export-serving .npz artifact "
                         "instead of building the model (ignores --weights; "
                         "the CRF choice is baked into the artifact)")
    pp.add_argument("--crf", action="store_true")
    pp.add_argument("--notebook-crf", action="store_true",
                    help="use the notebook's per-image compressed-label CRF "
                         "(cells 7-9 exact; recompiles per label-set size) "
                         "instead of the single-compile Predictor pipeline")
    pp.add_argument("--tta-scales", type=float, nargs="+", default=None,
                    help="multi-scale TTA: average softmax probabilities "
                         "over these input scales (e.g. 0.75 1.0 1.25); "
                         "Predictor pipeline only (not --notebook-crf)")
    pp.add_argument("--tta-flip", action="store_true",
                    help="also average over horizontal flips")
    pp.add_argument("--out-dir", default="preds")
    pp.set_defaults(fn=cmd_predict)

    ps = sub.add_parser("serve",
                        help="HTTP inference server with dynamic batching "
                             "(POST /predict -> PNG mask)")
    ps.add_argument("--artifact",
                    help="serve an export-serving .npz artifact")
    ps.add_argument("--config")
    ps.add_argument("--weights", help="weights h5 for the live-Predictor "
                                      "mode (no --artifact)")
    ps.add_argument("--crf", action="store_true",
                    help="CRF refinement (live-Predictor mode)")
    ps.add_argument("--precision", choices=("mixed", "bf16", "f32"),
                    default="mixed",
                    help="compute policy (live-Predictor mode): mixed = f32 "
                         "activations + bf16 MXU (production default, "
                         "f32-level mIoU), bf16 = turbo, f32 = exact parity")
    ps.add_argument("--f32", action="store_true",
                    help="alias for --precision f32")
    ps.add_argument("--host", default="0.0.0.0")
    ps.add_argument("--port", type=int, default=8517)
    ps.add_argument("--max-batch", type=int, default=8,
                    help="dynamic-batching cap per device call")
    ps.add_argument("--max-wait-ms", type=float, default=10.0,
                    help="how long the dispatcher waits to fill a batch "
                         "after the first request arrives")
    ps.set_defaults(fn=cmd_serve)

    px = sub.add_parser("export-serving",
                        help="AOT-export the serving pipeline (model [+CRF]) "
                             "to a self-contained StableHLO .npz artifact")
    px.add_argument("--config")
    px.add_argument("--weights", help="trained weights h5 to bake into the "
                                      "artifact")
    px.add_argument("--out", default="serving.npz")
    px.add_argument("--batch", type=int, default=None,
                    help="fixed batch size (default: symbolic — one "
                         "artifact serves any batch)")
    px.add_argument("--crf", action="store_true",
                    help="include on-device dense-CRF refinement")
    px.add_argument("--precision", choices=("mixed", "bf16", "f32"),
                    default="mixed",
                    help="compute policy to bake into the artifact: mixed = "
                         "f32 activations + bf16 MXU (production default), "
                         "bf16 = turbo, f32 = exact parity")
    px.add_argument("--f32", action="store_true",
                    help="alias for --precision f32")
    px.add_argument("--platforms", nargs="+", default=None,
                    help="lowering targets, e.g. --platforms tpu cpu "
                         "(default: this process's backend)")
    px.set_defaults(fn=cmd_export_serving)

    pc = sub.add_parser("export-config", help="print default config JSON")
    pc.set_defaults(fn=cmd_export_config)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
