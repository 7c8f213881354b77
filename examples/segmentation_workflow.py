"""End-to-end workflow mirroring the reference notebook (segmentation.ipynb).

Cell-by-cell equivalence:
  cell 0   config + SegModel facade
  cell 2   model build (+optional pretrained weights) — original or subpixel
  cell 4   asymmetric train/valid generators
  cell 5   freeze-to-concat_projection fine-tune with callbacks
  cells 7-9  load two checkpoints, compare +/- CRF on a validation sample
  cells 10-11  dataset confusion-matrix IoU ("Mean IOU" published metric)

Run: python examples/segmentation_workflow.py --dataset /path/to/VOC2012 \
        [--backbone mobilenetv2] [--better-model] [--epochs 10]
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--backbone", default="mobilenetv2",
                    choices=["mobilenetv2", "xception"])
    ap.add_argument("--better-model", action="store_true",
                    help="subpixel + ICNR head (notebook better_model flag)")
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--load-pretrained", action="store_true")
    ap.add_argument("--out-dir", default="weights")
    args = ap.parse_args()

    import jax
    from deeplab_tpu import SegModel
    from deeplab_tpu.data.voc import get_VOC2012_classes
    from deeplab_tpu.losses import sparse_crossentropy_ignoring_last_label  # noqa: F401
    from deeplab_tpu.metrics import Jaccard  # noqa: F401
    from deeplab_tpu.train import (EarlyStopping, ModelCheckpoint,
                                   ReduceLROnPlateau, Trainer)
    from deeplab_tpu.viz import calculate_iou, mIOU

    # ---- cell 0: config ----
    image_size = tuple(args.image_size)
    n_classes = len(get_VOC2012_classes()) - 1
    net = "subpixel" if args.better_model else "original"
    print(f"Backbone: {args.backbone}\nN classes: {n_classes}"
          f"\nImage size: {image_size}\nBatch size: {args.batch_size}")

    SegClass = SegModel(args.dataset, image_size)
    SegClass.set_batch_size(args.batch_size)
    SegClass.set_num_epochs(args.epochs)

    # ---- cell 2: model ----
    model = SegClass.create_seg_model(net=net, n=n_classes,
                                      backbone=args.backbone,
                                      load_weights=args.load_pretrained)
    print("Weights path:", SegClass.modelpath)

    # ---- cell 4: generators (asymmetric augmentation) ----
    train_generator = SegClass.create_generators(
        blur=5, crop_shape=None, mode="train", n_classes=n_classes,
        horizontal_flip=True, vertical_flip=False, brightness=0.3,
        rotation=False, zoom=0.1, validation_split=0.15, seed=7,
        do_ahisteq=False)
    valid_generator = SegClass.create_generators(
        blur=0, crop_shape=None, mode="validation", n_classes=n_classes,
        horizontal_flip=True, vertical_flip=False, brightness=0.1,
        rotation=False, zoom=0.05, validation_split=0.15, seed=7,
        do_ahisteq=False)

    # ---- cell 5: callbacks + fine-tune ----
    os.makedirs(args.out_dir, exist_ok=True)
    SegClass.modelpath = os.path.join(args.out_dir,
                                      f"{args.backbone}_{net}.h5")
    monitor = "val_Jaccard"
    callbacks = [
        ModelCheckpoint(SegClass.modelpath, monitor=monitor, mode="max",
                        verbose=1),
        ReduceLROnPlateau(monitor=monitor, factor=0.5, patience=5,
                          min_lr=1e-6),
        EarlyStopping(monitor=monitor, patience=100),
    ]
    trainer = Trainer(model, epochs=args.epochs, callbacks=callbacks,
                      lr=7e-4, epsilon=1e-8, decay=1e-6,
                      freeze_before=("concat_projection"
                                     if args.load_pretrained else None))
    history = trainer.fit(SegClass.params, SegClass.state, train_generator,
                          valid_generator)
    SegClass.params, SegClass.state = trainer.params, trainer.state
    print("final:", {k: round(v[-1], 4) for k, v in history.items() if v})

    # ---- cells 7-9: reload best checkpoint, compare +/- CRF ----
    if os.path.exists(SegClass.modelpath):
        SegClass.load_weights(model)
    else:
        print("note: no best checkpoint written (validation too small?); "
              "using final weights")
    i = np.random.randint(0, max(len(valid_generator), 1))
    x, y, _ = valid_generator[i]
    probs, _ = model.apply(SegClass.params, SegClass.state, x)
    preds = np.argmax(np.asarray(probs), -1)[0].reshape(image_size)
    gt = y[0].reshape(image_size).astype("int32")
    print("sample mIOU (no CRF):", mIOU(gt, preds))

    from deeplab_tpu.crf import do_crf
    MAP = do_crf(x[0], preds.astype("int32"), zero_unsure=False)
    print("sample mIOU (+CRF):  ", mIOU(gt, MAP))

    # ---- cell 9: side-by-side image / GT / prediction / +CRF figure ----
    try:  # matplotlib (and a working backend) is the optional 'viz' extra
        from deeplab_tpu.viz import plot_predictions
        fig_path = os.path.join(os.path.dirname(SegClass.modelpath) or ".",
                                "sample_prediction.png")
        plot_predictions(x[0], [("ground truth", gt), ("prediction", preds),
                                ("prediction + CRF", MAP)], path=fig_path)
        print("wrote", fig_path)
    except Exception as e:
        print("note: skipping figure:", e)

    # ---- cells 10-11: dataset confusion-matrix IoU ----
    SegClass.set_batch_size(1)
    eval_gen = SegClass.create_generators(
        crop_shape=None, mode="validation", n_classes=n_classes,
        horizontal_flip=False, vertical_flip=False, brightness=0,
        rotation=False, zoom=0, validation_split=0.05, seed=7,
        do_ahisteq=False)
    conf_m, iou, mean_iou = calculate_iou(model, SegClass.params,
                                          SegClass.state, eval_gen,
                                          nb_classes=n_classes)
    print(f'Published-metric "Mean IOU": {mean_iou:.4f}')


if __name__ == "__main__":
    main()
