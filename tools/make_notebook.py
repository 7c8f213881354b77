"""Build + execute examples/segmentation.ipynb (VERDICT r2 missing#3/#10).

The reference's user-facing entry point is a notebook
(/root/reference/segmentation.ipynb, cells 0-11); this generates the
like-for-like deliverable for the TPU rebuild, parameterized to run
top-to-bottom on the committed miniature real-photo dataset
(tests/data/mini_voc) so it executes anywhere in minutes — swap the
`dataset` path and sizes in cell 0 for real VOC on a TPU VM.

Run from the repo root:
    python tools/make_notebook.py           # build + execute (figures baked)
    python tools/make_notebook.py --no-run  # build only
"""

import argparse
import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "examples", "segmentation.ipynb")


def md(src):
    return nbf.v4.new_markdown_cell(src)


def code(src):
    return nbf.v4.new_code_cell(src.strip("\n"))


CELLS = [
    md("""# DeepLabV3+ semantic segmentation — TPU-native (JAX) rebuild

The reference repo's workflow (`segmentation.ipynb`, cells 0-11) on the
`deeplab_tpu` framework: build → fine-tune → compare ± dense-CRF →
dataset-level "Mean IOU".  This copy runs on the committed miniature
real-photo dataset so it executes end-to-end in minutes on CPU; point
`dataset` at a real `VOCdevkit/VOC2012` (SBD-augmented layout) and raise
the sizes to reproduce the reference's published setting on a TPU VM."""),
    # ---- cell 0: config (reference cell 0) ----
    code("""
%matplotlib inline
import os, sys
sys.path.insert(0, os.path.abspath(".."))  # run from examples/
import numpy as np
import jax

from deeplab_tpu import SegModel
from deeplab_tpu.train import (EarlyStopping, ModelCheckpoint,
                               ReduceLROnPlateau, Trainer)

# -- config (reference notebook cell 0: 512x512, bs=2, VOC path) --
dataset = os.path.abspath("../tests/data/mini_voc")
image_size = (64, 64)
batch_size = 4
n_classes = 3            # 21 for real VOC
backbone = "mobilenetv2"  # or 'xception'
better_model = False      # True -> subpixel + ICNR head
epochs = 100
net = "subpixel" if better_model else "original"
print(f"Backbone: {backbone}\\nNet: {net}\\nImage size: {image_size}")
"""),
    md("## Build the model (reference cell 2)\n"
       "`create_seg_model` builds the DeepLabV3+ trunk, truncates at the "
       "reference's `layers[-5]` point and attaches the chosen head."),
    code("""
SegClass = SegModel(dataset, image_size)
SegClass.set_batch_size(batch_size)
SegClass.set_num_epochs(epochs)
model = SegClass.create_seg_model(net=net, n=n_classes, backbone=backbone)
from deeplab_tpu.core import param_count
print("params:", param_count(SegClass.params))
print("weights path:", SegClass.modelpath)
"""),
    md("## Generators (reference cell 4)\n"
       "Asymmetric augmentation: blur/flip/brightness/zoom on train, "
       "nothing on validation; byte-identical seeded split."),
    code("""
import random
random.seed(0); np.random.seed(0)  # deterministic augmentation stream
train_gen = SegClass.create_generators(
    mode="train", n_classes=n_classes, crop_shape=(64, 64),
    horizontal_flip=True, vertical_flip=False, blur=0, brightness=0.1,
    rotation=0.0, zoom=0.05, validation_split=0.2, seed=7,
    do_ahisteq=False)
valid_gen = SegClass.create_generators(
    mode="validation", n_classes=n_classes, crop_shape=False,
    horizontal_flip=False, vertical_flip=False, blur=0, brightness=0.0,
    rotation=0.0, zoom=0.0, validation_split=0.2, seed=7, do_ahisteq=False)
len(train_gen), len(valid_gen)
"""),
    md("## Train (reference cell 5)\n"
       "Callbacks: best-`val_Jaccard` checkpoint, LR-plateau, early stop. "
       "(With pretrained weights you would freeze everything before "
       "`concat_projection` — `Trainer(freeze_before=...)`.)"),
    code("""
os.makedirs(os.path.dirname(SegClass.modelpath) or ".", exist_ok=True)
callbacks = [
    ModelCheckpoint(SegClass.modelpath, monitor="val_Jaccard", mode="max"),
    # (with pretrained weights add ReduceLROnPlateau(monitor="val_Jaccard")
    # as in reference cell 5; from random init that monitor is frozen
    # noise until the BN stats are recalibrated, so it would only decay
    # the LR prematurely)
    EarlyStopping(monitor="val_Jaccard", patience=100),
]
trainer = Trainer(model, epochs=epochs, lr=1e-3, callbacks=callbacks,
                  verbose=0, seed=0)
history = trainer.fit(SegClass.params, SegClass.state, train_gen, valid_gen)
print("final:", {k: round(v[-1], 3) for k, v in history.items()})
"""),
    md("From-scratch note: the reference fine-tunes *pretrained* weights, "
       "whose BatchNorm moving stats are already sensible.  From random "
       "init with Keras momentum 0.999 they lag the trained batch stats, "
       "so we recalibrate them before eval (a few forward passes)."),
    code("""
from deeplab_tpu.train.bn_calibrate import calibrate_bn
cal_batches = [train_gen[i][0].copy() for i in range(len(train_gen))]
state_cal = calibrate_bn(model, trainer.params, trainer.state, cal_batches)
"""),
    md("## Predictions ± dense CRF (reference cells 7-9)\n"
       "The on-device dense-CRF mean field replaces pydensecrf; "
       "`do_crf` keeps the notebook's exact per-image semantics."),
    code("""
import jax.numpy as jnp
from deeplab_tpu.crf import CrfConfig, do_crf
from deeplab_tpu.viz import mIOU, plot_predictions

x, y, _ = valid_gen[0]
fwd = jax.jit(lambda p, s, im: model.apply(p, s, im)[0])
probs = np.asarray(fwd(trainer.params, state_cal, jnp.asarray(x)))
i = 0
pred = probs.argmax(-1)[i].reshape(image_size)
gt = y[i, :, 0].reshape(image_size).astype(int)
crf_cfg = CrfConfig(sxy_bilateral=16.0)  # sxy 80 for 512px images
pred_crf = do_crf(x[i], pred.astype(np.int32), zero_unsure=False,
                  cfg=crf_cfg)
print("sample mIOU (no CRF):", mIOU(gt, pred))
print("sample mIOU (+CRF):  ", mIOU(gt, pred_crf))
fig = plot_predictions(x[i], [("ground truth", gt), ("prediction", pred),
                              ("prediction + CRF", pred_crf)])
fig
"""),
    md("## Dataset evaluation (reference cells 10-11)\n"
       "One device-side bincount replaces the per-pixel Python loop; the "
       "row-normalized confusion diagonal's mean is the published "
       "\"Mean IOU\" (`examples/iou.JPG`)."),
    code("""
from deeplab_tpu.viz import calculate_iou, plot_confusion_matrix
conf, iou, mean_iou = calculate_iou(model, trainer.params, state_cal,
                                    valid_gen, nb_classes=n_classes)
for c, v in enumerate(iou):
    print(f"class {c}: IoU {v:.3f}")
print('Published-metric "Mean IOU":', round(mean_iou, 4))
"""),
    code("""
import matplotlib.pyplot as plt
plt.figure(figsize=(5, 4.5))
plot_confusion_matrix(conf, classes=[str(c) for c in range(n_classes)],
                      normalize=True, title=f"Mean IOU: {mean_iou:.3f}")
plt.gcf()
"""),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-run", action="store_true")
    args = ap.parse_args()
    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {"name": "python3", "language": "python",
                                 "display_name": "Python 3"}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if not args.no_run:
        from nbclient import NotebookClient
        # override, not setdefault: the dev shell exports JAX_PLATFORMS=axon
        # (TPU tunnel) and the kernel subprocess inherits it
        os.environ["JAX_PLATFORMS"] = "cpu"
        # ... and keep the sitecustomize TPU-plugin registration out of the
        # kernel subprocess (tunnel backoffs) — see deeplab_tpu/hostenv.py
        sys.path.insert(0, REPO)
        from deeplab_tpu.hostenv import strip_tpu_plugin_env
        strip_tpu_plugin_env(os.environ)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(REPO, ".jax_cache"))
        client = NotebookClient(nb, timeout=1800,
                                resources={"metadata": {"path":
                                                        os.path.join(
                                                            REPO,
                                                            "examples")}})
        client.execute()
    with open(OUT, "w") as f:
        nbf.write(nb, f)
    print("wrote", OUT)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
