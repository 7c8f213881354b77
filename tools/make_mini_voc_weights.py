"""Train the committed mini_voc weights fixture (tests/data/mini_voc_trained.h5).

tools/grade_production.py and tests/test_production_miou.py grade the
production serving pipeline in the baseline's own mIoU units (the
BASELINE.json "mIoU within 0.1 pt" criterion; reference notebook cells
10-11, README.md:34-38).  That comparison needs deterministic,
NON-degenerate predictions — a random-init model predicts one class
everywhere and any pipeline delta trivially vanishes — so this script
fine-tunes MobileNetV2-DeepLab on the committed real-photo dataset
(tests/data/mini_voc, see tools/make_mini_voc.py), recalibrates BN moving
stats (momentum 0.999 barely moves them in a short run), and saves a
Keras-h5 weights file to commit.

Run from the repo root (any backend; TPU is fastest):
    python tools/make_mini_voc_weights.py
"""

import os
import random
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, "tests", "data", "mini_voc")
OUT = os.path.join(REPO, "tests", "data", "mini_voc_trained.h5")
SZ = (128, 128)     # native tile size
N_CLASSES = 3
EPOCHS = 120


def main():
    import jax
    from deeplab_tpu.models.seg_model import SegModel
    from deeplab_tpu.params import save_keras_h5
    from deeplab_tpu.train.bn_calibrate import calibrate_bn
    from deeplab_tpu.train.trainer import Trainer
    from deeplab_tpu.parallel.mesh import get_mesh

    random.seed(0)
    np.random.seed(0)
    seg = SegModel(DATA, SZ)
    seg.set_batch_size(4)
    net = seg.create_seg_model("original", n=N_CLASSES,
                               backbone="mobilenetv2")
    train_gen = seg.create_generators(
        mode="train", n_classes=N_CLASSES, crop_shape=False,
        horizontal_flip=True, vertical_flip=False, blur=0, brightness=0.1,
        rotation=0.0, zoom=0.05, validation_split=0.2, seed=7,
        do_ahisteq=False)
    valid_gen = seg.create_generators(
        mode="validation", n_classes=N_CLASSES, crop_shape=False,
        horizontal_flip=False, vertical_flip=False, blur=0, brightness=0.0,
        rotation=0.0, zoom=0.0, validation_split=0.2, seed=7,
        do_ahisteq=False)

    trainer = Trainer(net, epochs=EPOCHS, lr=1e-3, verbose=1, seed=0,
                      mesh=get_mesh(jax.devices()[:1]))
    hist = trainer.fit(seg.params, seg.state, train_gen, valid_gen)
    print("final loss:", hist["loss"][-1])

    cal = [train_gen[i][0].copy() for i in range(len(train_gen))]
    state = calibrate_bn(net, trainer.params, trainer.state, cal)
    save_keras_h5(OUT, jax.device_get(trainer.params), jax.device_get(state))
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
