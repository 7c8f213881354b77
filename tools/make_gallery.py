"""Render the committed example gallery (examples/gallery_exp*.png).

Reference parity: the upstream repo ships a static before/after gallery
(/root/reference/examples/exp1.JPG-exp4.JPG, README.md:29-32) so a reader
sees results without running code.  This script regenerates ours from the
committed real-photo tiles (tests/data/mini_voc) and committed trained
weights (tests/data/mini_voc_trained.h5): for each selected tile it renders

    image | ground truth | prediction | prediction + CRF

with the production serving defaults (Predictor "mixed" policy; CRF is
crf.PRODUCTION_CONFIG) — the same stack tools/grade_production.py grades.

Run from the repo root:  python tools/make_gallery.py
Deterministic given the committed weights/tiles; the PNGs are committed
artifacts, re-run only when the serving stack or weights change.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.grade_production import N_CLASSES, WEIGHTS, _load_tiles  # noqa: E402

OUT_DIR = os.path.join(REPO, "examples")
# Four tiles with distinct subjects (picked once by eye; indices into the
# sorted tile list) — mirrors the reference's four exp*.JPG subjects.
PICKS = (0, 5, 10, 17)


def main(size=(512, 512)):
    import jax

    # reuse the bench's persistent compile cache — the 512x512 model+CRF
    # compiles are the bulk of a cold run
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from deeplab_tpu.crf import PRODUCTION_CONFIG
    from deeplab_tpu.models.seg_model import SegNet
    from deeplab_tpu.params import load_keras_h5
    from deeplab_tpu.predictor import Predictor
    from deeplab_tpu.viz import plot_predictions

    net = SegNet(size, N_CLASSES, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    params, state = load_keras_h5(WEIGHTS, params, state, strict=True)

    X, Y = _load_tiles(size)
    raw = Predictor(net, params, state, crf=None, compute_dtype="mixed")
    crf = Predictor(net, params, state, crf=PRODUCTION_CONFIG,
                    compute_dtype="mixed")

    batch = X[list(PICKS)]
    pred_raw = np.asarray(raw(batch))
    pred_crf = np.asarray(crf(batch))

    for n, idx in enumerate(PICKS, start=1):
        path = os.path.join(OUT_DIR, f"gallery_exp{n}.png")
        plot_predictions(
            X[idx],
            [("ground truth", Y[idx]),
             ("prediction", pred_raw[n - 1]),
             ("prediction + CRF", pred_crf[n - 1])],
            path=path,
        )
        print(f"wrote {os.path.relpath(path, REPO)}")


if __name__ == "__main__":
    main()
