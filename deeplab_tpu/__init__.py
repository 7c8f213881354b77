"""deeplab_tpu — TPU-native (JAX/XLA/Pallas) DeepLabV3+ segmentation framework.

A ground-up rebuild of the capabilities of the reference Keras framework
(Golbstein/Keras-segmentation-deeplab-v3.1): DeepLabV3+ with MobileNetV2 and
Xception backbones, ASPP, subpixel (pixel-shuffle, ICNR) heads, void-masked
losses/metrics, an augmenting data pipeline with adaptive per-pixel class
weights, dense-CRF post-processing, and data-parallel + spatially-sharded
training over a TPU device mesh.

Public surface mirrors the reference:
  - ``Deeplabv3`` (reference: deeplabv3p.py:209)  -> models.deeplabv3p.Deeplabv3
  - ``SegModel``  (reference: utils.py:160)       -> models.seg_model.SegModel
  - losses/metrics (reference: utils.py:127-157)  -> losses / metrics modules
  - ``do_crf``    (reference: utils.py:74)        -> crf.do_crf
"""

import os as _os

if not _os.environ.get("DEEPLAB_TPU_WORKER_IMPORT"):
    from deeplab_tpu.core import init_model, apply_model, Ctx
    from deeplab_tpu.models.deeplabv3p import Deeplabv3
    from deeplab_tpu.models.seg_model import SegModel
    from deeplab_tpu.predictor import Predictor
    from deeplab_tpu import losses, metrics
# else: data-pipeline worker / forkserver-preload mode — keep the package
# import jax-free (numpy/PIL only).  The host data path
# (deeplab_tpu.data.generator and its deps) never touches jax; skipping
# the re-exports here keeps forked workers small and fork-safe.

__version__ = "0.1.0"
