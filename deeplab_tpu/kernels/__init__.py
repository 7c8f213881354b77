from deeplab_tpu.kernels.crf_fused import (mf_step_planes, pallas_available,
                                           slice_planes, splat_planes)

__all__ = ["mf_step_planes", "pallas_available", "slice_planes",
           "splat_planes"]
