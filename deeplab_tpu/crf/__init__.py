from deeplab_tpu.crf.dense_crf import (CrfConfig, color_band_taps, do_crf,
                                       mean_field, mean_field_batched,
                                       unary_from_labels)

# The exact pydensecrf parameter mirror (reference utils.py:78-86): sxy=3/80,
# srgb=13, compat 3/10, 5 iterations, gt_prob 0.7, bilateral grid sampled at
# 1 sigma with gaussian taps.  Oracle MAP agreement (committed goldens,
# tests/test_crf_goldens.py): min 0.9939 over the five scenes.
FAITHFUL_CONFIG = CrfConfig()

# Reference-quality FAST config: the same reference kernel parameters with a
# better color quadrature — nonnegative least-squares band taps on a 1.7x
# coarser grid (nc 21 -> 13).  Matches or beats the parameter mirror's
# oracle agreement on EVERY committed golden (min 0.9940 vs 0.9939) at
# ~2.8x the speed (the splat/slice matmuls scale with the grid volume).
FAST_FAITHFUL_CONFIG = CrfConfig(color_step=1.7, color_taps="nnls")

# Throughput serving config (the bench headline): coarse grid + 4x
# subsampled splat; lsq taps lift its worst-golden agreement 0.9962->0.9979
# at identical speed.
THROUGHPUT_CONFIG = CrfConfig(color_step=2.5, color_taps="lsq",
                              splat_stride=4)

# Production serving config: selected by DATASET-level mIoU against the
# f32/faithful parity pipeline (tools/grade_production.py, the BASELINE
# "within 0.1 pt" criterion) rather than per-golden MAP agreement.
# Selection ran on the 20-tile SELECT split (512x512, composed with the
# "mixed" model policy, round 5): cs1.5/nnls/st1 +0.17 pt @247 img/s/chip,
# cs1.5/nnls/st2 +0.12 pt @335, cs1.7/nnls/st2 +0.07 pt @353,
# cs1.5/nnls/st4 -0.02 pt @385.  st2 keeps the quality margin at the speed
# the end-to-end 250 img/s/chip target needs (the splat is a kernel
# density estimate — 2x subsampling barely moves a sxy=80 kernel).  The
# criterion number is graded on the DISJOINT 64-tile eval split
# (tests/data/mini_voc_eval) by bench stage "miou".
PRODUCTION_CONFIG = CrfConfig(color_step=1.5, color_taps="nnls",
                              splat_stride=2)
