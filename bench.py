"""Headline benchmark: 512x512 MobileNetV2-DeepLabV3+ inference throughput.

Baseline target (BASELINE.json): >=2000 images/sec on v5e-8 with CRF, i.e.
250 img/s/chip.  ``vs_baseline`` is measured img/s/chip over 250.

Prints one JSON line per stage (model-only, CRF-only) and the HEADLINE
(model + 5-iteration dense-CRF) as the LAST line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/250}

Timing methodology: dispatches are queued asynchronously (device-side
checksums chain nothing to the host) and fetched once at the end, so the
axon tunnel round-trip (~25 ms) is excluded from the steady-state rate.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: a warm .jax_cache cuts the ~12 min of XLA
# compilation out of repeat runs (first run populates it)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

# BENCH_NET=subpixel benchmarks the pixel-shuffle head variant
NET = os.environ.get("BENCH_NET", "original")
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
WARMUP = 3
ITERS = 20
BASELINE_PER_CHIP = 2000.0 / 8.0  # v5e-8 target split per chip


def timeit(fn, checksum, iters=ITERS):
    """Queue ``iters`` async dispatches, force them with one final fetch."""
    for _ in range(WARMUP):
        np.asarray(checksum(fn()))
    t0 = time.perf_counter()
    sums = [checksum(fn()) for _ in range(iters)]
    np.asarray(jnp.stack(sums)).sum()
    return time.perf_counter() - t0


def emit(name, ips):
    print(json.dumps({
        "metric": f"512x512 VOC {name} images/sec/chip"
                  + ("" if NET == "original" else f" [{NET}]"),
        "value": round(ips, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / BASELINE_PER_CHIP, 3),
    }))


def main():
    from deeplab_tpu.models.seg_model import SegNet

    model = SegNet((512, 512), 21, "mobilenetv2", NET)
    params, state = model.init(jax.random.key(0))

    crf_cfg = None
    try:
        from deeplab_tpu.crf import CrfConfig, mean_field_batched
        # throughput config: color grid at 2.5 sigma, splat subsampled 4x
        # (>=99.0% MAP agreement with the exact mean-field oracle on every
        # committed 21-label golden scene, both backends; see
        # tests/test_crf_goldens.py::test_headline_config_matches_oracle)
        crf_cfg = CrfConfig(color_step=2.5, splat_stride=4)
    except Exception:
        mean_field_batched = None

    @jax.jit
    def model_only(params, state, img):
        # serving argmax path: head logits, no softmax (argmax-invariant)
        return model.predict_ids(params, state, img,
                                 compute_dtype=jnp.bfloat16)

    @jax.jit
    def crf_only(img, preds):
        return mean_field_batched(img, preds, crf_cfg)

    @jax.jit
    def infer(params, state, img):
        preds = model_only(params, state, img)
        if mean_field_batched is not None:
            preds = mean_field_batched(img, preds, crf_cfg)
        return preds

    @jax.jit
    def checksum(x):
        return jnp.sum(x, dtype=jnp.int32)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 512, 512, 3) * 255, jnp.float32)

    # warm the dispatch path: the axon tunnel's first dozen dispatches in a
    # fresh process are slow and would deflate whichever stage runs first
    for _ in range(12):
        np.asarray(checksum(img[:1, :8, :8]))

    t_model = timeit(lambda: model_only(params, state, img), checksum)
    emit("inference (model only)", BATCH * ITERS / t_model)

    if mean_field_batched is not None:
        preds0 = model_only(params, state, img)
        t_crf = timeit(lambda: crf_only(img, preds0), checksum)
        emit("dense-CRF only (5 iters)", BATCH * ITERS / t_crf)

    t_full = timeit(lambda: infer(params, state, img), checksum)
    crf_tag = "+CRF" if mean_field_batched is not None else ""
    emit(f"inference{crf_tag}", BATCH * ITERS / t_full)


if __name__ == "__main__":
    main()
