"""Xception entry-flow attack: space-to-depth stem experiment (VERDICT r4 #6).

The 3x3/s2 stem conv (entry_flow_conv1_1, reference deeplabv3p.py:283-287)
reads 512^2 x 3 input — 3 input channels is <3% MXU lane utilization.
Space-to-depth(2) rewrites it EXACTLY as a 2x2/s1 conv over 256^2 x 12:

  packed channel slot (dy, dx, c) of s2d pixel (i, j) = input (2i+dy, 2j+dx, c)
  s2d kernel tap (a, b), slot (dy, dx, c)            = W[2a+dy, 2b+dx, c]
  (zero where 2a+dy > 2 or 2b+dx > 2 — the k3 window never reads there)

TF SAME padding for k3/s2 on 512 is (0, 1); in s2d coordinates that is a
(0, 1) pad of the 256 axis whose dy=1 sub-row is only read by zero taps,
so zero-padding stays exact.  Same trick as the MLPerf ResNet stem.

This script A/Bs the FULL bench xception serving forward (bs=16, bf16
model-only) with the stem monkeypatched, plus an f32 exact-parity check.

Usage:  python tools/xception_s2d_experiment.py        # TPU: timing A/B
        JAX_PLATFORMS=cpu python tools/xception_s2d_experiment.py parity
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import deeplab_tpu.models.xception as xcep  # noqa: E402
from deeplab_tpu.models.seg_model import SegNet  # noqa: E402
from deeplab_tpu.ops import init as inits  # noqa: E402
from deeplab_tpu.ops.conv import _conv  # noqa: E402

SZ = (512, 512)
_ORIG_CONV2D = xcep.conv2d


def s2d_conv2d(ctx, x, filters, kernel_size, name, stride=1, **kw):
    if name != "entry_flow_conv1_1":
        return _ORIG_CONV2D(ctx, x, filters, kernel_size, name,
                            stride=stride, **kw)
    B, H, W, C = x.shape
    w = ctx.param(name, "kernel", (3, 3, C, filters), inits.glorot_uniform)
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    w2 = jnp.zeros((2, 2, 4 * C, filters), w.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(2):
                for dx in range(2):
                    r, s = 2 * a + dy, 2 * b + dx
                    if r < 3 and s < 3:
                        slot = (dy * 2 + dx) * C
                        w2 = w2.at[a, b, slot:slot + C, :].set(w[r, s])
    return _conv(xs, w2, 1, 1, [(0, 1), (0, 1)],
                 mxu_bf16=getattr(ctx, "mxu_bf16", False))


def build(bs=16):
    xm = SegNet(SZ, 21, "xception", "original")
    xp, xs = xm.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(bs, SZ[0], SZ[1], 3) * 255, jnp.float32)

    def infer(p, s, im, dtype):
        return xm.predict_ids(p, s, im, compute_dtype=dtype,
                              shard_local=True)

    return xm, xp, xs, img, infer


def parity():
    xm, xp, xs, img, infer = build(bs=2)
    base = jax.jit(lambda p, s, im: infer(p, s, im, jnp.float32))(xp, xs, img)
    try:
        xcep.conv2d = s2d_conv2d
        s2d = jax.jit(lambda p, s, im: infer(p, s, im, jnp.float32))(xp, xs, img)
    finally:
        xcep.conv2d = _ORIG_CONV2D
    agree = float(jnp.mean((base == s2d).astype(jnp.float32)))
    print(f"f32 argmax agreement: {agree:.6f}")
    # also check the raw stem activation exactly
    from deeplab_tpu import core

    def stem_only(ctx, im):
        return xcep.conv2d(ctx, im.astype(ctx.compute_dtype), 32, 3,
                           "entry_flow_conv1_1", stride=2)

    a, _ = core.apply_model(stem_only, xp, xs, img)
    try:
        xcep.conv2d = s2d_conv2d
        b, _ = core.apply_model(stem_only, xp, xs, img)
    finally:
        xcep.conv2d = _ORIG_CONV2D
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"stem activation max |diff| (f32): {err:.3e}")
    assert agree == 1.0 and err < 1e-4, "s2d stem is NOT equivalent"
    print("PARITY OK")


def timed(fn, *args, iters=20, warmup=4, blocks=6):
    """bench.timeit methodology: device-side checksums chain the async
    dispatches, ONE fetch forces the block (the axon tunnel makes
    block_until_ready unreliable as a fence), min over stable blocks."""
    checksum = lambda r: r[:, ::97, ::97].sum()
    for _ in range(warmup):
        np.asarray(checksum(fn(*args)))
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        sums = [checksum(fn(*args)) for _ in range(iters)]
        np.asarray(jnp.stack(sums)).sum()
        dt = (time.perf_counter() - t0) / iters
        stop = dt > best * 0.98
        best = min(best, dt)
        if stop:
            break
    return best


def ab(bs=16):
    xm, xp, xs, img, infer = build(bs=bs)
    f = jax.jit(lambda p, s, im: infer(p, s, im, jnp.bfloat16))
    dt0 = timed(f, xp, xs, img)
    try:
        xcep.conv2d = s2d_conv2d
        g = jax.jit(lambda p, s, im: infer(p, s, im, jnp.bfloat16))
        dt1 = timed(g, xp, xs, img)
    finally:
        xcep.conv2d = _ORIG_CONV2D
    rec = {"metric": "xception_s2d_stem_model_only",
           "bs": bs,
           "baseline_img_s": round(bs / dt0, 2),
           "s2d_img_s": round(bs / dt1, 2),
           "speedup_pct": round((dt0 / dt1 - 1) * 100, 2)}
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parity":
        parity()
    else:
        ab()
