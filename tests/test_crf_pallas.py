"""Parity of the fused-Pallas CRF engine (interpret mode on CPU) vs the XLA
reference path — same mean-field math, different layout/kernels.

The Pallas path is the TPU production path (SURVEY.md N2); the XLA path is
itself validated against the exact O(N^2) oracle in test_crf.py, so
agreement here chains the fused kernels to the oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from deeplab_tpu.crf.dense_crf import (CrfConfig, mean_field,
                                       mean_field_batched,
                                       unary_from_labels)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(0)
    H, W, L = 40, 56, 6  # non-divisible by the cell size: exercises padding
    im = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 255)
    labels = jnp.asarray(rng.randint(0, L, (H * W,)))
    return H, W, L, im, labels


@pytest.mark.parametrize("stride", [1, 2])
def test_mean_field_backend_parity(scene, stride):
    H, W, L, im, labels = scene
    U = unary_from_labels(labels, L, 0.7, zero_unsure=False)
    kw = dict(sxy_bilateral=16.0, n_iters=4, splat_stride=stride)
    Qx = np.asarray(mean_field(im, U, CrfConfig(backend="xla", **kw), L))
    Qp = np.asarray(mean_field(im, U, CrfConfig(backend="pallas", **kw), L))
    agree = (Qx.argmax(-1) == Qp.argmax(-1)).mean()
    assert agree > 0.98, agree
    # Q values match to bf16 rounding except at label-flip boundaries
    assert np.median(np.abs(Qx - Qp)) < 5e-3


@pytest.mark.parametrize("rs", [1, 2])
def test_batched_backend_parity(scene, rs):
    H, W, L, im, labels = scene
    rng = np.random.RandomState(1)
    B = 2
    imgs = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    masks = jnp.asarray(rng.randint(0, L, (B, H, W)), jnp.int32)
    kw = dict(sxy_bilateral=16.0, n_iters=3, resolution_scale=rs)
    mx = np.asarray(mean_field_batched(imgs, masks,
                                       CrfConfig(backend="xla", **kw), L))
    mp = np.asarray(mean_field_batched(imgs, masks,
                                       CrfConfig(backend="pallas", **kw), L))
    assert (mx == mp).mean() > 0.97, (mx == mp).mean()
