"""Fused-Pallas CRF engine (interpret mode on CPU): config coverage and
oracle-anchored quality.

The Pallas path is the TPU production path (SURVEY.md N2); its cell
geometry (anisotropic, divisor-snapped) differs from the XLA path's square
cells, so the two approximations legitimately diverge on adversarial
noise-only scenes — quality is asserted against the exact O(N^2) oracle
goldens on structured scenes instead (see also test_crf_goldens.py).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from crf_scenes import make_scene
from deeplab_tpu.crf.dense_crf import (CrfConfig, mean_field,
                                       mean_field_batched,
                                       unary_from_labels)

GOLDEN = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "goldens", "crf", "s96_21l.npz"))["golden"]
IM, MASK = make_scene(96, 96, 21, 3)


@pytest.mark.parametrize("stride,cstep,min_agree", [
    (1, 1.0, 0.97), (2, 1.0, 0.97), (1, 2.0, 0.96), (2, 2.0, 0.96)])
def test_pallas_configs_match_oracle(stride, cstep, min_agree):
    cfg = CrfConfig(color_step=cstep, splat_stride=stride, backend="pallas")
    out = np.asarray(mean_field_batched(
        jnp.asarray(IM)[None], jnp.asarray(MASK)[None], cfg, 21))[0]
    agree = np.mean(out == GOLDEN)
    assert agree >= min_agree, (stride, cstep, agree)


def test_resolution_scale_quality():
    """The rs=2 turbo knob stays within its documented >=90% band."""
    cfg = CrfConfig(color_step=2.0, splat_stride=2, resolution_scale=2,
                    backend="pallas")
    out = np.asarray(mean_field_batched(
        jnp.asarray(IM)[None], jnp.asarray(MASK)[None], cfg, 21))[0]
    assert np.mean(out == GOLDEN) >= 0.90


def test_mean_field_unary_api_matches_batched():
    """mean_field (energies in, Q out) and mean_field_batched (hard masks)
    agree through the pallas path."""
    H, W, L = 40, 56, 6
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 255)
    labels = rng.randint(0, L, (H * W,))
    U = unary_from_labels(jnp.asarray(labels), L, 0.7, zero_unsure=False)
    cfg = CrfConfig(sxy_bilateral=16.0, n_iters=3, backend="pallas")
    Q = np.asarray(mean_field(im, U, cfg, L))
    single = Q.argmax(-1).reshape(H, W)
    batched = np.asarray(mean_field_batched(
        im[None], jnp.asarray(labels.reshape(1, H, W)), cfg, L))[0]
    # mean_field keeps caller-supplied f32 unaries; the batched serving path
    # builds bf16 unaries — a few boundary pixels may flip
    assert (single == batched).mean() > 0.99


def test_pallas_xla_same_math_small_sigma():
    """With square 1-sigma cells on both paths (sxy small enough that no
    anisotropic/divisor snapping kicks in), the backends agree pixelwise
    up to bf16 rounding."""
    H, W, L = 32, 32, 5
    rng = np.random.RandomState(1)
    im, mask = make_scene(H, W, L, 2)
    imj, mj = jnp.asarray(im)[None], jnp.asarray(mask)[None]
    kw = dict(sxy_bilateral=16.0, n_iters=3)
    mx = np.asarray(mean_field_batched(imj, mj,
                                       CrfConfig(backend="xla", **kw), L))
    mp = np.asarray(mean_field_batched(imj, mj,
                                       CrfConfig(backend="pallas", **kw), L))
    assert (mx == mp).mean() > 0.98, (mx == mp).mean()


@pytest.mark.parametrize("hw", [(37, 111), (61, 45)])
def test_pallas_odd_sizes(hw):
    """Odd image sizes force maximal cell padding (ny=nx=1 with big pads);
    the valid-mask must keep results consistent with the XLA path."""
    H, W = hw
    L = 7
    im, mask = make_scene(H, W, L, 4)
    imj, mj = jnp.asarray(im)[None], jnp.asarray(mask)[None]
    kw = dict(n_iters=2)  # default sxy_bilateral=80 >> image
    mx = np.asarray(mean_field_batched(imj, mj,
                                       CrfConfig(backend="xla", **kw), L))
    mp = np.asarray(mean_field_batched(imj, mj,
                                       CrfConfig(backend="pallas", **kw), L))
    assert mp.shape == (1, H, W)
    assert (mx == mp).mean() > 0.97, (mx == mp).mean()


def test_do_crf_pallas_label_compression():
    """do_crf's unique-label compression path through the pallas backend
    (zero_unsure remap quirk included)."""
    from deeplab_tpu.crf.dense_crf import do_crf
    H, W = 40, 56
    im, _ = make_scene(H, W, 5, 6)
    rng = np.random.RandomState(0)
    mask = rng.choice([0, 3, 9, 17], size=(H, W))  # sparse label ids
    cfg = CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="pallas")
    out = do_crf(im, mask, zero_unsure=True, cfg=cfg)
    assert out.shape == (H, W)
    assert set(np.unique(out)) <= {0, 3, 9, 17}
    cfg_x = CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="xla")
    out_x = do_crf(im, mask, zero_unsure=True, cfg=cfg_x)
    assert (out == out_x).mean() > 0.97


def test_isolated_offlattice_pixel_keeps_its_label():
    """Regression: with splat_stride > 1, a color-isolated pixel OFF the
    stride lattice has no mass of its own in the subsampled bilateral grid.
    The norm denominator used to clamp at 1e-20 there, sending b_norm to
    1e10 and the message to -b_self*bn^2*q — the pixel got an arbitrary
    label.  The denominator now floors at b_self, so the unary must win."""
    H, W = 64, 128
    im = np.full((H, W, 3), [40.0, 200.0, 40.0], np.float32)
    im[33, 66] = (255.0, 0.0, 0.0)       # saturated red, off the 4-lattice
    mask = np.ones((H, W), np.int64)
    for backend in ("pallas", "xla"):
        cfg = CrfConfig(splat_stride=4, color_step=2.5, backend=backend)
        out = np.asarray(mean_field_batched(
            jnp.asarray(im)[None], jnp.asarray(mask)[None], cfg, 3))[0]
        assert out[33, 66] == 1, (backend, out[33, 66])
        assert (out == 1).all(), backend


def test_xla_backend_non_divisor_stride_falls_back():
    """Regression: _BilateralPlan used to crash on a splat_stride that does
    not divide the cell size; it now falls back to stride 1 exactly like
    _PallasPlan."""
    H, W, L = 32, 32, 4
    im, mask = make_scene(H, W, L, 2)
    cfg = CrfConfig(backend="xla", splat_stride=3)  # 3 does not divide 80
    out = np.asarray(mean_field_batched(
        jnp.asarray(im)[None], jnp.asarray(mask)[None], cfg, L))
    assert out.shape == (1, H, W)


def test_mean_field_honors_resolution_scale():
    """Regression: mean_field/do_crf silently ignored resolution_scale."""
    from deeplab_tpu.crf.dense_crf import unary_from_labels
    H, W, L = 40, 56, 5
    im, mask = make_scene(H, W, L, 3)
    U = unary_from_labels(jnp.asarray(mask.reshape(-1)), L, 0.7,
                          zero_unsure=False)
    base = CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="pallas")
    full = np.asarray(mean_field(jnp.asarray(im), U, base, L))
    half = np.asarray(mean_field(
        jnp.asarray(im), U,
        CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="pallas",
                  resolution_scale=2), L))
    assert half.shape == full.shape
    # the half-res run must still broadly agree with the full-res one
    agree = (half.argmax(-1) == full.argmax(-1)).mean()
    assert agree > 0.85, agree


def test_backend_string_validated():
    with pytest.raises(ValueError):
        CrfConfig(backend="Pallas")
