"""CRF: TPU grid mean-field vs the exact O(N^2) oracle (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from deeplab_tpu.crf import (CrfConfig, do_crf, mean_field,
                             mean_field_batched, unary_from_labels)
from deeplab_tpu.crf.brute import (exact_crf_map, exact_mean_field,
                                   unary_from_labels_np)


def _toy_scene(h=24, w=24, seed=0):
    """Two color regions with a noisy label mask straddling the boundary."""
    rng = np.random.RandomState(seed)
    im = np.zeros((h, w, 3), np.float32)
    im[:, :w // 2] = [200, 40, 40]
    im[:, w // 2:] = [40, 40, 200]
    im += rng.randn(h, w, 3) * 8
    im = np.clip(im, 0, 255)
    mask = np.zeros((h, w), np.int32)
    mask[:, w // 2:] = 1
    # inject label noise
    noise = rng.rand(h, w) < 0.15
    mask[noise] = 1 - mask[noise]
    return im, mask


def test_unary_from_labels_matches_numpy():
    labels = np.array([0, 1, 2, 1, 0])
    for zero_unsure in (True, False):
        ref = unary_from_labels_np(labels, 3, 0.7, zero_unsure)  # (L, N)
        got = np.asarray(unary_from_labels(jnp.asarray(labels), 3, 0.7,
                                           zero_unsure))         # (N, L)
        np.testing.assert_allclose(got.T, ref, rtol=1e-6)


def test_mean_field_q_close_to_exact():
    im, mask = _toy_scene()
    n_labels = 2
    labels = mask.reshape(-1)
    U = unary_from_labels_np(labels, n_labels, 0.7, zero_unsure=False)
    q_exact = exact_mean_field(im, U, n_iters=5)                  # (L, N)
    q_grid = np.asarray(mean_field(
        jnp.asarray(im), jnp.asarray(U.T), CrfConfig(), n_labels))  # (N, L)
    # same argmax on the overwhelming majority of pixels
    agree = np.mean(np.argmax(q_grid, -1) == np.argmax(q_exact, 0))
    assert agree > 0.97, f"only {agree:.3f} agreement with exact mean field"


def test_do_crf_matches_exact_oracle():
    im, mask = _toy_scene(seed=1)
    ours = do_crf(im, mask, zero_unsure=False)
    oracle = exact_crf_map(im, mask, zero_unsure=False)
    agree = np.mean(ours == oracle)
    assert agree > 0.97, f"only {agree:.3f} label agreement with oracle"


def test_do_crf_denoises_toward_color_edges():
    im, mask = _toy_scene(seed=2)
    clean = np.zeros_like(mask)
    clean[:, mask.shape[1] // 2:] = 1
    noisy_err = np.mean(mask != clean)
    out = do_crf(im, mask, zero_unsure=False)
    crf_err = np.mean(out != clean)
    assert crf_err < noisy_err * 0.5, (noisy_err, crf_err)


def test_do_crf_label_remap():
    """Original (non-contiguous) label ids are restored (utils.py:87-91)."""
    im, mask = _toy_scene(seed=3)
    mask = np.where(mask == 1, 15, 7)  # ids 7 and 15
    out = do_crf(im, mask, zero_unsure=False)
    assert set(np.unique(out)) <= {7, 15}


def test_do_crf_single_label_noop():
    im, _ = _toy_scene()
    mask = np.full(im.shape[:2], 4, np.int32)
    out = do_crf(im, mask, zero_unsure=False)
    np.testing.assert_array_equal(out, mask)


def test_do_crf_zero_unsure_matches_oracle():
    """zero_unsure=True treats label 0 as 'unsure' (uniform unary).  Note the
    reference's remap (utils.py:89-90) is off by one in this mode: rows are
    shifted by the labels-1 indexing of unary_from_labels but remapped with
    colors[row].  We reproduce that faithfully; the oracle shares it, so the
    two must agree — and the unsure patch resolves to row 0 (displayed as
    colors[0]==0 under the quirk)."""
    im, mask = _toy_scene(seed=4)
    m = mask + 1          # labels 1, 2
    m[5:8, 5:8] = 0       # unsure patch inside the left region
    out = do_crf(im, m, zero_unsure=True)
    oracle = exact_crf_map(im, m, zero_unsure=True)
    assert np.mean(out == oracle) > 0.97
    # the patch resolves to the surrounding region's row (0 under the quirk)
    assert np.mean(out[5:8, 5:8] == oracle[5:8, 5:8]) > 0.8


def test_coarse_color_grid_still_matches_oracle():
    """color_step=2 (the throughput config) must stay close to the exact
    oracle on label maps."""
    im, mask = _toy_scene(seed=5)
    ours = do_crf(im, mask, zero_unsure=False, cfg=CrfConfig(color_step=2.0))
    oracle = exact_crf_map(im, mask, zero_unsure=False)
    agree = np.mean(ours == oracle)
    assert agree > 0.95, f"only {agree:.3f} agreement at color_step=2"


def test_fast_config_still_matches_oracle():
    """The full throughput config (coarse color grid + strided splat) must
    stay close to the exact oracle."""
    im, mask = _toy_scene(seed=6)
    ours = do_crf(im, mask, zero_unsure=False,
                  cfg=CrfConfig(color_step=2.0, splat_stride=2))
    oracle = exact_crf_map(im, mask, zero_unsure=False)
    agree = np.mean(ours == oracle)
    assert agree > 0.94, f"only {agree:.3f} agreement in fast config"


def test_large_multilabel_scene_matches_oracle():
    """5-label 48x48 structured scene: both configs vs the exact oracle."""
    rng = np.random.RandomState(0)
    H = W = 48
    im = np.zeros((H, W, 3), np.float32)
    im[:H // 2, :W // 2] = [200, 50, 50]
    im[:H // 2, W // 2:] = [50, 200, 50]
    im[H // 2:, :W // 2] = [50, 50, 200]
    im[H // 2:, W // 2:] = [200, 200, 60]
    yy, xx = np.mgrid[:H, :W]
    circ = (yy - 24) ** 2 + (xx - 24) ** 2 < 100
    im[circ] = [230, 230, 230]
    im = np.clip(im + rng.randn(H, W, 3) * 6, 0, 255)
    mask = np.zeros((H, W), np.int32)
    mask[:H // 2, W // 2:] = 1
    mask[H // 2:, :W // 2] = 2
    mask[H // 2:, W // 2:] = 3
    mask[circ] = 4
    noise = rng.rand(H, W) < 0.12
    mask[noise] = rng.randint(0, 5, noise.sum())

    oracle = exact_crf_map(im, mask, zero_unsure=False)
    for cfg in (CrfConfig(), CrfConfig(color_step=2.0, splat_stride=2)):
        ours = do_crf(im, mask, zero_unsure=False, cfg=cfg)
        agree = np.mean(ours == oracle)
        assert agree > 0.99, (cfg, agree)


def test_half_resolution_mode_close_to_oracle():
    """resolution_scale=2 (serving knob) stays close to the full-res oracle
    away from a thin boundary band."""
    im, mask = _toy_scene(h=32, w=32, seed=7)
    imgs = jnp.asarray(im[None])
    masks = jnp.asarray(mask[None])
    out = np.asarray(mean_field_batched(
        imgs, masks, CrfConfig(resolution_scale=2), 2))[0]
    oracle = exact_crf_map(im, mask, zero_unsure=False)
    assert out.shape == mask.shape
    agree = np.mean(out == oracle)
    assert agree > 0.9, f"only {agree:.3f} agreement at half resolution"


def test_mean_field_batched_shapes():
    im, mask = _toy_scene()
    imgs = jnp.asarray(np.stack([im, im]))
    masks = jnp.asarray(np.stack([mask, 1 - mask]))
    out = np.asarray(mean_field_batched(imgs, masks, CrfConfig(), 4))
    assert out.shape == (2, 24, 24)
    assert out.max() < 4
