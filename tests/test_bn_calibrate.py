"""BN recalibration (train/bn_calibrate.py) + the fused logits-CE path."""

import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu import core
from deeplab_tpu.losses import (masked_sparse_ce, masked_sparse_ce_logits,
                                sparse_crossentropy_ignoring_last_label,
                                sparse_logits_crossentropy_ignoring_last_label)
from deeplab_tpu.train.bn_calibrate import calibrate_bn
from tests.test_trainer import TinySegNet, SZ, C


def test_calibrate_bn_matches_batch_statistics():
    """Calibrated moving stats equal the average of the batches' raw batch
    statistics — not the momentum-0.99 EMA (which would stay ~initial)."""
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, SZ, SZ, 3).astype(np.float32) * 255
               for _ in range(3)]

    new_state = calibrate_bn(model, params, state, batches)
    # moving VARIANCE jumped all the way to the batch statistic (init 1.0;
    # one EMA step at momentum 0.99 could only move it ~1%)
    var = np.asarray(new_state["trunk_conv_BN"]["moving_variance"])
    assert np.abs(var - 1.0).max() > 0.2
    # and the stats equal the hand-computed average of raw batch stats
    mv = np.asarray(new_state["trunk_conv_BN"]["moving_mean"])
    means = []
    for X in batches:
        _, s1 = core.apply_model(model.forward, params, state,
                                 jnp.asarray(X), bn_calibrate=True)
        means.append(np.asarray(s1["trunk_conv_BN"]["moving_mean"]))
    np.testing.assert_allclose(mv, np.mean(means, axis=0), rtol=1e-5,
                               atol=1e-7)
    # params untouched, original state untouched
    np.testing.assert_array_equal(
        np.asarray(state["trunk_conv_BN"]["moving_mean"]), 0.0)


def test_bn_calibrate_mode_uses_batch_stats_without_dropout():
    """bn_calibrate normalizes with batch stats (like training) but runs
    deterministically (training=False -> no dropout, no rng needed)."""
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    X = jnp.asarray(np.random.RandomState(1).rand(2, SZ, SZ, 3) * 255,
                    jnp.float32)
    out_cal, _ = core.apply_model(model.forward, params, state, X,
                                  bn_calibrate=True)
    out_train, _ = core.apply_model(model.forward, params, state, X,
                                    training=True, rng=jax.random.key(0))
    out_eval, _ = core.apply_model(model.forward, params, state, X)
    np.testing.assert_allclose(np.asarray(out_cal), np.asarray(out_train),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(out_cal), np.asarray(out_eval))


def test_logits_ce_matches_probs_ce():
    """The fused log-softmax CE equals the reference probs CE (away from
    the 1e-7 clip) including void masking and temporal weighting."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(3, 50, C + 0).astype(np.float32) * 3)
    y = jnp.asarray(rng.randint(0, C + 1, (3, 50, 1)).astype(np.float32))
    sw = jnp.asarray(rng.rand(3, 50).astype(np.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(
        np.asarray(sparse_logits_crossentropy_ignoring_last_label(y, logits)),
        np.asarray(sparse_crossentropy_ignoring_last_label(y, probs)),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(masked_sparse_ce_logits(y, logits, sw)),
        float(masked_sparse_ce(y, probs, sw)), rtol=1e-5)
    # (B, H, W) label form == (B, N, 1) form
    np.testing.assert_allclose(
        np.asarray(sparse_logits_crossentropy_ignoring_last_label(
            y[..., 0], logits)),
        np.asarray(sparse_logits_crossentropy_ignoring_last_label(y, logits)))


def test_served_batch_sizes_metadata():
    from deeplab_tpu.data.generator import ArrayBatcher
    from deeplab_tpu.train.trainer import _served_batch_sizes
    X = np.zeros((10, 4, 4, 3), np.float32)
    Y = np.zeros((10, 16), np.float32)
    assert _served_batch_sizes(ArrayBatcher(X, Y, 4)) == [4]       # 2 full
    assert _served_batch_sizes(ArrayBatcher(X[:3], Y[:3], 4)) == [3]
    assert _served_batch_sizes(ArrayBatcher(X, Y, 3)) == [3]       # floor

    class Unknown:
        def __getitem__(self, i):
            return X[:5], Y[:5], {"pred_mask": Y[:5]}

        def __len__(self):
            return 2

    assert _served_batch_sizes(Unknown()) == [5]  # materializing fallback
