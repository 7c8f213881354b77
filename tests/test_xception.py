"""Xception backbone: OS rate tables, decoder, heads, trainability.

The reference's Xception path is dead upstream (the `layers.add` NameError,
deeplabv3p.py:147) — these tests cover the repaired, working implementation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.models.deeplabv3p import Deeplabv3
from deeplab_tpu.models.seg_model import SegModel
from deeplab_tpu.models.xception import rate_table

SZ = 32


def test_rate_tables():
    # deeplabv3p.py:273-282
    assert rate_table(8) == (1, 2, (2, 4), (12, 24, 36))
    assert rate_table(16) == (2, 1, (1, 2), (6, 12, 18))


@pytest.fixture(scope="module")
def xception_os16():
    m = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                  backbone="xception", OS=16)
    params, state = m.init(jax.random.key(0))
    return m, params, state


def test_xception_layer_names(xception_os16):
    _, params, state = xception_os16
    for name in ["entry_flow_conv1_1", "entry_flow_block1_separable_conv1_depthwise",
                 "entry_flow_block2_shortcut", "middle_flow_unit_16_separable_conv3_pointwise",
                 "exit_flow_block2_separable_conv3_pointwise_BN",
                 "aspp1_depthwise", "aspp2_pointwise", "aspp3_depthwise",
                 "feature_projection0", "decoder_conv0_depthwise",
                 "decoder_conv1_pointwise", "logits_semantic"]:
        assert name in params or name in state, f"missing {name}"


def test_xception_os16_output_and_features(xception_os16):
    m, params, state = xception_os16
    x = jnp.full((1, SZ, SZ, 3), 120.0)
    probs, _ = m.apply(params, state, x)
    assert probs.shape == (1, SZ * SZ, 21)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    # truncation point is post-decoder stride 4 for xception (utils.py:181)
    feats, _ = m.apply(params, state, x, return_features=True)
    assert feats.shape == (1, SZ // 4, SZ // 4, 256)


def test_xception_os8_runs():
    m = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                  backbone="xception", OS=8)
    params, state = m.init(jax.random.key(1))
    x = jnp.zeros((1, SZ, SZ, 3))
    probs, _ = m.apply(params, state, x)
    assert probs.shape == (1, SZ * SZ, 21)


def test_xception_seg_model_subpixel_scale4():
    seg = SegModel(dataset="/nonexistent", image_size=(SZ, SZ))
    net = seg.create_seg_model("subpixel", n=21, backbone="xception")
    assert net.scale == 4  # utils.py:184-185
    probs, _ = net.apply(seg.params, seg.state, jnp.zeros((1, SZ, SZ, 3)))
    assert probs.shape == (1, SZ * SZ, 21)


@pytest.mark.slow
def test_xception_train_step():
    """One jitted training step on xception updates the unfrozen tail only."""
    from deeplab_tpu.train.trainer import Trainer

    seg = SegModel(dataset="/nonexistent", image_size=(SZ, SZ))
    net = seg.create_seg_model("original", n=21, backbone="xception")

    rng = np.random.RandomState(0)
    X = rng.rand(2, SZ, SZ, 3).astype(np.float32) * 255
    Y = rng.randint(0, 21, (2, SZ * SZ, 1)).astype(np.float32)
    SW = np.ones((2, SZ * SZ), np.float32)

    class OneBatch:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return X, Y, {"pred_mask": SW}

        def on_epoch_end(self):
            pass

    before_entry = np.asarray(
        seg.params["entry_flow_conv1_1"]["kernel"]).copy()
    before_dec = np.asarray(seg.params["decoder_conv0_pointwise"]["kernel"]).copy()
    tr = Trainer(net, epochs=1, lr=1e-3, verbose=0,
                 freeze_before="concat_projection")
    hist = tr.fit(seg.params, seg.state, OneBatch())
    assert np.isfinite(hist["loss"][0])
    np.testing.assert_array_equal(
        np.asarray(tr.params["entry_flow_conv1_1"]["kernel"]), before_entry)
    assert not np.allclose(
        np.asarray(tr.params["decoder_conv0_pointwise"]["kernel"]), before_dec)
