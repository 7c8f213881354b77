"""Model construction: shapes, layer-name contract, truncation + heads."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.core import param_count
from deeplab_tpu.models.deeplabv3p import Deeplabv3
from deeplab_tpu.models.mobilenetv2 import make_divisible
from deeplab_tpu.models.seg_model import SegModel

SZ = 64  # small spatial size keeps CPU tests fast; all strides still exercised


@pytest.fixture(scope="module")
def mobilenet_model():
    m = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                  backbone="mobilenetv2")
    params, state = m.init(jax.random.key(0))
    return m, params, state


def test_make_divisible_reference_values():
    # deeplabv3p.py:157-164
    assert make_divisible(32, 8) == 32
    assert make_divisible(33, 8) == 32
    assert make_divisible(16 * 0.5, 8) == 8
    assert make_divisible(24 * 0.35, 8) == 8
    assert make_divisible(10, 8) == 16  # 8 < 0.9*10 -> bumped up a divisor
    assert make_divisible(7, 8) == 8  # min_value floor


def test_mobilenet_output_shape_and_softmax(mobilenet_model):
    m, params, state = mobilenet_model
    x = jnp.full((2, SZ, SZ, 3), 127.5)
    probs, _ = m.apply(params, state, x)
    assert probs.shape == (2, SZ * SZ, 21)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)


def test_mobilenet_infer_flag(mobilenet_model):
    m, params, state = mobilenet_model
    m_infer = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                        backbone="mobilenetv2")
    m_infer.infer = True
    x = jnp.full((1, SZ, SZ, 3), 10.0)
    probs, _ = m_infer.apply(params, state, x)
    assert probs.shape == (1, SZ, SZ, 21)  # spatial layout (deeplabv3p.py:440-441)


def test_layer_name_contract(mobilenet_model):
    """Param tree keys must be the reference Keras layer names (h5 contract)."""
    _, params, state = mobilenet_model
    for name in ["Conv", "Conv_BN", "expanded_conv_depthwise",
                 "expanded_conv_project", "expanded_conv_1_expand",
                 "expanded_conv_16_project_BN", "image_pooling", "aspp0",
                 "concat_projection", "concat_projection_BN",
                 "logits_semantic"]:
        assert name in params or name in state, f"missing layer {name}"
    assert "kernel" in params["Conv"]
    assert "depthwise_kernel" in params["expanded_conv_depthwise"]
    assert "moving_mean" in state["Conv_BN"]
    assert "bias" in params["logits_semantic"]


def test_custom_logits_name():
    m = Deeplabv3(weights=None, input_shape=(32, 32, 3), classes=5,
                  backbone="mobilenetv2")
    params, _ = m.init(jax.random.key(0))
    assert "custom_logits_semantic" in params  # deeplabv3p.py:432-435


def test_mobilenet_feature_truncation(mobilenet_model):
    # return_features == reference model.layers[-5].output: stride-8 256ch.
    m, params, state = mobilenet_model
    x = jnp.zeros((1, SZ, SZ, 3))
    feats, _ = m.apply(params, state, x, return_features=True)
    assert feats.shape == (1, SZ // 8, SZ // 8, 256)


def test_seg_model_original_head():
    seg = SegModel(dataset="/nonexistent", image_size=(SZ, SZ))
    net = seg.create_seg_model("original", n=21, backbone="mobilenetv2")
    x = jnp.full((1, SZ, SZ, 3), 100.0)
    probs, _ = net.apply(seg.params, seg.state, x)
    assert probs.shape == (1, SZ * SZ, 21)
    assert "conv_upsample" in seg.params  # utils.py:189
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)


def test_seg_model_subpixel_head():
    seg = SegModel(dataset="/nonexistent", image_size=(SZ, SZ))
    net = seg.create_seg_model("subpixel", n=21, backbone="mobilenetv2")
    assert net.scale == 8  # utils.py:184-187
    x = jnp.full((1, SZ, SZ, 3), 100.0)
    probs, _ = net.apply(seg.params, seg.state, x)
    assert probs.shape == (1, SZ * SZ, 21)
    # ICNR property on the subpixel kernel: r^2 identical sub-kernels.
    k = np.asarray(seg.params["subpixel"]["kernel"])
    r = net.scale
    k = k.reshape(1, 1, k.shape[2], 21, r * r)
    np.testing.assert_array_equal(k[..., 0], k[..., 1])


def test_seg_model_in_memory_train():
    """SegModel.train on in-memory arrays (reference utils.py:243-247)."""
    seg = SegModel(dataset="/nonexistent", image_size=(32, 32))
    seg.set_batch_size(4)
    seg.set_num_epochs(2)
    net = seg.create_seg_model("original", n=21, backbone="mobilenetv2")
    rng = np.random.RandomState(0)
    X = rng.rand(8, 32, 32, 3).astype(np.float32) * 255
    Y = rng.randint(0, 21, (8, 32 * 32)).astype(np.float32)
    hist = seg.train(net, X, Y, val_data=(X[:4], Y[:4]))
    assert len(hist["loss"]) == 2
    assert np.isfinite(hist["loss"]).all()
    SegModel.set_num_epochs(20)  # restore class default
    SegModel.set_batch_size(16)


def test_bn_training_updates_state(mobilenet_model):
    m, params, state = mobilenet_model
    x = jnp.asarray(np.random.RandomState(0).rand(2, SZ, SZ, 3) * 255,
                    jnp.float32)
    _, new_state = m.apply(params, state, x, training=True,
                           rng=jax.random.key(1))
    before = np.asarray(state["Conv_BN"]["moving_mean"])
    after = np.asarray(new_state["Conv_BN"]["moving_mean"])
    assert not np.allclose(before, after)


@pytest.mark.parametrize("hw", [(96, 96), (100, 68)])
def test_non_square_and_odd_sizes(hw):
    """The builder must handle arbitrary sizes (the notebook's commented
    720x1280 alternative, cell 0) — ceil-based ASPP pooling and resize."""
    m = Deeplabv3(weights=None, input_shape=hw + (3,), classes=21,
                  backbone="mobilenetv2")
    params, state = m.init(jax.random.key(0))
    probs, _ = m.apply(params, state, jnp.zeros((1,) + hw + (3,)))
    assert probs.shape == (1, hw[0] * hw[1], 21)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)


def test_param_counts_plausible(mobilenet_model):
    _, params, _ = mobilenet_model
    n = param_count(params)
    assert 2.0e6 < n < 2.3e6  # MobileNetV2-DeepLab ~2.1M trainable+BN params


def test_predict_ids_matches_apply_argmax():
    """SegNet.predict_ids (logits path, no softmax) must equal the argmax
    of apply()'s softmax probabilities — softmax is per-pixel monotone, so
    the serving shortcut may not change a single label."""
    from deeplab_tpu.models.seg_model import SegNet

    net = SegNet((64, 64), 5, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    # freshly-initialized logits are ~1e-11 and softmax rounds them to an
    # exactly-uniform distribution (argmax ties) — blow the head kernel up
    # so the tiny per-pixel trunk variations become O(1) logit differences
    # with a well-defined, spatially-varying winner
    params = dict(params)
    head = dict(params["conv_upsample"])
    head["bias"] = jnp.zeros(5, jnp.float32)
    head["kernel"] = jnp.asarray(
        rng.randn(*head["kernel"].shape) * 1e10, jnp.float32)
    params["conv_upsample"] = head
    X = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        probs, _ = net.apply(params, state, X, compute_dtype=dt)
        want = np.argmax(np.asarray(probs).reshape(2, 64, 64, 5), -1)
        got = np.asarray(net.predict_ids(params, state, X, compute_dtype=dt))
        np.testing.assert_array_equal(got, want)
