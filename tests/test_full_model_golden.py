"""Full-model golden parity: our MobileNetV2-DeepLab trunk vs an
independently-built tf.keras model with identical weights.

The Keras model below is constructed from the architecture spec (SURVEY.md
C5-C7), not from the reference source: stem -> 17 inverted-residual blocks
(DeepLab rate table) -> 2-branch ASPP -> concat_projection.  Weights are
copied from the Keras layers into our name-keyed pytree; outputs must agree
to f32-conv tolerance at the SegModel truncation point.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplab_tpu.models.deeplabv3p import Deeplabv3  # noqa: E402
from deeplab_tpu.models.mobilenetv2 import BLOCK_TABLE, make_divisible  # noqa: E402

SZ = 64
ALPHA = 1.0


def _keras_trunk():
    """Independent Keras build of the MobileNetV2-DeepLab trunk + 2-branch
    ASPP (all layer names matching the h5 contract)."""
    L = tf.keras.layers
    inp = L.Input((SZ, SZ, 3))
    x = L.Rescaling(1.0 / 127.5, offset=-1.0)(inp)

    first = make_divisible(32 * ALPHA, 8)
    x = L.Conv2D(first, 3, strides=2, padding="same", use_bias=False,
                 name="Conv")(x)
    x = L.BatchNormalization(epsilon=1e-3, momentum=0.999, name="Conv_BN")(x)
    x = L.ReLU(max_value=6.0)(x)

    for filters, stride, expansion, block_id, skip, rate in BLOCK_TABLE:
        prefix = f"expanded_conv_{block_id}_" if block_id else "expanded_conv_"
        inputs = x
        in_ch = x.shape[-1]
        pw_filters = make_divisible(int(filters * ALPHA), 8)
        if block_id:
            x = L.Conv2D(expansion * in_ch, 1, padding="same", use_bias=False,
                         name=prefix + "expand")(x)
            x = L.BatchNormalization(epsilon=1e-3, momentum=0.999,
                                     name=prefix + "expand_BN")(x)
            x = L.ReLU(max_value=6.0)(x)
        x = L.DepthwiseConv2D(3, strides=stride, use_bias=False,
                              padding="same", dilation_rate=(rate, rate),
                              name=prefix + "depthwise")(x)
        x = L.BatchNormalization(epsilon=1e-3, momentum=0.999,
                                 name=prefix + "depthwise_BN")(x)
        x = L.ReLU(max_value=6.0)(x)
        x = L.Conv2D(pw_filters, 1, padding="same", use_bias=False,
                     name=prefix + "project")(x)
        x = L.BatchNormalization(epsilon=1e-3, momentum=0.999,
                                 name=prefix + "project_BN")(x)
        if skip:
            x = L.Add()([inputs, x])

    feat_hw = SZ // 8
    b4 = L.GlobalAveragePooling2D(keepdims=True)(x)
    b4 = L.Conv2D(256, 1, padding="same", use_bias=False,
                  name="image_pooling")(b4)
    b4 = L.BatchNormalization(epsilon=1e-5, name="image_pooling_BN")(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(feat_hw, feat_hw))(b4)  # 1x1 -> broadcast

    b0 = L.Conv2D(256, 1, padding="same", use_bias=False, name="aspp0")(x)
    b0 = L.BatchNormalization(epsilon=1e-5, name="aspp0_BN")(b0)
    b0 = L.ReLU(name="aspp0_activation")(b0)

    x = L.Concatenate()([b4, b0])
    x = L.Conv2D(256, 1, padding="same", use_bias=False,
                 name="concat_projection")(x)
    x = L.BatchNormalization(epsilon=1e-5, name="concat_projection_BN")(x)
    x = L.ReLU()(x)
    return tf.keras.Model(inp, x)


def _transfer_weights(kmodel, params, state):
    """Copy Keras layer weights into our (params, state) by layer name."""
    n = 0
    for layer in kmodel.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        name = layer.name
        if isinstance(layer, tf.keras.layers.DepthwiseConv2D):
            params[name]["depthwise_kernel"] = jnp.asarray(ws[0])
            n += 1
        elif isinstance(layer, tf.keras.layers.Conv2D):
            params[name]["kernel"] = jnp.asarray(ws[0])
            if len(ws) > 1:
                params[name]["bias"] = jnp.asarray(ws[1])
            n += 1
        elif isinstance(layer, tf.keras.layers.BatchNormalization):
            gamma, beta, mean, var = ws
            params[name]["gamma"] = jnp.asarray(gamma)
            params[name]["beta"] = jnp.asarray(beta)
            state[name]["moving_mean"] = jnp.asarray(mean)
            state[name]["moving_variance"] = jnp.asarray(var)
            n += 1
    return n


def test_trunk_matches_keras_golden():
    tf.keras.utils.set_random_seed(0)
    kmodel = _keras_trunk()

    ours = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                     backbone="mobilenetv2")
    params, state = ours.init(jax.random.key(0))
    n = _transfer_weights(kmodel, params, state)
    assert n > 60, f"only {n} layers transferred"

    rng = np.random.RandomState(0)
    x = (rng.rand(2, SZ, SZ, 3) * 255).astype(np.float32)

    ref = kmodel(x, training=False).numpy()
    got, _ = ours.apply(params, state, jnp.asarray(x), return_features=True)
    got = np.asarray(got)

    assert got.shape == ref.shape == (2, SZ // 8, SZ // 8, 256)
    # f32 conv reassociation tolerance across ~60 layers
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    # and the match must be tight on average, not just within tolerance
    assert np.mean(np.abs(got - ref)) < 1e-4 * max(1.0, np.abs(ref).mean())
