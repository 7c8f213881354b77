"""Full-model golden parity for the Xception trunk vs an independent
tf.keras build with shared weights (the reference's Xception path cannot run
upstream — `layers.add` NameError — so TF is the only available oracle).

Built from the architecture spec (SURVEY.md C2-C4/C7-C8): entry flow with
strided xception blocks, 2 middle-flow units (full 16 is compile-heavy for a
unit test; the unit repeats identically), exit flow with atrous rates,
5-branch ASPP, decoder.  Weights copied by layer name; outputs compared at
the truncation point.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplab_tpu import core  # noqa: E402
from deeplab_tpu.models import xception  # noqa: E402
from deeplab_tpu.models.deeplabv3p import aspp, dropout  # noqa: E402
from deeplab_tpu.ops.bn import batch_norm  # noqa: E402
from deeplab_tpu.ops.conv import conv2d, sep_conv_bn  # noqa: E402
from deeplab_tpu.ops.resize import resize_bilinear_tf1  # noqa: E402

SZ = 64
N_MIDDLE = 2  # reduced middle flow (16 identical units upstream)


def _small_xception_forward(ctx, img):
    """Our trunk with a reduced middle flow, mirroring _keras_trunk below."""
    x = img.astype(ctx.compute_dtype) / 127.5 - 1.0
    OS = 16
    entry_s, middle_r, exit_r, _ = xception.rate_table(OS)

    x = conv2d(ctx, x, 32, 3, "entry_flow_conv1_1", stride=2)
    x = batch_norm(ctx, x, "entry_flow_conv1_1_BN")
    x = jax.nn.relu(x)
    from deeplab_tpu.ops.conv import conv2d_fixed
    x = conv2d_fixed(ctx, x, 64, "entry_flow_conv1_2", kernel_size=3,
                     stride=1)
    x = batch_norm(ctx, x, "entry_flow_conv1_2_BN")
    x = jax.nn.relu(x)
    x = xception.xception_block(ctx, x, [128, 128, 128], "entry_flow_block1",
                                skip_connection_type="conv", stride=2)
    x, skip1 = xception.xception_block(ctx, x, [256, 256, 256],
                                       "entry_flow_block2",
                                       skip_connection_type="conv", stride=2,
                                       return_skip=True)
    x = xception.xception_block(ctx, x, [728, 728, 728], "entry_flow_block3",
                                skip_connection_type="conv", stride=entry_s)
    for i in range(N_MIDDLE):
        x = xception.xception_block(ctx, x, [728, 728, 728],
                                    f"middle_flow_unit_{i + 1}",
                                    skip_connection_type="sum", stride=1,
                                    rate=middle_r)
    x = xception.xception_block(ctx, x, [728, 1024, 1024], "exit_flow_block1",
                                skip_connection_type="conv", stride=1,
                                rate=exit_r[0])
    x = xception.xception_block(ctx, x, [1536, 1536, 2048],
                                "exit_flow_block2",
                                skip_connection_type="none", stride=1,
                                rate=exit_r[1], depth_activation=True)
    x = aspp(ctx, x, "xception", OS, (SZ, SZ))
    x = dropout(ctx, x, 0.1)
    # decoder
    import math
    dec_hw = (int(math.ceil(SZ / 4)), int(math.ceil(SZ / 4)))
    x = resize_bilinear_tf1(x, dec_hw)
    dec_skip1 = conv2d(ctx, skip1, 48, 1, "feature_projection0")
    dec_skip1 = batch_norm(ctx, dec_skip1, "feature_projection0_BN",
                           epsilon=1e-5)
    dec_skip1 = jax.nn.relu(dec_skip1)
    x = jnp.concatenate([x, dec_skip1], axis=-1)
    x = sep_conv_bn(ctx, x, 256, "decoder_conv0", depth_activation=True,
                    epsilon=1e-5)
    x = sep_conv_bn(ctx, x, 256, "decoder_conv1", depth_activation=True,
                    epsilon=1e-5)
    return x


def _k_sepconv(x, filters, prefix, stride=1, rate=1, depth_activation=False,
               epsilon=1e-3):
    L = tf.keras.layers
    if stride == 1:
        pad = "same"
    else:
        x = L.ZeroPadding2D(1)(x)
        pad = "valid"
    if not depth_activation:
        x = L.ReLU()(x)
    x = L.DepthwiseConv2D(3, strides=stride, dilation_rate=(rate, rate),
                          padding=pad, use_bias=False,
                          name=prefix + "_depthwise")(x)
    x = L.BatchNormalization(name=prefix + "_depthwise_BN",
                             epsilon=epsilon)(x)
    if depth_activation:
        x = L.ReLU()(x)
    x = L.Conv2D(filters, 1, padding="same", use_bias=False,
                 name=prefix + "_pointwise")(x)
    x = L.BatchNormalization(name=prefix + "_pointwise_BN",
                             epsilon=epsilon)(x)
    if depth_activation:
        x = L.ReLU()(x)
    return x


def _k_block(x, depths, prefix, skip_type, stride, rate=1,
             depth_activation=False, return_skip=False):
    L = tf.keras.layers
    inputs = x
    skip = None
    res = x
    for i in range(3):
        res = _k_sepconv(res, depths[i], f"{prefix}_separable_conv{i + 1}",
                         stride=stride if i == 2 else 1, rate=rate,
                         depth_activation=depth_activation)
        if i == 1:
            skip = res
    if skip_type == "conv":
        if stride == 1:
            sc = L.Conv2D(depths[-1], 1, strides=1, padding="same",
                          use_bias=False, name=prefix + "_shortcut")(inputs)
        else:
            sc = L.Conv2D(depths[-1], 1, strides=stride, padding="valid",
                          use_bias=False, name=prefix + "_shortcut")(inputs)
        sc = L.BatchNormalization(name=prefix + "_shortcut_BN")(sc)
        x = L.Add()([res, sc])
    elif skip_type == "sum":
        x = L.Add()([res, inputs])
    else:
        x = res
    return (x, skip) if return_skip else x


def _keras_trunk():
    L = tf.keras.layers
    inp = L.Input((SZ, SZ, 3))
    x = L.Rescaling(1.0 / 127.5, offset=-1.0)(inp)
    x = L.Conv2D(32, 3, strides=2, padding="same", use_bias=False,
                 name="entry_flow_conv1_1")(x)
    x = L.BatchNormalization(name="entry_flow_conv1_1_BN")(x)
    x = L.ReLU()(x)
    x = L.Conv2D(64, 3, padding="same", use_bias=False,
                 name="entry_flow_conv1_2")(x)
    x = L.BatchNormalization(name="entry_flow_conv1_2_BN")(x)
    x = L.ReLU()(x)
    x = _k_block(x, [128] * 3, "entry_flow_block1", "conv", 2)
    x, skip1 = _k_block(x, [256] * 3, "entry_flow_block2", "conv", 2,
                        return_skip=True)
    x = _k_block(x, [728] * 3, "entry_flow_block3", "conv", 2)
    for i in range(N_MIDDLE):
        x = _k_block(x, [728] * 3, f"middle_flow_unit_{i + 1}", "sum", 1)
    x = _k_block(x, [728, 1024, 1024], "exit_flow_block1", "conv", 1, rate=1)
    x = _k_block(x, [1536, 1536, 2048], "exit_flow_block2", "none", 1,
                 rate=2, depth_activation=True)

    feat = SZ // 16
    b4 = L.GlobalAveragePooling2D(keepdims=True)(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = L.BatchNormalization(name="image_pooling_BN", epsilon=1e-5)(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(feat, feat))(b4)
    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = L.BatchNormalization(name="aspp0_BN", epsilon=1e-5)(b0)
    b0 = L.ReLU()(b0)
    b1 = _k_sepconv(x, 256, "aspp1", rate=6, depth_activation=True,
                    epsilon=1e-5)
    b2 = _k_sepconv(x, 256, "aspp2", rate=12, depth_activation=True,
                    epsilon=1e-5)
    b3 = _k_sepconv(x, 256, "aspp3", rate=18, depth_activation=True,
                    epsilon=1e-5)
    x = L.Concatenate()([b4, b0, b1, b2, b3])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = L.BatchNormalization(name="concat_projection_BN", epsilon=1e-5)(x)
    x = L.ReLU()(x)
    # decoder: TF1 bilinear x4 -> our resize matches tf.compat.v1 exactly
    x = L.Lambda(lambda t: tf.compat.v1.image.resize_bilinear(
        t, (SZ // 4, SZ // 4)))(x)
    skip = L.Conv2D(48, 1, use_bias=False, name="feature_projection0")(skip1)
    skip = L.BatchNormalization(name="feature_projection0_BN",
                                epsilon=1e-5)(skip)
    skip = L.ReLU()(skip)
    x = L.Concatenate()([x, skip])
    x = _k_sepconv(x, 256, "decoder_conv0", depth_activation=True,
                   epsilon=1e-5)
    x = _k_sepconv(x, 256, "decoder_conv1", depth_activation=True,
                   epsilon=1e-5)
    return tf.keras.Model(inp, x)


def test_xception_trunk_matches_keras_golden():
    from tests.test_full_model_golden import _transfer_weights

    tf.keras.utils.set_random_seed(1)
    kmodel = _keras_trunk()

    params, state = core.init_model(_small_xception_forward,
                                    jax.random.key(0),
                                    jnp.zeros((1, SZ, SZ, 3)))
    n = _transfer_weights(kmodel, params, state)
    assert n > 50, f"only {n} layers transferred"

    rng = np.random.RandomState(0)
    x = (rng.rand(1, SZ, SZ, 3) * 255).astype(np.float32)
    ref = kmodel(x, training=False).numpy()
    got, _ = core.apply_model(_small_xception_forward, params, state,
                              jnp.asarray(x))
    got = np.asarray(got)
    assert got.shape == ref.shape == (1, SZ // 4, SZ // 4, 256)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.abs(got - ref)) < 1e-3 * max(1.0, np.abs(ref).mean())