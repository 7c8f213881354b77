"""DeepLabV3+ graph (reference deeplabv3p.py:209-466), TPU-native.

One pure function builds/applies the whole network; layer names match the
reference Keras graph exactly (the .h5 weight contract).  Input contract is
the reference's: raw 0-255 float BGR images, normalized in-graph to
``x/127.5 - 1`` (deeplabv3p.py:270).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from deeplab_tpu import core
from deeplab_tpu.ops.bn import batch_norm
from deeplab_tpu.ops.conv import conv2d, sep_conv_bn
from deeplab_tpu.ops.resize import resize_bilinear_tf1
from deeplab_tpu.models import mobilenetv2, xception

# Upstream pretrained-weight release URLs (reference deeplabv3p.py:42-43).
# This environment has no egress; params.load_pretrained_pascal_voc resolves
# these filenames from a local cache instead of downloading.
WEIGHTS_PATH_X = ("https://github.com/bonlime/keras-deeplab-v3-plus/releases/"
                  "download/1.1/deeplabv3_xception_tf_dim_ordering_tf_kernels.h5")
WEIGHTS_PATH_MOBILE = ("https://github.com/bonlime/keras-deeplab-v3-plus/"
                       "releases/download/1.1/"
                       "deeplabv3_mobilenetv2_tf_dim_ordering_tf_kernels.h5")


def aspp(ctx, x, backbone: str, OS: int, input_hw):
    """ASPP head (reference deeplabv3p.py:371-410).

    b4: global average pool -> 1x1 conv 256 -> BN(1e-5) -> ReLU -> bilinear
    resize back to the feature grid.  b0: 1x1 conv 256.  Xception adds three
    atrous SepConv branches; MobileNetV2 concatenates only [b4, b0]
    (deeplabv3p.py:403-404).  Ends with the 1x1 'concat_projection' + BN +
    ReLU (Dropout applied by the caller).
    """
    feat_h = int(math.ceil(input_hw[0] / OS))
    feat_w = int(math.ceil(input_hw[1] / OS))

    # Image-feature branch: AveragePooling2D(pool=(feat_h, feat_w)) == global
    # mean over the feature grid (deeplabv3p.py:375).
    b4 = jnp.mean(x, axis=(1, 2), keepdims=True)
    b4 = conv2d(ctx, b4, 256, 1, "image_pooling")
    b4 = batch_norm(ctx, b4, "image_pooling_BN", epsilon=1e-5)
    b4 = jax.nn.relu(b4)
    # TF1 resize_bilinear from 1x1 broadcasts the single value (frac=0 rows).
    b4 = jnp.broadcast_to(b4, (b4.shape[0], feat_h, feat_w, b4.shape[-1]))

    b0 = conv2d(ctx, x, 256, 1, "aspp0")
    b0 = batch_norm(ctx, b0, "aspp0_BN", epsilon=1e-5)
    b0 = jax.nn.relu(b0)

    if backbone == "xception":
        _, _, _, atrous_rates = xception.rate_table(OS)
        b1 = sep_conv_bn(ctx, x, 256, "aspp1", rate=atrous_rates[0],
                         depth_activation=True, epsilon=1e-5)
        b2 = sep_conv_bn(ctx, x, 256, "aspp2", rate=atrous_rates[1],
                         depth_activation=True, epsilon=1e-5)
        b3 = sep_conv_bn(ctx, x, 256, "aspp3", rate=atrous_rates[2],
                         depth_activation=True, epsilon=1e-5)
        x = jnp.concatenate([b4, b0, b1, b2, b3], axis=-1)
    else:
        x = jnp.concatenate([b4, b0], axis=-1)

    x = conv2d(ctx, x, 256, 1, "concat_projection")
    x = batch_norm(ctx, x, "concat_projection_BN", epsilon=1e-5)
    x = jax.nn.relu(x)
    return x


def dropout(ctx, x, rate: float):
    if ctx.training and rate > 0.0:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    return x


def deeplabv3_forward(ctx, img, *, backbone: str = "mobilenetv2", OS: int = 16,
                      alpha: float = 1.0, classes: int = 21,
                      infer: bool = False, return_features: bool = False):
    """Full reference graph.  ``return_features=True`` stops at the point the
    reference's SegModel truncates (``model.layers[-5].output``, utils.py:181):
    the post-Dropout ASPP projection for MobileNetV2 (stride 8), or the
    post-decoder features for Xception (stride 4).
    """
    input_hw = (img.shape[1], img.shape[2])
    x = img.astype(ctx.compute_dtype) / 127.5 - 1.0  # deeplabv3p.py:270

    if backbone == "xception":
        x, skip1 = xception.backbone(ctx, x, OS=OS)
    elif backbone == "mobilenetv2":
        OS = 8  # forced for this backbone (deeplabv3p.py:316)
        x = mobilenetv2.backbone(ctx, x, alpha=alpha)
    else:
        raise ValueError(f"unknown backbone {backbone!r}")

    with jax.named_scope("aspp"):
        x = aspp(ctx, x, backbone, OS, input_hw)
        x = dropout(ctx, x, 0.1)

    if backbone == "xception":
        # Decoder (deeplabv3p.py:414-429): upsample to stride 4, fuse skip.
        dec_hw = (int(math.ceil(input_hw[0] / 4)), int(math.ceil(input_hw[1] / 4)))
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

    if return_features:
        return x

    last_layer_name = ("logits_semantic" if classes == 21
                       else "custom_logits_semantic")
    with jax.named_scope("head"):
        x = conv2d(ctx, x, classes, 1, last_layer_name, use_bias=True)
        x = resize_bilinear_tf1(x, input_hw).astype(jnp.float32)
        if infer:
            return jax.nn.softmax(x, axis=-1)
        x = x.reshape(x.shape[0], input_hw[0] * input_hw[1], classes)
        return jax.nn.softmax(x, axis=-1)


class Deeplabv3:
    """Mirror of the reference ``Deeplabv3()`` entry point (deeplabv3p.py:209).

    Usage::

        model = Deeplabv3(weights=None, input_shape=(512, 512, 3),
                          classes=21, backbone='mobilenetv2', OS=16, alpha=1.)
        params, state = model.init(jax.random.key(0))
        probs, _ = model.apply(params, state, images)          # inference
        probs, new_state = model.apply(params, state, images,
                                       training=True, rng=rng)  # training
    """

    def __init__(self, weights: Optional[str] = None, input_tensor=None,
                 infer: bool = False, input_shape=(512, 512, 3),
                 classes: int = 21, backbone: str = "mobilenetv2",
                 OS: int = 16, alpha: float = 1.0):
        if weights not in {"pascal_voc", None}:
            raise ValueError("weights must be 'pascal_voc' or None")
        if backbone not in {"xception", "mobilenetv2"}:
            raise ValueError("backbone must be 'xception' or 'mobilenetv2'")
        self.input_shape = tuple(input_shape)
        self.infer = infer
        self.classes = classes
        self.backbone = backbone
        self.OS = OS
        self.alpha = alpha
        self.weights = weights

    def _forward(self, ctx, img, infer=None, return_features=False):
        return deeplabv3_forward(
            ctx, img, backbone=self.backbone, OS=self.OS, alpha=self.alpha,
            classes=self.classes,
            infer=self.infer if infer is None else infer,
            return_features=return_features)

    def init(self, rng, batch_size: int = 1):
        example = jnp.zeros((batch_size,) + self.input_shape, jnp.float32)
        params, state = core.init_model(self._forward, rng, example)
        # canonical graph order, captured while the freshly-built dict still
        # has creation order (jax.tree.map re-sorts keys alphabetically) —
        # the layer-freeze policy depends on it
        self.layer_order = tuple(params)
        if self.weights == "pascal_voc":
            from deeplab_tpu.params import load_pretrained_pascal_voc
            params, state = load_pretrained_pascal_voc(params, state,
                                                       self.backbone)
        return params, state

    def apply(self, params, state, img, training: bool = False, rng=None,
              return_features: bool = False, frozen: frozenset = frozenset(),
              compute_dtype=jnp.float32):
        return core.apply_model(self._forward, params, state, img,
                                training=training, rng=rng, frozen=frozen,
                                compute_dtype=compute_dtype,
                                return_features=return_features)
