"""SegModel facade (reference utils.py:160-254).

``create_seg_model`` builds the Deeplabv3 trunk, truncates at the reference's
``model.layers[-5].output`` point (post-Dropout ASPP projection; utils.py:181)
and attaches one of two heads:

- ``'original'``: 1x1 conv ``conv_upsample`` -> TF1 bilinear resize to full
  resolution -> reshape (H*W, n) -> softmax ``pred_mask`` (utils.py:188-193).
- ``'subpixel'``: Subpixel conv (1x1, r=scale: 8 for mobilenetv2 / 4 for
  xception) -> phase shift -> reshape -> softmax (utils.py:194-198), with
  every Subpixel kernel re-initialized by ICNR (utils.py:200-204).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from deeplab_tpu import core
from deeplab_tpu.models.deeplabv3p import deeplabv3_forward
from deeplab_tpu.ops import init as inits
from deeplab_tpu.ops.conv import conv2d
from deeplab_tpu.ops.pixel_shuffle import phase_shift
from deeplab_tpu.ops.resize import resize_bilinear_tf1


class SegNet:
    """A built segmentation network: pure forward + init/apply, mirrors the
    Keras Model returned by the reference's create_seg_model."""

    def __init__(self, image_size, n_classes: int, backbone: str, net: str,
                 OS: int = 16, alpha: float = 1.0):
        self.sz = tuple(image_size)          # (H, W)
        self.n_classes = n_classes
        self.backbone = backbone
        self.net = net
        # reference create_seg_model hardcodes OS=16/alpha=1 (utils.py:177-179)
        self.OS = OS
        self.alpha = alpha
        self.scale = 4 if backbone == "xception" else 8
        self.name = ("deeplabv3p" if net == "original" else "deeplabv3p_subpixel")

    def forward(self, ctx, img):
        return self._forward(ctx, img, softmax=True)

    def _forward(self, ctx, img, softmax: bool, flatten: bool = True):
        feats = deeplabv3_forward(ctx, img, backbone=self.backbone,
                                  OS=self.OS, alpha=self.alpha, classes=21,
                                  return_features=True)
        n = self.n_classes
        if self.net == "original":
            x = conv2d(ctx, feats, n, 1, "conv_upsample", use_bias=True)
            x = resize_bilinear_tf1(x, self.sz)
        elif self.net == "subpixel":
            r = self.scale
            x = conv2d(ctx, feats, n * r * r, 1, "subpixel", use_bias=True,
                       kernel_init=lambda rng, shape, dtype: inits.icnr(
                           rng, shape, r, dtype=dtype))
            x = phase_shift(x, r)
        else:
            raise ValueError(f"unknown net {self.net!r}")
        if not flatten:
            return x        # (B, H, W, n) head logits, compute dtype
        x = x.reshape(x.shape[0], self.sz[0] * self.sz[1], n)
        if not softmax:
            return x        # head logits, compute dtype (serving argmax path)
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)

    def init(self, rng, batch_size: int = 1):
        example = jnp.zeros((batch_size,) + self.sz + (3,), jnp.float32)
        params, state = core.init_model(self.forward, rng, example)
        # canonical graph order for the layer-freeze policy (tree.map
        # re-sorts dict keys, so it cannot be re-derived later)
        self.layer_order = tuple(params)
        return params, state

    def at_size(self, image_size):
        """A twin of this network at a different input resolution, sharing
        the SAME params/state (the model is fully convolutional: conv/BN
        parameters are size-independent; the ASPP image pool and the final
        resize derive their geometry from the input shape).  Used by the
        Predictor's multi-scale test-time augmentation."""
        twin = SegNet(image_size, self.n_classes, self.backbone, self.net,
                      OS=self.OS, alpha=self.alpha)
        twin.layer_order = getattr(self, "layer_order", None)
        return twin

    def apply(self, params, state, img, training: bool = False, rng=None,
              frozen: frozenset = frozenset(), compute_dtype=None,
              shard_local: bool = False):
        return core.apply_model(self.forward, params, state, img,
                                training=training, rng=rng, frozen=frozen,
                                compute_dtype=compute_dtype or jnp.float32,
                                shard_local=shard_local)

    def apply_logits(self, params, state, img, training: bool = False,
                     rng=None, frozen: frozenset = frozenset(),
                     compute_dtype=None, shard_local: bool = False):
        """(B, H, W, n) head LOGITS in compute dtype — the Trainer's fused
        training path.  Skipping the flatten + f32 softmax over every pixel
        avoids two full-resolution relayout/materialization passes that
        profiled at ~25% of the 512x512 train step; the fused
        log-softmax CE (losses.masked_sparse_ce_logits) reproduces the
        reference loss on softmax probabilities (utils.py:127-130)."""
        fn = lambda ctx, im: self._forward(ctx, im, softmax=False,
                                           flatten=False)
        return core.apply_model(fn, params, state, img, training=training,
                                rng=rng, frozen=frozen,
                                compute_dtype=compute_dtype or jnp.float32,
                                shard_local=shard_local)

    def predict_ids(self, params, state, img, compute_dtype=None,
                    shard_local: bool = False):
        """Hard (B, H, W) label map for serving: argmax of the head LOGITS.
        Softmax is per-pixel monotone, so this equals argmax of ``apply``'s
        probabilities while skipping the softmax + f32 upcast over all
        H*W*n activations (the serving paths only consume the argmax).
        ``shard_local`` marks a per-device shard_map execution so the fused
        Pallas serving kernels engage on multi-chip meshes (core.Ctx)."""
        fn = lambda ctx, im: self._forward(ctx, im, softmax=False)
        logits, _ = core.apply_model(fn, params, state, img,
                                     compute_dtype=compute_dtype
                                     or jnp.float32,
                                     shard_local=shard_local)
        b = img.shape[0]
        return jnp.argmax(
            logits.reshape((b,) + self.sz + (self.n_classes,)), axis=-1)


class SegModel:
    """Reference utils.py:160-254 facade."""

    epochs = 20
    batch_size = 16

    def __init__(self, dataset="VOCdevkit/VOC2012", image_size=(320, 320)):
        self.sz = tuple(image_size)
        self.mainpath = dataset
        self.crop = False
        self.net = None
        self.model: Optional[SegNet] = None
        self.params = None
        self.state = None

    def create_seg_model(self, net, n=21, backbone="mobilenetv2",
                         load_weights=False, multi_gpu=False, rng=None,
                         OS=16, alpha=1.0):
        """Build the truncated trunk + head. Returns the SegNet; params/state
        are stored on the facade (and on the returned net for convenience)."""
        self.net = net
        self.modelpath = f"weights/{backbone}_{net}.h5"
        model = SegNet(self.sz, n, backbone, net, OS=OS, alpha=alpha)
        rng = rng if rng is not None else jax.random.key(0)
        params, state = model.init(rng)
        # ICNR is the kernel_init of the subpixel conv (utils.py:200-204),
        # already applied at init time above.
        if load_weights:
            params, state = self._load_h5(params, state, self.modelpath)
        self.model = model
        self.params, self.state = params, state
        model.params, model.state = params, state
        self.multi_gpu = multi_gpu  # parallelism is mesh-based; see train().
        return model

    def _load_h5(self, params, state, path):
        from deeplab_tpu.params import load_keras_h5
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return load_keras_h5(path, params, state)

    def load_weights(self, model=None):
        self.params, self.state = self._load_h5(self.params, self.state,
                                                self.modelpath)
        if model is not None:
            model.params, model.state = self.params, self.state
        return self.params, self.state

    def create_generators(self, crop_shape=False, mode="train", do_ahisteq=True,
                          n_classes=21, horizontal_flip=True, vertical_flip=False,
                          blur=False, with_bg=True, brightness=0.1, rotation=5.0,
                          zoom=0.1, validation_split=0.2, seed=7):
        from deeplab_tpu.data.generator import SegmentationGenerator
        return SegmentationGenerator(
            folder=self.mainpath, mode=mode, n_classes=n_classes,
            do_ahisteq=do_ahisteq, batch_size=self.batch_size,
            resize_shape=self.sz[::-1], crop_shape=crop_shape,
            horizontal_flip=horizontal_flip, vertical_flip=vertical_flip,
            blur=blur, brightness=brightness, rotation=rotation, zoom=zoom,
            validation_split=validation_split, seed=seed)

    def train_generator(self, model, train_generator, valid_generator,
                        callbacks=None, mp=True, **train_kw):
        """Reference utils.py:231-241 — delegates to the TPU trainer.
        ``mp=True`` mirrors fit_generator's worker pool (utils.py:240:
        workers=cpu_count//2, use_multiprocessing=True)."""
        from deeplab_tpu.train.trainer import Trainer
        if mp:
            train_kw.setdefault("workers",
                                max((os.cpu_count() or 2) // 2, 1))
            train_kw.setdefault("use_multiprocessing", True)
        trainer = Trainer(model, epochs=self.epochs, callbacks=callbacks or [],
                          **train_kw)
        history = trainer.fit(self.params, self.state, train_generator,
                              valid_generator)
        self.params, self.state = trainer.params, trainer.state
        return history

    def build_callbacks(self, tf_board=False, plot_process=False,
                        monitor="val_Jaccard", mode="max"):
        """Notebook cell-5 callback set.  (The reference's SegModel.train
        references self.build_callbacks, which is only ever defined in the
        notebook's namespace — a latent NameError upstream; defined here.)"""
        from deeplab_tpu.train.callbacks import (EarlyStopping,
                                                 ModelCheckpoint,
                                                 ReduceLROnPlateau,
                                                 TensorBoard)
        checkpointer = ModelCheckpoint(self.modelpath, verbose=1,
                                       save_best_only=True, monitor=monitor,
                                       mode=mode)
        stop_train = EarlyStopping(monitor=monitor, patience=100, verbose=1,
                                   mode=mode)
        reduce_lr = ReduceLROnPlateau(monitor=monitor, factor=0.5,
                                      patience=5, min_lr=1e-6)
        if tf_board:
            return [reduce_lr, stop_train,
                    TensorBoard(log_dir="./logs/" + str(self.net))]
        return [checkpointer, reduce_lr, stop_train]

    def train(self, model, X, y, val_data, tf_board=False,
              plot_train_process=False):
        from deeplab_tpu.train.trainer import Trainer
        from deeplab_tpu.data.generator import ArrayBatcher
        trainer = Trainer(model, epochs=self.epochs,
                          callbacks=self.build_callbacks(tf_board=tf_board))
        gen = ArrayBatcher(X, y, self.batch_size, n_classes=model.n_classes)
        val_gen = ArrayBatcher(val_data[0], val_data[1], self.batch_size,
                               n_classes=model.n_classes)
        history = trainer.fit(self.params, self.state, gen, val_gen)
        self.params, self.state = trainer.params, trainer.state
        return history

    @classmethod
    def set_num_epochs(cls, new_epochs):
        cls.epochs = new_epochs

    @classmethod
    def set_batch_size(cls, new_batch_size):
        cls.batch_size = new_batch_size
