"""BASELINE.json config 5: Xception backbone at output_stride=8, multi-chip
data-parallel fine-tuning on Cityscapes — one end-to-end step on the
8-virtual-device mesh."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu import core
from deeplab_tpu.models.deeplabv3p import deeplabv3_forward
from deeplab_tpu.parallel.mesh import get_mesh
from deeplab_tpu.train.trainer import Trainer
from tests.test_cityscapes import city_dir  # noqa: F401 (fixture)

SZ = 32


class XceptionOS8Net:
    """Deeplabv3 xception OS=8 with the full logits head (no truncation) —
    the config-5 model, exercising the OS-8 rate tables end to end."""

    n_classes = 19
    sz = (SZ, SZ)

    def forward(self, ctx, img):
        return deeplabv3_forward(ctx, img, backbone="xception", OS=8,
                                 classes=self.n_classes)

    def init(self, rng, batch_size=1):
        return core.init_model(self.forward, rng,
                               jnp.zeros((batch_size, SZ, SZ, 3)))

    def apply(self, params, state, img, training=False, rng=None,
              frozen=frozenset(), compute_dtype=None):
        return core.apply_model(self.forward, params, state, img,
                                training=training, rng=rng, frozen=frozen,
                                compute_dtype=compute_dtype or jnp.float32)


@pytest.mark.slow
def test_xception_os8_cityscapes_multichip_step(city_dir):  # noqa: F811
    from deeplab_tpu.data.cityscapes import CityscapesGenerator

    gen = CityscapesGenerator(city_dir, mode="train", batch_size=8,
                              resize_shape=(SZ, SZ), crop_shape=None,
                              do_ahisteq=False, brightness=0, rotation=0,
                              zoom=0, horizontal_flip=True)
    assert len(gen) == 1

    model = XceptionOS8Net()
    params, state = model.init(jax.random.key(0))
    assert "custom_logits_semantic" in params  # 19 classes != 21

    mesh = get_mesh(jax.devices()[:8])  # 8-way DP
    tr = Trainer(model, epochs=1, lr=1e-3, verbose=0, mesh=mesh,
                 freeze_before="concat_projection")
    hist = tr.fit(params, state, gen)
    assert np.isfinite(hist["loss"][0])
    # frozen entry flow untouched; decoder moved
    np.testing.assert_array_equal(
        np.asarray(tr.params["entry_flow_conv1_1"]["kernel"]),
        np.asarray(params["entry_flow_conv1_1"]["kernel"]))
    assert not np.allclose(
        np.asarray(tr.params["decoder_conv1_pointwise"]["kernel"]),
        np.asarray(params["decoder_conv1_pointwise"]["kernel"]))
