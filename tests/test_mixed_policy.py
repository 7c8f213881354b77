"""The "mixed" compute policy: f32 activations + single-pass bf16 MXU convs.

The production serving policy (core.Ctx.mxu_bf16): on TPU it measured
f32-level mIoU (+0.005 pt vs the f32/HIGHEST parity path on mini_voc) at
1478 img/s/chip model-only vs f32's 538, where end-to-end bf16 costs
-0.11 pt (tools/grade_production.py attribution, round 4).  On CPU the
DEFAULT conv precision is plain f32, so mixed must match f32 tightly —
which pins the plumbing (dtype resolution, ctx threading, every conv call
site) without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplab_tpu import core
from deeplab_tpu.models.seg_model import SegNet

SZ = 64


def test_resolve_compute_dtype():
    assert core.resolve_compute_dtype("mixed") == (jnp.float32, True)
    assert core.resolve_compute_dtype(jnp.float32) == (jnp.float32, False)
    assert core.resolve_compute_dtype(jnp.bfloat16) == (jnp.bfloat16, False)


@pytest.fixture(scope="module")
def built():
    model = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = model.init(jax.random.key(0))
    r = np.random.RandomState(3)
    img = jnp.asarray(r.rand(2, SZ, SZ, 3) * 255, jnp.float32)
    return model, params, state, img


def test_mixed_matches_f32_on_cpu(built):
    model, params, state, img = built
    out_f32, _ = model.apply(params, state, img, compute_dtype=jnp.float32)
    out_mix, _ = model.apply(params, state, img, compute_dtype="mixed")
    assert out_mix.dtype == jnp.float32
    # CPU executes DEFAULT-precision f32 convs in full f32, so the only
    # difference is HIGHEST-vs-DEFAULT algorithm selection — tight match
    np.testing.assert_allclose(np.asarray(out_mix), np.asarray(out_f32),
                               rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.argmax(np.asarray(out_mix), -1),
                          np.argmax(np.asarray(out_f32), -1))


def test_predictor_mixed_default(built):
    from deeplab_tpu.predictor import Predictor
    model, params, state, img = built
    pred = Predictor(model, params, state)  # default compute_dtype="mixed"
    masks = pred(np.asarray(img))
    assert masks.shape == (2, SZ, SZ)
    assert masks.dtype == np.int32
    assert masks.min() >= 0 and masks.max() < 21


def test_export_meta_mixed(built, tmp_path):
    from deeplab_tpu.export import load_serving, save_serving
    model, params, state, img = built
    path = str(tmp_path / "serving_mixed.npz")
    save_serving(path, model, params, state, crf=None, batch=2,
                 compute_dtype="mixed")
    art = load_serving(path)
    assert art.meta["compute_dtype"] == "mixed"
    masks = art(np.asarray(img))
    assert masks.shape == (2, SZ, SZ)
