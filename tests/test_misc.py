"""Loggers, multi-device predict, pretrained-weight resolution."""

import json
import os

import numpy as np
import pytest
import jax

from deeplab_tpu.train.callbacks import JSONLLogger
from deeplab_tpu.train.trainer import Trainer
from deeplab_tpu.parallel.mesh import get_mesh, get_available_devices
from tests.test_trainer import FakeGen, TinySegNet


def test_jsonl_logger(tmp_path):
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    path = str(tmp_path / "log.jsonl")
    tr = Trainer(model, epochs=2, lr=1e-2, verbose=0,
                 callbacks=[JSONLLogger(path)])
    tr.fit(params, state, FakeGen())
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert {"epoch", "lr", "loss", "Jaccard"} <= set(lines[0])


def test_tensorboard_callback(tmp_path):
    pytest.importorskip("tensorflow")
    from deeplab_tpu.train.callbacks import TensorBoard
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    logdir = str(tmp_path / "tb")
    tr = Trainer(model, epochs=2, lr=1e-2, verbose=0,
                 callbacks=[TensorBoard(log_dir=logdir)])
    tr.fit(params, state, FakeGen())
    files = []
    for root, _, names in os.walk(logdir):
        files += [n for n in names if "tfevents" in n]
    assert files, "no tensorboard event files written"


def test_multi_device_predict_matches_single():
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    X = np.random.RandomState(0).rand(16, 16, 16, 3).astype(np.float32) * 255

    tr1 = Trainer(model, verbose=0, mesh=get_mesh(jax.devices()[:1]))
    tr8 = Trainer(model, verbose=0, mesh=get_mesh(jax.devices()[:8]))
    p1 = tr1.predict(params, state, X, batch_size=8)
    p8 = tr8.predict(params, state, X, batch_size=8)
    np.testing.assert_allclose(p1, p8, rtol=1e-5, atol=1e-6)
    # non-divisible batch falls back to the single-device path
    p_odd = tr8.predict(params, state, X[:3], batch_size=8)
    np.testing.assert_allclose(p_odd, p1[:3], rtol=1e-5, atol=1e-6)


def test_get_available_devices():
    assert len(get_available_devices("cpu")) == 8
    assert get_available_devices("tpu") == []


def test_pretrained_pascal_voc_local_cache(tmp_path, monkeypatch):
    """Deeplabv3(weights='pascal_voc') resolves the bonlime filename from a
    local dir (deeplabv3p.py:456-465 contract; no egress here)."""
    from deeplab_tpu.models.deeplabv3p import Deeplabv3
    from deeplab_tpu.params import save_keras_h5

    m = Deeplabv3(weights=None, input_shape=(32, 32, 3), classes=21,
                  backbone="mobilenetv2")
    params, state = m.init(jax.random.key(0))
    fname = "deeplabv3_mobilenetv2_tf_dim_ordering_tf_kernels.h5"
    save_keras_h5(str(tmp_path / fname), params, state)

    monkeypatch.setenv("DEEPLAB_TPU_WEIGHTS_DIR", str(tmp_path))
    m2 = Deeplabv3(weights="pascal_voc", input_shape=(32, 32, 3), classes=21,
                   backbone="mobilenetv2")
    p2, s2 = m2.init(jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(p2["Conv"]["kernel"]),
                                  np.asarray(params["Conv"]["kernel"]))

    monkeypatch.setenv("DEEPLAB_TPU_WEIGHTS_DIR", str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        m2.init(jax.random.key(1))


def test_voc_palette_colorize_and_figure(tmp_path):
    """Cell-9 visualization parity (reference examples/exp1-4.JPG)."""
    import numpy as np
    from deeplab_tpu.viz import colorize_mask, plot_predictions, voc_palette

    p = voc_palette()
    # devkit constants: background, aeroplane, person
    assert tuple(p[0]) == (0, 0, 0)
    assert tuple(p[1]) == (128, 0, 0)
    assert tuple(p[15]) == (192, 128, 128)
    mask = np.random.RandomState(0).randint(0, 21, (16, 16))
    rgb = colorize_mask(mask)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    img = np.random.RandomState(1).rand(16, 16, 3) * 255
    out = str(tmp_path / "fig.png")
    plot_predictions(img, [("GT", mask), ("pred", mask)], path=out)
    import os
    assert os.path.getsize(out) > 1000
