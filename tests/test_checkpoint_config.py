"""Train-state checkpoint round-trip, resume, config serialization, viz."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.config import Config
from deeplab_tpu.train.checkpoint import restore_train_state, save_train_state
from deeplab_tpu.train.trainer import Trainer
from tests.test_trainer import FakeGen, TinySegNet


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.model.backbone = "xception"
    cfg.train.epochs = 3
    cfg.data.brightness = 0.7
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    back = Config.load(path)
    assert back.model.backbone == "xception"
    assert back.train.epochs == 3
    assert back.data.brightness == 0.7
    assert back.model.image_size == (512, 512)


def test_config_rejects_unknown_keys():
    with pytest.raises(KeyError):
        Config.from_json('{"model": {"nonsense": 1}}')


def test_train_state_roundtrip(tmp_path):
    import optax
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "ck.npz")
    save_train_state(path, params, state, opt_state, step=7, lr_scale=0.5,
                     extra={"epoch": 3})
    p2, s2, o2, step, lr_scale, extra = restore_train_state(
        path, params, state, opt_state)
    assert step == 7 and lr_scale == 0.5 and extra["epoch"] == 3
    for layer in params:
        for k in params[layer]:
            np.testing.assert_array_equal(np.asarray(params[layer][k]),
                                          p2[layer][k])


def test_trainer_resume_continues(tmp_path):
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    ck = str(tmp_path / "state.npz")

    tr1 = Trainer(model, epochs=2, lr=1e-2, verbose=0)
    tr1.fit(params, state, FakeGen(), state_checkpoint=ck)

    # resume -> starts at epoch 2, runs 2 more
    tr2 = Trainer(model, epochs=4, lr=1e-2, verbose=0)
    params2, state2 = model.init(jax.random.key(0))
    h2 = tr2.fit(params2, state2, FakeGen(), state_checkpoint=ck,
                 resume_from=ck)
    assert len(h2["loss"]) == 2  # epochs 2..3 only

    # resumed params differ from the fresh init (they continued training)
    assert not np.allclose(
        np.asarray(tr2.params["conv_upsample"]["kernel"]),
        np.asarray(model.init(jax.random.key(0))[0]["conv_upsample"]["kernel"]))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    import optax
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "ck.npz")
    save_train_state(path, params, state, opt_state, 0, 1.0)
    bad = {k: ({kk: jnp.zeros((3, 3)) for kk in v} if k == "trunk_conv" else v)
           for k, v in params.items()}
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_train_state(path, bad, state, opt_state)


def test_viz_miou_and_calculate_iou():
    from deeplab_tpu.viz import mIOU, calculate_iou
    gt = np.array([[0, 0, 1], [1, 2, 2]])
    preds = np.array([[0, 1, 1], [1, 2, 0]])
    got = mIOU(gt, preds)
    # class0: inter 1 union 3; class1: inter 2? gt1 = {(0,2),(1,0)}, pred1 =
    # {(0,1),(0,2),(1,0)} -> inter 2 union 3; class2: inter 1 union 2
    expect = np.round(np.mean([1 / 3, 2 / 3, 1 / 2]), 2)
    assert got == expect

    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    gen = FakeGen(n_batches=1, bs=4)
    model.sz = (16, 16)
    conf, iou, mean_iou = calculate_iou(model, params, state, gen,
                                        nb_classes=4)
    assert conf.shape == (4, 4) and conf.sum() == 4 * 16 * 16
    assert 0.0 <= mean_iou <= 1.0


def test_step_timer():
    from deeplab_tpu.train.profiling import StepTimer
    t = StepTimer(window=3)
    for _ in range(5):
        t.start()
        t.stop(items=2)
    assert len(t.times) == 3
    assert t.items_per_s > 0
    assert "ms/step" in t.summary()
