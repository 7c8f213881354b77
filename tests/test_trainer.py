"""Trainer: loss decreases, freeze policy, callbacks, 8-device DP parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu import core
from deeplab_tpu.ops.conv import conv2d
from deeplab_tpu.ops.bn import batch_norm
from deeplab_tpu.ops.resize import resize_bilinear_tf1
from deeplab_tpu.parallel.mesh import get_mesh
from deeplab_tpu.train.callbacks import (EarlyStopping, ModelCheckpoint,
                                         ReduceLROnPlateau)
from deeplab_tpu.train.optimizer import freeze_set
from deeplab_tpu.train.trainer import Trainer

SZ, C = 16, 4


class TinySegNet:
    """Minimal stand-in with the SegNet interface: conv trunk + head whose
    layer names exercise the freeze policy."""

    n_classes = C

    def forward(self, ctx, img):
        x = img / 127.5 - 1.0
        x = conv2d(ctx, x, 8, 3, "trunk_conv")
        x = batch_norm(ctx, x, "trunk_conv_BN")
        x = jax.nn.relu(x)
        x = conv2d(ctx, x, 8, 1, "concat_projection")
        x = jax.nn.relu(x)
        x = conv2d(ctx, x, C, 1, "conv_upsample", use_bias=True)
        x = resize_bilinear_tf1(x, (SZ, SZ))
        x = x.reshape(x.shape[0], SZ * SZ, C)
        return jax.nn.softmax(x, axis=-1)

    def init(self, rng, batch_size=1):
        return core.init_model(self.forward, rng,
                               jnp.zeros((batch_size, SZ, SZ, 3)))

    def apply(self, params, state, img, training=False, rng=None,
              frozen=frozenset(), compute_dtype=None):
        return core.apply_model(self.forward, params, state, img,
                                training=training, rng=rng, frozen=frozen,
                                compute_dtype=compute_dtype or jnp.float32)


class FakeGen:
    def __init__(self, n_batches=2, bs=8, seed=0):
        rng = np.random.RandomState(seed)
        self.batches = []
        for _ in range(n_batches):
            X = rng.rand(bs, SZ, SZ, 3).astype(np.float32) * 255
            Y = rng.randint(0, C, (bs, SZ * SZ, 1)).astype(np.float32)
            # deterministic labels from pixel intensity so the task is learnable
            Y[..., 0] = (X.mean(-1).reshape(bs, -1) // 64).clip(0, C - 1)
            SW = np.ones((bs, SZ * SZ), np.float32)
            self.batches.append((X, Y, {"pred_mask": SW}))

    def __len__(self):
        return len(self.batches)

    def __getitem__(self, i):
        return self.batches[i]

    def on_epoch_end(self):
        pass


def test_training_reduces_loss():
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tr = Trainer(model, epochs=8, lr=1e-2, verbose=0)
    hist = tr.fit(params, state, FakeGen(), FakeGen(seed=1))
    assert hist["loss"][-1] < hist["loss"][0] * 0.9
    assert "val_Jaccard" in hist and len(hist["val_Jaccard"]) == 8


def test_training_is_deterministic():
    """Same seed + data -> identical history and params across runs."""
    model = TinySegNet()
    gen = FakeGen()
    h = []
    p = []
    for _ in range(2):
        params, state = model.init(jax.random.key(0))
        tr = Trainer(model, epochs=2, lr=1e-2, verbose=0, seed=3)
        h.append(tr.fit(params, state, gen))
        p.append(tr.params)
    np.testing.assert_array_equal(h[0]["loss"], h[1]["loss"])
    for layer in p[0]:
        for k in p[0][layer]:
            np.testing.assert_array_equal(np.asarray(p[0][layer][k]),
                                          np.asarray(p[1][layer][k]))


def test_bf16_training_converges():
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tr = Trainer(model, epochs=6, lr=1e-2, verbose=0,
                 compute_dtype=jnp.bfloat16)
    hist = tr.fit(params, state, FakeGen())
    assert hist["loss"][-1] < hist["loss"][0] * 0.95


def test_remat_training_matches_plain():
    model = TinySegNet()
    gen = FakeGen()
    params, state = model.init(jax.random.key(0))
    tr1 = Trainer(model, epochs=2, lr=1e-2, verbose=0)
    h1 = tr1.fit(params, state, gen)
    params2, state2 = model.init(jax.random.key(0))
    tr2 = Trainer(model, epochs=2, lr=1e-2, verbose=0, remat=True)
    h2 = tr2.fit(params2, state2, gen)
    np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-5)
    for layer in tr1.params:
        for k in tr1.params[layer]:
            np.testing.assert_allclose(np.asarray(tr1.params[layer][k]),
                                       np.asarray(tr2.params[layer][k]),
                                       rtol=1e-5, atol=1e-6)


def test_fit_does_not_invalidate_caller_arrays():
    """Regression: donation must not delete the caller's params/state (on a
    1-device mesh device_put is a no-op, so fit must copy before donating)."""
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tr = Trainer(model, epochs=1, lr=1e-2, verbose=0)
    tr.fit(params, state, FakeGen())
    # caller's arrays still usable
    out, _ = model.apply(params, state, jnp.zeros((1, SZ, SZ, 3)))
    assert np.isfinite(np.asarray(out)).all()


def test_freeze_set_policy():
    model = TinySegNet()
    params, _ = model.init(jax.random.key(0))
    frozen = freeze_set(params, "concat_projection")
    assert "trunk_conv" in frozen and "trunk_conv_BN" in frozen
    assert "concat_projection" not in frozen
    assert "conv_upsample" not in frozen
    assert freeze_set(params, None) == frozenset()


def test_frozen_layers_do_not_move():
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    before_trunk = np.asarray(params["trunk_conv"]["kernel"]).copy()
    before_head = np.asarray(params["conv_upsample"]["kernel"]).copy()
    before_bn_mean = np.asarray(state["trunk_conv_BN"]["moving_mean"]).copy()
    tr = Trainer(model, epochs=2, lr=1e-2, freeze_before="concat_projection",
                 verbose=0)
    tr.fit(params, state, FakeGen())
    np.testing.assert_array_equal(
        np.asarray(tr.params["trunk_conv"]["kernel"]), before_trunk)
    # frozen BN keeps moving stats (Keras >=2.1.3 inference-mode semantics)
    np.testing.assert_array_equal(
        np.asarray(tr.state["trunk_conv_BN"]["moving_mean"]), before_bn_mean)
    assert not np.allclose(
        np.asarray(tr.params["conv_upsample"]["kernel"]), before_head)


def test_callbacks_checkpoint_and_early_stop(tmp_path):
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    path = str(tmp_path / "best.h5")
    cbs = [ModelCheckpoint(path, monitor="val_Jaccard", mode="max"),
           EarlyStopping(monitor="val_Jaccard", patience=1),
           ReduceLROnPlateau(monitor="val_Jaccard", patience=1, factor=0.5)]
    tr = Trainer(model, epochs=50, lr=1e-3, callbacks=cbs, verbose=0)
    tr.fit(params, state, FakeGen(), FakeGen(seed=1))
    import os
    assert os.path.exists(path)
    # early stopping must have fired long before 50 epochs on a tiny task
    assert tr.stop_training or len(tr.callbacks) > 0


def test_lr_plateau_reduces_scale():
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    cb = ReduceLROnPlateau(monitor="val_Jaccard", patience=1, factor=0.5)
    tr = Trainer(model, epochs=1, lr=1e-3, callbacks=[cb], verbose=0)
    tr.fit(params, state, FakeGen(), FakeGen(seed=1))
    # simulate two non-improving epochs
    cb.on_epoch_end(1, {"val_Jaccard": -1.0})
    cb.on_epoch_end(2, {"val_Jaccard": -1.0})
    assert tr.lr_scale < 1.0


@pytest.mark.parametrize("n_dev", [8])
def test_data_parallel_matches_single_device(n_dev):
    """pjit batch-sharded step == single-device step (SURVEY.md §4)."""
    assert jax.device_count() >= n_dev
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    gen = FakeGen(n_batches=2, bs=8)

    tr1 = Trainer(model, epochs=2, lr=1e-2, verbose=0,
                  mesh=get_mesh(jax.devices()[:1]))
    h1 = tr1.fit(params, state, gen)

    params2, state2 = model.init(jax.random.key(0))
    tr8 = Trainer(model, epochs=2, lr=1e-2, verbose=0,
                  mesh=get_mesh(jax.devices()[:n_dev]))
    h8 = tr8.fit(params2, state2, gen)

    np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=1e-4)
    for layer in tr1.params:
        for k in tr1.params[layer]:
            np.testing.assert_allclose(
                np.asarray(tr1.params[layer][k]),
                np.asarray(tr8.params[layer][k]), rtol=1e-4, atol=1e-5)


def test_freeze_set_order_survives_tree_map_key_sorting():
    """Regression: jax.tree.map rebuilds param dicts with SORTED keys, so
    deriving 'everything before X in graph order' from a post-training or
    post-restore tree silently froze the wrong layers.  The model captures
    layer_order at init; freeze_set must honor it regardless of the dict's
    current key order."""
    model = TinySegNet()
    params, _ = model.init(jax.random.key(0))
    want = freeze_set(params, "concat_projection")
    mapped = jax.tree.map(lambda x: x, params)   # keys now sorted
    got = freeze_set(mapped, "concat_projection",
                     order=getattr(model, "layer_order", tuple(params)))
    assert got == want


def test_fit_resets_stop_training():
    """Regression: a Trainer reused after EarlyStopping fired used to train
    at most one epoch on the next fit()."""
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tr = Trainer(model, epochs=2, lr=1e-2, verbose=0)
    tr.stop_training = True   # as left behind by a previous EarlyStopping
    hist = tr.fit(params, state, FakeGen())
    assert len(hist["loss"]) == 2


def test_short_in_memory_dataset_on_virtual_mesh():
    """Regression: ArrayBatcher serves a batch SMALLER than batch_size when
    the dataset is tiny; the mesh guard must shrink to a submesh the actual
    batch divides instead of crashing on sharded device_put."""
    from deeplab_tpu.data.generator import ArrayBatcher
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    X = rng.rand(6, SZ, SZ, 3).astype(np.float32) * 255   # 6 < bs=16
    Y = rng.randint(0, C, (6, SZ * SZ)).astype(np.float32)
    gen = ArrayBatcher(X, Y, batch_size=16, n_classes=C)
    tr = Trainer(model, epochs=1, lr=1e-2, verbose=0)
    hist = tr.fit(params, state, gen, valid_gen=gen)
    assert np.isfinite(hist["loss"]).all()


def test_callback_state_round_trips_through_checkpoint(tmp_path):
    """Regression: after a preemption resume, ModelCheckpoint.best reset to
    -inf and the first post-resume epoch overwrote the best-weights h5 with
    possibly worse weights; plateau/early-stop counters also restarted.
    Callback state now rides the train-state checkpoint."""
    from deeplab_tpu.train.callbacks import (EarlyStopping, ModelCheckpoint,
                                             ReduceLROnPlateau)
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "train_state.npz")
    cbs = [ModelCheckpoint(str(tmp_path / "w.h5")),
           ReduceLROnPlateau(patience=3), EarlyStopping(patience=5)]
    tr = Trainer(model, epochs=2, lr=1e-2, callbacks=cbs, verbose=0)
    tr.fit(params, state, FakeGen(), valid_gen=FakeGen(),
           state_checkpoint=ckpt)
    bests = [cb.best for cb in cbs]
    assert np.isfinite(bests[0])
    # fresh trainer + callbacks, resumed: best/wait must be restored
    cbs2 = [ModelCheckpoint(str(tmp_path / "w.h5")),
            ReduceLROnPlateau(patience=3), EarlyStopping(patience=5)]
    tr2 = Trainer(model, epochs=2, lr=1e-2, callbacks=cbs2, verbose=0)
    tr2.fit(params, state, FakeGen(), valid_gen=FakeGen(),
            state_checkpoint=ckpt, resume_from=ckpt)
    # set_state ran before any epoch could clobber the h5: best is at
    # least the first run's best (monotone under mode='max')
    assert cbs2[0].best >= bests[0] - 1e-9


def test_model_checkpoint_unconditional_save(tmp_path):
    """save_best_only=False must save every epoch even without the
    monitored metric (Keras semantics) — it used to save nothing."""
    from deeplab_tpu.train.callbacks import ModelCheckpoint
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    path = str(tmp_path / "every.h5")
    cb = ModelCheckpoint(path, save_best_only=False)
    tr = Trainer(model, epochs=1, lr=1e-2, callbacks=[cb], verbose=0)
    tr.fit(params, state, FakeGen())   # no valid_gen -> no val_Jaccard
    import os
    assert os.path.exists(path)


def test_profile_dir_writes_trace(tmp_path):
    """Trainer(profile_dir=...) captures a jax.profiler trace of the
    configured step window (SURVEY §5.1 shipped as a feature)."""
    import os
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    logdir = str(tmp_path / "trace")
    tr = Trainer(model, epochs=2, lr=1e-2, verbose=0,
                 profile_dir=logdir, profile_steps=(1, 3))
    tr.fit(params, state, FakeGen(), None)
    assert tr._profiler is not None and tr._profiler.done
    assert not tr._profiler.active
    # jax writes plugins/profile/<ts>/*.trace.json.gz (+ .xplane.pb)
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "no trace files written"


def test_step_window_profiler_close_recovers():
    """A window that never reaches its stop step is closed by fit()."""
    from deeplab_tpu.train.profiling import StepWindowProfiler
    model = TinySegNet()
    params, state = model.init(jax.random.key(0))
    tr = Trainer(model, epochs=1, lr=1e-2, verbose=0,
                 profile_dir=None)
    # window starts at step 1 but the run has only 2 steps and stop=99
    tr.profile_dir = "/tmp/_unused_trace_dir"
    tr.profile_steps = (1, 99)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        tr.profile_dir = d
        tr.fit(params, state, FakeGen(), None)
        assert tr._profiler.done and not tr._profiler.active
