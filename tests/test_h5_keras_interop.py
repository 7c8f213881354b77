"""h5 contract against files actually written by tf.keras (VERDICT r1 #5).

Three directions, all with logit parity on the golden MobileNetV2-DeepLab
trunk (reference load path: deeplabv3p.py:465 ``load_weights(by_name=True)``):

1. import a legacy Keras-2-layout h5 written by keras' own legacy writer
   (the format the reference's shipped weights use);
2. import a Keras-3 ``.weights.h5`` written by ``Model.save_weights``;
3. export with our writer, load into tf.keras with the legacy by-name
   loader (what the reference would do with our file).

Plus the subpixel-head trap (reference subpixel.py:77-88 channel order):
a keras-written subpixel conv loads into SegNet('subpixel') and the full
head output matches the TF transcription.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import h5py  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplab_tpu.models.deeplabv3p import Deeplabv3  # noqa: E402
from deeplab_tpu.params import load_keras_h5, save_keras_h5  # noqa: E402

from test_full_model_golden import SZ, _keras_trunk  # noqa: E402

try:
    from keras.src.legacy.saving import legacy_h5_format
except ImportError:  # pragma: no cover - keras 2 exposes it on tf.keras
    legacy_h5_format = None


@pytest.fixture(scope="module")
def golden():
    tf.keras.utils.set_random_seed(0)
    kmodel = _keras_trunk()
    rng = np.random.RandomState(0)
    x = (rng.rand(2, SZ, SZ, 3) * 255).astype(np.float32)
    ref = kmodel(x, training=False).numpy()
    return kmodel, x, ref


def _ours_from_file(path, x):
    ours = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                     backbone="mobilenetv2")
    params, state = ours.init(jax.random.key(0))
    params, state = load_keras_h5(path, params, state)
    got, _ = ours.apply(params, state, jnp.asarray(x), return_features=True)
    return np.asarray(got)


def test_import_legacy_keras_written_h5(golden, tmp_path):
    kmodel, x, ref = golden
    assert legacy_h5_format is not None
    path = str(tmp_path / "legacy.h5")
    with h5py.File(path, "w") as f:
        legacy_h5_format.save_weights_to_hdf5_group(f, kmodel)
    got = _ours_from_file(path, x)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert np.mean(np.abs(got - ref)) < 1e-4 * max(1.0, np.abs(ref).mean())


def test_import_keras3_weights_h5(golden, tmp_path):
    kmodel, x, ref = golden
    path = str(tmp_path / "k3.weights.h5")
    kmodel.save_weights(path)
    got = _ours_from_file(path, x)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert np.mean(np.abs(got - ref)) < 1e-4 * max(1.0, np.abs(ref).mean())


def test_export_loads_into_keras_by_name(golden, tmp_path):
    kmodel, x, ref = golden
    assert legacy_h5_format is not None
    # our independently initialized model, exported with our writer
    ours = Deeplabv3(weights=None, input_shape=(SZ, SZ, 3), classes=21,
                     backbone="mobilenetv2")
    params, state = ours.init(jax.random.key(7))
    mine, _ = ours.apply(params, state, jnp.asarray(x), return_features=True)
    path = str(tmp_path / "ours.h5")
    save_keras_h5(path, params, state)
    # keras reads it by name (the reference's load path for foreign files)
    with h5py.File(path, "r") as f:
        legacy_h5_format.load_weights_from_hdf5_group_by_name(f, kmodel)
    theirs = kmodel(x, training=False).numpy()
    np.testing.assert_allclose(np.asarray(mine), theirs, rtol=2e-3, atol=2e-3)


def _reference_phase_shift_tf(I, r):
    """Transcription of reference subpixel.py:77-88 (_phase_shift)."""
    bsize, a, b, c = I.shape
    f = c // (r * r)
    X = tf.reshape(I, [bsize, a, b, f, r, r])
    X = tf.transpose(X, (0, 1, 2, 5, 4, 3))  # bsize, a, b, r, r, f
    X = tf.split(X, a, 1)
    X = tf.concat([tf.squeeze(x, axis=1) for x in X], 2)
    X = tf.split(X, b, 1)
    X = tf.concat([tf.squeeze(x, axis=1) for x in X], 2)
    return tf.reshape(X, [bsize, a * r, b * r, f])


def test_subpixel_head_keras_h5_parity(tmp_path):
    """A tf.keras-written h5 holding the full model incl. the subpixel conv
    (auto-named, reference SegModel style) loads into SegNet('subpixel')
    with end-to-end probability parity against keras + the reference's
    _phase_shift transcription."""
    from deeplab_tpu.models.seg_model import SegNet

    tf.keras.utils.set_random_seed(1)
    kmodel = _keras_trunk()
    L = tf.keras.layers
    n, r = 21, 8
    feats = kmodel.output
    y = L.Conv2D(n * r * r, 1, use_bias=True, name="subpixel_1")(feats)
    head = tf.keras.Model(kmodel.input, y)

    path = str(tmp_path / "subpixel.h5")
    with h5py.File(path, "w") as f:
        legacy_h5_format.save_weights_to_hdf5_group(f, head)

    rng = np.random.RandomState(0)
    x = (rng.rand(2, SZ, SZ, 3) * 255).astype(np.float32)
    conv_out = head(x, training=False)
    shifted = _reference_phase_shift_tf(conv_out, r).numpy()
    ref_probs = tf.nn.softmax(
        tf.reshape(shifted, [2, SZ * SZ, n])).numpy()

    ours = SegNet((SZ, SZ), n, "mobilenetv2", "subpixel")
    params, state = ours.init(jax.random.key(0))
    params, state = load_keras_h5(path, params, state)
    got, _ = ours.apply(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref_probs,
                               rtol=2e-3, atol=2e-3)


def test_shipped_subpixel_fixture_loads():
    """The committed weights/mobilenetv2_subpixel.h5 is tf.keras-written
    (backend attr 'tensorflow', not our writer) and loads into
    SegNet('subpixel') producing valid probabilities."""
    import os
    from deeplab_tpu.models.seg_model import SegNet

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "mobilenetv2_subpixel.h5")
    if not os.path.exists(path):
        pytest.skip("fixture not present")
    with h5py.File(path, "r") as f:
        backend = f.attrs.get("backend", b"")
        assert (backend.decode() if isinstance(backend, bytes)
                else backend) == "tensorflow"
    ours = SegNet((64, 64), 21, "mobilenetv2", "subpixel")
    params, state = ours.init(jax.random.key(0))
    params, state = load_keras_h5(path, params, state)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 255,
                    jnp.float32)
    probs, _ = ours.apply(params, state, x)
    probs = np.asarray(probs)
    assert np.all(np.isfinite(probs))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
