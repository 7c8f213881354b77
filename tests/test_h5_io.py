"""h5 round-trip: save in Keras layout, reload by name, verify parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.core import init_model, apply_model
from deeplab_tpu.ops.conv import conv2d, depthwise_conv2d
from deeplab_tpu.ops.bn import batch_norm
from deeplab_tpu.params import load_keras_h5, save_keras_h5


def _toy(ctx, x):
    x = conv2d(ctx, x, 8, 3, "conv1", use_bias=True)
    x = batch_norm(ctx, x, "conv1_BN")
    x = depthwise_conv2d(ctx, x, 3, "dw1")
    return x


def test_h5_roundtrip(tmp_path):
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    params, state = init_model(_toy, jax.random.key(0), x)
    y0, _ = apply_model(_toy, params, state, x)

    path = str(tmp_path / "w.h5")
    save_keras_h5(path, params, state)

    # fresh init -> different outputs -> load -> identical outputs
    params2, state2 = init_model(_toy, jax.random.key(1), x)
    y1, _ = apply_model(_toy, params2, state2, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))

    params3, state3 = load_keras_h5(path, params2, state2)
    y2, _ = apply_model(_toy, params3, state3, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y2))


def test_h5_keras_file_layout(tmp_path):
    """File must follow the Keras save_weights layout so the reference's
    load_weights can read it (layer groups, weight_names attr, :0 suffix)."""
    import h5py
    x = jnp.zeros((1, 8, 8, 3))
    params, state = init_model(_toy, jax.random.key(0), x)
    path = str(tmp_path / "w.h5")
    save_keras_h5(path, params, state)
    with h5py.File(path, "r") as f:
        assert "layer_names" in f.attrs
        names = [n.decode() for n in f.attrs["layer_names"]]
        assert "conv1" in names and "conv1_BN" in names
        wn = [n.decode() for n in f["conv1"].attrs["weight_names"]]
        assert wn == ["conv1/kernel:0", "conv1/bias:0"]
        assert f["conv1"]["conv1/kernel:0"].shape == (3, 3, 3, 8)
        wn_bn = [n.decode() for n in f["conv1_BN"].attrs["weight_names"]]
        assert wn_bn == ["conv1_BN/gamma:0", "conv1_BN/beta:0",
                         "conv1_BN/moving_mean:0",
                         "conv1_BN/moving_variance:0"]


def test_h5_by_name_skips_unknown(tmp_path):
    x = jnp.zeros((1, 8, 8, 3))
    params, state = init_model(_toy, jax.random.key(0), x)
    path = str(tmp_path / "w.h5")
    save_keras_h5(path, params, state)

    def smaller(ctx, x):
        return conv2d(ctx, x, 8, 3, "conv1", use_bias=True)

    p2, s2 = init_model(smaller, jax.random.key(1), x)
    p3, _ = load_keras_h5(path, p2, s2)  # extra file layers skipped
    np.testing.assert_array_equal(np.asarray(p3["conv1"]["kernel"]),
                                  np.asarray(params["conv1"]["kernel"]))


def test_h5_shape_mismatch_raises(tmp_path):
    x = jnp.zeros((1, 8, 8, 3))
    params, state = init_model(_toy, jax.random.key(0), x)
    path = str(tmp_path / "w.h5")
    save_keras_h5(path, params, state)

    def wider(ctx, x):
        return conv2d(ctx, x, 16, 3, "conv1", use_bias=True)

    p2, s2 = init_model(wider, jax.random.key(1), x)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_keras_h5(path, p2, s2)


def test_subpixel_name_alias(tmp_path):
    """A file layer named 'subpixel_1' (Keras auto-name) maps onto our
    'subpixel' layer (SURVEY.md C9)."""
    import h5py
    path = str(tmp_path / "sp.h5")
    k = np.random.RandomState(0).randn(1, 1, 4, 8).astype(np.float32)
    b = np.zeros(8, np.float32)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([b"subpixel_1"])
        g = f.create_group("subpixel_1")
        g.attrs["weight_names"] = np.array(
            [b"subpixel_1/kernel:0", b"subpixel_1/bias:0"])
        g.create_dataset("subpixel_1/kernel:0", data=k)
        g.create_dataset("subpixel_1/bias:0", data=b)
    params = {"subpixel": {"kernel": jnp.zeros((1, 1, 4, 8)),
                           "bias": jnp.zeros((8,))}}
    p2, _ = load_keras_h5(path, params, {})
    np.testing.assert_array_equal(np.asarray(p2["subpixel"]["kernel"]), k)
