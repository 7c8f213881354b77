"""AOT serving export (deeplab_tpu/export.py): the StableHLO artifact must
reproduce the live Predictor pipeline bit-for-bit, round-trip through disk,
serve symbolic batches, and hot-swap weights.

The reference has no deployment artifact at all (its serving story is
rebuilding the Keras graph from Python + h5, deeplabv3p.py:209 + notebook
cell 7); these tests pin the TPU-native replacement's contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplab_tpu.crf import CrfConfig
from deeplab_tpu.export import (ServingArtifact, build_serving_fn,
                                export_serving, load_serving, save_serving)
from deeplab_tpu.models.seg_model import SegNet
from deeplab_tpu.predictor import Predictor

SZ = (64, 64)


@pytest.fixture(scope="module")
def net_and_weights():
    net = SegNet(SZ, 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    return net, params, state


def _images(b, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(b, SZ[0], SZ[1], 3) * 255).astype(np.float32)


def test_export_matches_predictor_model_only(net_and_weights):
    net, params, state = net_and_weights
    exp = export_serving(net, params, state, batch=2)
    out = jax.jit(exp.call)(params, state, jnp.asarray(_images(2)))
    ref = Predictor(net, params, state, crf=None)(_images(2))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_symbolic_batch_serves_any_size(net_and_weights):
    net, params, state = net_and_weights
    exp = export_serving(net, params, state, batch=None)
    fn = jax.jit(exp.call)
    ref = Predictor(net, params, state, crf=None)
    for b in (1, 3):
        out = fn(params, state, jnp.asarray(_images(b, seed=b)))
        np.testing.assert_array_equal(np.asarray(out), ref(_images(b, seed=b)))


def test_artifact_roundtrip_with_crf(net_and_weights, tmp_path):
    net, params, state = net_and_weights
    crf = CrfConfig(n_iters=2, color_step=2.5, splat_stride=4)
    path = tmp_path / "serving.npz"
    save_serving(path, net, params, state, crf=crf, batch=2)
    art = load_serving(path)
    assert art.meta["crf"]["n_iters"] == 2
    assert art.meta["image_size"] == list(SZ)
    imgs = _images(2, seed=7)
    ref = Predictor(net, params, state, crf=crf)(imgs)
    np.testing.assert_array_equal(art(imgs), ref)


def test_artifact_pads_ragged_batches(net_and_weights, tmp_path):
    net, params, state = net_and_weights
    path = tmp_path / "serving.npz"
    save_serving(path, net, params, state, batch=4)
    art = load_serving(path)
    imgs = _images(3, seed=3)
    ref = Predictor(net, params, state, crf=None)(imgs)
    out = art(imgs)
    assert out.shape == (3,) + SZ
    np.testing.assert_array_equal(out, ref)
    with pytest.raises(ValueError):
        art(_images(5))


def test_artifact_weight_hotswap(net_and_weights, tmp_path):
    net, params, state = net_and_weights
    path = tmp_path / "serving.npz"
    save_serving(path, net, params, state, batch=1)
    art = load_serving(path)
    params2, state2 = net.init(jax.random.key(1))
    art2 = art.with_params(params2, state2)
    imgs = _images(1, seed=9)
    ref2 = Predictor(net, params2, state2, crf=None)(imgs)
    np.testing.assert_array_equal(art2(imgs), ref2)
    # the original artifact is untouched
    ref = Predictor(net, params, state, crf=None)(imgs)
    np.testing.assert_array_equal(art(imgs), ref)


def test_loader_needs_no_model_code(net_and_weights, tmp_path):
    """The artifact must run without rebuilding the net: simulate by using
    only what load_serving returns (no SegNet/Predictor on that path)."""
    net, params, state = net_and_weights
    path = tmp_path / "serving.npz"
    save_serving(path, net, params, state, batch=None,
                 crf=CrfConfig(n_iters=1, color_step=2.5, splat_stride=4))
    art = ServingArtifact.load(path)
    out = art(_images(2, seed=11))
    assert out.shape == (2,) + SZ
    assert out.dtype in (np.int32, np.int64)
    assert set(np.unique(out)) <= set(range(21))


def test_build_serving_fn_is_the_predictor_math(net_and_weights):
    net, params, state = net_and_weights
    crf = CrfConfig(n_iters=1, color_step=2.5, splat_stride=4)
    fn = jax.jit(build_serving_fn(net, crf))
    imgs = jnp.asarray(_images(2, seed=5))
    ref = Predictor(net, params, state, crf=crf)(np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(fn(params, state, imgs)), ref)


def test_multiplatform_export_from_cpu_host(net_and_weights, tmp_path):
    """platforms=('tpu','cpu') lowers both targets from a CPU host (the
    XLA-only graph — fused Pallas kernels are gated off here) and the
    artifact still executes on the exporting platform."""
    net, params, state = net_and_weights
    path = tmp_path / "xplat.npz"
    save_serving(path, net, params, state, batch=2,
                 crf=CrfConfig(n_iters=1, color_step=2.5, splat_stride=4),
                 platforms=("tpu", "cpu"))
    art = load_serving(path)
    assert art.meta["platforms"] == ["tpu", "cpu"]
    imgs = _images(2, seed=13)
    ref = Predictor(net, params, state,
                    crf=CrfConfig(n_iters=1, color_step=2.5,
                                  splat_stride=4))(imgs)
    np.testing.assert_array_equal(art(imgs), ref)
