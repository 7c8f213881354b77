"""Predictor: jitted end-to-end pipeline, with/without CRF, sharded."""

import numpy as np
import jax

from deeplab_tpu.crf import CrfConfig
from deeplab_tpu.models.seg_model import SegNet
from deeplab_tpu.parallel.mesh import get_mesh
from deeplab_tpu.predictor import Predictor

SZ = 32


def _net_and_weights():
    net = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    return net, params, state


def test_predictor_basic():
    net, params, state = _net_and_weights()
    pred = Predictor(net, params, state, crf=None)
    imgs = np.random.RandomState(0).rand(2, SZ, SZ, 3) * 255
    out = pred(imgs)
    assert out.shape == (2, SZ, SZ)
    assert out.dtype.kind == "i" and out.max() < 21


def test_predictor_with_crf():
    net, params, state = _net_and_weights()
    pred = Predictor(net, params, state,
                     crf=CrfConfig(color_step=2.0, splat_stride=2))
    imgs = np.random.RandomState(1).rand(2, SZ, SZ, 3) * 255
    out = pred(imgs)
    assert out.shape == (2, SZ, SZ) and out.max() < 21


def test_predictor_sharded_matches_unsharded():
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(2).rand(8, SZ, SZ, 3) * 255
    p1 = Predictor(net, params, state, crf=None)
    p8 = Predictor(net, params, state, crf=None,
                   mesh=get_mesh(jax.devices()[:8]))
    np.testing.assert_array_equal(p1(imgs), p8(imgs))


def test_predictor_sharded_crf_matches_unsharded():
    """CRF post-processing under multi-chip sharding: the CRF runs
    per-device on local shards via shard_map (its Pallas kernels have no
    SPMD partitioning rule), and must match the single-device pipeline."""
    from deeplab_tpu.crf import CrfConfig
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(3).rand(8, SZ, SZ, 3) * 255
    cfg = CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="xla")
    p1 = Predictor(net, params, state, crf=cfg)
    p8 = Predictor(net, params, state, crf=cfg,
                   mesh=get_mesh(jax.devices()[:8]))
    a, b = p1(imgs), p8(imgs)
    assert (a == b).mean() > 0.999, (a == b).mean()


def test_predictor_sharded_crf_pallas_interpret():
    """The pallas backend also runs under shard_map (interpret mode on
    CPU; on TPU the same plumbing dispatches the fused kernels per chip)."""
    from deeplab_tpu.crf import CrfConfig
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(4).rand(8, SZ, SZ, 3) * 255
    cfg = CrfConfig(sxy_bilateral=16.0, n_iters=1, backend="pallas")
    p8 = Predictor(net, params, state, crf=cfg,
                   mesh=get_mesh(jax.devices()[:8]))
    out = p8(imgs)
    assert out.shape == (8, SZ, SZ)
    assert set(np.unique(out)) <= set(range(21))


def test_predictor_data_mesh_engages_fused_blocks(monkeypatch):
    """On a data-only mesh the model runs per-device under shard_map with
    ctx.shard_local=True, so the fused MBConv serving kernels engage on
    multi-chip (they have no SPMD partitioning rule and are otherwise
    gated to a single global device).  Interpret mode stands in for the
    chip; the 8-way sharded fused pipeline must equal the 1-device-mesh
    fused pipeline exactly and agree with the XLA composition."""
    from deeplab_tpu.kernels import fused_mbconv as FM
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(6).rand(8, SZ, SZ, 3) * 255

    import jax.numpy as jnp
    xla = Predictor(net, params, state, crf=None,
                    compute_dtype=jnp.bfloat16,
                    mesh=get_mesh(jax.devices()[:8]))(imgs)

    monkeypatch.setattr(FM, "pallas_available", lambda: True)
    monkeypatch.setattr(FM, "INTERPRET", True)
    calls = []
    real = FM.fused_block_apply

    def counting(ctx, x, prefix, rate, skip, interpret=False):
        calls.append(prefix)
        return real(ctx, x, prefix, rate, skip, interpret=interpret)

    monkeypatch.setattr(FM, "fused_block_apply", counting)
    # the fused kernels gate on bf16 — the turbo policy, not the "mixed"
    # production default (tests/test_mixed_policy.py covers that path)
    p8 = Predictor(net, params, state, crf=None,
                   compute_dtype=jnp.bfloat16,
                   mesh=get_mesh(jax.devices()[:8]))(imgs)
    assert calls, "fused serving path did not engage under the data mesh"
    calls.clear()
    p1 = Predictor(net, params, state, crf=None,
                   compute_dtype=jnp.bfloat16,
                   mesh=get_mesh(jax.devices()[:1]))(imgs)
    assert calls, "fused serving path did not engage on the 1-device mesh"
    np.testing.assert_array_equal(p8, p1)
    # same argmax as the XLA composition up to bf16-vs-f32 tie flips
    assert (p8 == xla).mean() > 0.99, (p8 == xla).mean()


def test_predictor_spatial_sharded_matches_unsharded():
    """Big-image serving: image height sharded over the mesh 'space' axis
    (conv halo exchanges via XLA SPMD), CRF over whole images per data
    shard — must match the single-device pipeline."""
    from deeplab_tpu.crf import CrfConfig
    net, params, state = _net_and_weights()
    cfg = CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="xla")
    p1 = Predictor(net, params, state, crf=cfg)
    psp = Predictor(net, params, state, crf=cfg, spatial=True,
                    mesh=get_mesh(jax.devices()[:8], data=4, space=2))
    # B=8 divides the full 4x2 mesh (CRF spreads over BOTH axes);
    # B=4 only divides 'data' (space-replicated CRF fallback)
    for B in (8, 4):
        imgs = np.random.RandomState(5).rand(B, SZ, SZ, 3) * 255
        a, b = p1(imgs), psp(imgs)
        assert (a == b).mean() > 0.999, (B, (a == b).mean())


def test_predictor_ragged_batch_on_mesh():
    """Regression: a batch that doesn't divide the mesh device count used
    to trip a sharding error; the Predictor now pads (repeating the last
    image) and drops the pad rows — results must equal the unsharded
    path."""
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(3).rand(3, SZ, SZ, 3) * 255  # 3 !| 8
    plain = Predictor(net, params, state, crf=None)
    sharded = Predictor(net, params, state, crf=None,
                        mesh=get_mesh(jax.devices()[:8]))
    np.testing.assert_array_equal(sharded(imgs), plain(imgs))
    single = sharded(imgs[:1])              # B=1 serving
    np.testing.assert_array_equal(single, plain(imgs[:1]))


def test_predictor_return_raw_single_forward():
    """return_raw yields the (raw, refined) pair matching the two separate
    predictors, on both the single-device and mesh paths (incl. ragged
    batches), from one compiled pipeline."""
    from deeplab_tpu.crf import CrfConfig
    net, params, state = _net_and_weights()
    cfg = CrfConfig(sxy_bilateral=16.0, n_iters=2, backend="xla")
    plain = Predictor(net, params, state, crf=None)
    refined = Predictor(net, params, state, crf=cfg)
    both = Predictor(net, params, state, crf=cfg, return_raw=True)
    imgs = np.random.RandomState(9).rand(3, SZ, SZ, 3) * 255
    raw, ref = both(imgs)
    np.testing.assert_array_equal(raw, plain(imgs))
    np.testing.assert_array_equal(ref, refined(imgs))
    # mesh path, ragged batch (3 images on 8 devices)
    both_m = Predictor(net, params, state, crf=cfg, return_raw=True,
                       mesh=get_mesh(jax.devices()[:8]))
    raw_m, ref_m = both_m(imgs)
    np.testing.assert_array_equal(raw_m, raw)
    np.testing.assert_array_equal(ref_m, ref)
    # without a CRF, return_raw degrades to the plain single output
    assert Predictor(net, params, state, crf=None,
                     return_raw=True)(imgs).shape == raw.shape
