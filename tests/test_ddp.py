"""Trainer(ddp=True): per-device shard_map data parallelism.

The ddp step reduces loss/grads/metric sums with exact psums, so with
identical per-shard batches (local BN stats == global BN stats) and
dropout neutralized it must reproduce the XLA-SPMD train step exactly.
It also sets ctx.shard_local, which unlocks the fused Pallas training
kernels per device on multi-chip meshes (interpret mode stands in for
the chips here).
"""

import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu.models.seg_model import SegNet
from deeplab_tpu.parallel.mesh import get_mesh
from deeplab_tpu.train.trainer import Trainer

SZ = 32
NPX = SZ * SZ


def _setup(n_img=8, seed=0):
    model = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = model.init(jax.random.key(0))
    r = np.random.RandomState(seed)
    X = jnp.asarray(r.rand(n_img, SZ, SZ, 3) * 255, jnp.float32)
    Y = jnp.asarray(r.randint(0, 21, (n_img, NPX, 1)), jnp.float32)
    SW = jnp.asarray((r.rand(n_img, NPX) > 0.1), jnp.float32)
    return model, params, state, X, Y, SW


def _run_steps(trainer, params, state, X, Y, SW, n_steps=2):
    tj, _, tx = trainer._build_steps(frozenset())
    p = jax.tree.map(jnp.array, params)
    s = jax.tree.map(jnp.array, state)
    o = tx.init(p)
    metrics = []
    for i in range(n_steps):
        p, s, o, m = tj(p, s, o, jnp.float32(1.0), jax.random.key(7), X, Y,
                        SW)
        metrics.append({k: float(v) for k, v in m.items()})
    return p, s, metrics


def test_ddp_matches_spmd_on_replicated_batch(monkeypatch):
    """One sample repeated over all 8 shards: local BN statistics equal the
    global ones, and with dropout patched out the ddp step's loss, metrics,
    params, and state must match the SPMD step's."""
    from deeplab_tpu.models import deeplabv3p
    monkeypatch.setattr(deeplabv3p, "dropout", lambda ctx, x, rate: x)
    model, params, state, X, Y, SW = _setup(n_img=1)
    X8 = jnp.tile(X, (8, 1, 1, 1))
    Y8 = jnp.tile(Y, (8, 1, 1))
    SW8 = jnp.tile(SW, (8, 1))
    mesh = get_mesh(jax.devices()[:8])
    spmd = Trainer(model, verbose=0, mesh=mesh)
    ddp = Trainer(model, verbose=0, mesh=mesh, ddp=True)
    p_a, s_a, m_a = _run_steps(spmd, params, state, X8, Y8, SW8)
    p_b, s_b, m_b = _run_steps(ddp, params, state, X8, Y8, SW8)
    # Step 1 runs on identical params: loss/metrics must agree to float
    # roundoff (psum partial-sum order vs one global sum).  Step 2 is
    # looser: Adam's first update is ~sign(g)*lr where v is ~0, so grads
    # near zero flip update SIGNS under reduction-order noise; params (and
    # hence step-2 loss/metrics) legitimately differ by O(lr) on dead
    # weights.
    for k in m_a[0]:
        np.testing.assert_allclose(m_a[0][k], m_b[0][k], rtol=1e-5,
                                   err_msg=f"step-1 {k}")
        np.testing.assert_allclose(m_a[1][k], m_b[1][k], rtol=5e-2,
                                   err_msg=f"step-2 {k}")
    lr_cap = 2 * 7e-4 * 2  # 2 steps x 2 opposite-sign first-step updates
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=lr_cap, rtol=1e-3), p_a, p_b)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4), s_a, s_b)


def test_ddp_metric_sums_match_global(monkeypatch):
    """With DISTINCT per-shard batches the psum'd metric sums must equal
    the metric computed over the whole batch on one device (the Jaccard's
    legal-batch semantics are per batch item, so sharding is exact)."""
    from deeplab_tpu.models import deeplabv3p
    monkeypatch.setattr(deeplabv3p, "dropout", lambda ctx, x, rate: x)
    model, params, state, X, Y, SW = _setup(n_img=8, seed=3)
    mesh = get_mesh(jax.devices()[:8])
    ddp = Trainer(model, verbose=0, mesh=mesh, ddp=True)
    _, _, ms = _run_steps(ddp, params, state, X, Y, SW, n_steps=1)
    m_ddp = ms[0]

    # reference: global metrics from a single-device forward (training
    # mode, same global-batch BN? No — ddp normalized with LOCAL stats, so
    # compare only the psum'd METRIC REDUCTION, which takes preds as-is.
    # Reuse the ddp preds by recomputing per-shard forwards serially.
    from deeplab_tpu.metrics import accuracy_from_ids, jaccard_from_ids
    outs = []
    for i in range(8):
        logits, _ = model.apply_logits(params, state, X[i:i + 1],
                                       training=True, rng=jax.random.key(7))
        outs.append(np.asarray(logits, np.float32))
    preds = jnp.argmax(jnp.concatenate(outs), axis=-1).reshape(8, NPX)
    labels = Y[..., 0].astype(jnp.int32)
    jac = float(jaccard_from_ids(labels, preds, 21))
    acc = float(accuracy_from_ids(labels, preds, 21))
    # per-shard rng differs from the serial recompute only through
    # dropout, which is patched out; BN local stats == per-image stats
    np.testing.assert_allclose(m_ddp["Jaccard"], jac, rtol=1e-4)
    np.testing.assert_allclose(m_ddp["sparse_accuracy"], acc, rtol=1e-4)


def test_ddp_eval_matches_spmd_exactly():
    """Eval has no cross-sample coupling (moving-stat BN, no dropout), so
    the ddp eval step must equal the SPMD eval step to float roundoff even
    on DISTINCT per-shard batches."""
    model, params, state, X, Y, SW = _setup(n_img=8, seed=11)
    mesh = get_mesh(jax.devices()[:8])
    _, ev_spmd, _ = Trainer(model, verbose=0,
                            mesh=mesh)._build_steps(frozenset())
    _, ev_ddp, _ = Trainer(model, verbose=0, mesh=mesh,
                           ddp=True)._build_steps(frozenset())
    a = {k: float(v) for k, v in ev_spmd(params, state, X, Y, SW).items()}
    b = {k: float(v) for k, v in ev_ddp(params, state, X, Y, SW).items()}
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=k)


def test_ddp_engages_fused_train_kernels(monkeypatch):
    """bf16 ddp on a multi-device mesh must route the stride-1 expand
    blocks through the fused training kernels (ctx.shard_local lifts the
    single-global-device gate); interpret mode stands in for the chip."""
    from deeplab_tpu.kernels import fused_mbconv_train as FMT
    monkeypatch.setattr(FMT, "pallas_available", lambda: True)
    monkeypatch.setattr(FMT, "INTERPRET", True)
    calls = []
    real = FMT.fused_train_block_apply

    def counting(ctx, x, prefix, rate, skip, interpret=False):
        calls.append(prefix)
        return real(ctx, x, prefix, rate, skip, interpret=interpret)

    monkeypatch.setattr(FMT, "fused_train_block_apply", counting)
    model, params, state, X, Y, SW = _setup(n_img=8, seed=5)
    mesh = get_mesh(jax.devices()[:8])
    ddp = Trainer(model, verbose=0, mesh=mesh, ddp=True,
                  compute_dtype=jnp.bfloat16)
    p, s, ms = _run_steps(ddp, params, state, X, Y, SW, n_steps=1)
    assert calls, "fused train path did not engage under ddp shard_map"
    assert np.isfinite(ms[-1]["loss"])
    # params actually moved
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p,
                     jax.tree.map(jnp.asarray, params)))
    assert max(moved) > 0


def test_ddp_rejects_spatial():
    model = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    try:
        Trainer(model, ddp=True, spatial=True)
    except ValueError as e:
        assert "data-parallel" in str(e)
    else:
        raise AssertionError("ddp+spatial must raise")
