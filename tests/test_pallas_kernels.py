"""Pallas kernels vs reference formulations (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.kernels.crf_grid import slice_cells, splat_cells
from deeplab_tpu.kernels.fused_dw import fused_dw_bn_relu6


def _factors(c, nc):
    base = np.floor(c)
    frac = c - base
    base = base.astype(int)
    bins = np.arange(nc)
    return ((base[..., None] == bins) * (1 - frac[..., None])
            + ((base + 1)[..., None] == bins) * frac[..., None])


def test_crf_splat_slice_match_dense():
    rng = np.random.RandomState(0)
    Z, P, nc, L = 4, 256, 5, 3
    coords = rng.rand(Z, P, 3) * (nc - 1.5)
    v = rng.rand(Z, P, L).astype(np.float32)
    F = _factors(coords, nc)
    ar, ag, ab = (jnp.asarray(F[:, :, i], jnp.float32) for i in range(3))

    t_rg = np.einsum("zpr,zpg->zprg", F[:, :, 0], F[:, :, 1]) \
        .reshape(Z, P, nc * nc)
    t_lb = np.repeat(v, nc, -1) * np.tile(F[:, :, 2], (1, 1, L))
    G_ref = np.einsum("zpc,zpd->zcd", t_rg, t_lb)

    G = np.asarray(splat_cells(ar, ag, ab, jnp.asarray(v), nc, L,
                               chunk=64, interpret=True))
    np.testing.assert_allclose(G, G_ref, rtol=1e-4, atol=1e-5)

    out_ref = np.einsum("zpc,zcd->zpd", t_rg, G_ref)
    out_ref = (out_ref * np.tile(F[:, :, 2], (1, 1, L))) \
        .reshape(Z, P, L, nc).sum(-1)
    out = np.asarray(slice_cells(ar, ag, ab, jnp.asarray(G_ref, jnp.float32),
                                 nc, L, chunk=64, interpret=True))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("rate", [1, 2, 4])
def test_fused_dw_bn_relu6_matches_xla(rate):
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 16, 16, 256
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, 1) * 0.3, jnp.float32)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    got = fused_dw_bn_relu6(x, k, scale, shift, rate=rate, interpret=True)
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(
        x, jnp.transpose(k, (0, 1, 3, 2)), (1, 1),
        [(rate, rate), (rate, rate)], rhs_dilation=(rate, rate),
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    ref = jnp.clip(ref * scale + shift, 0, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
