"""Production Pallas kernels vs dense numpy formulations (interpret mode on
CPU).  These are the fused CRF bilateral-grid kernels of
kernels/crf_fused.py — see the module docstring for the measured layout
rules.  (fused_dw is the retained negative-result experiment.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deeplab_tpu.kernels.crf_fused import (_c_pad, _d_pad, mf_step_planes,
                                           slice_planes, splat_planes)
from deeplab_tpu.kernels.fused_dw import fused_dw_bn_relu6

Z, P, nc, L = 3, 256, 5, 4
INV = 1.0 / 64.0   # nc = floor(255*INV) + 2: the production bin-range invariant
C, Cp, D = nc * nc, _c_pad(nc), nc * L
Dp = _d_pad(nc, L)


def _chan_factor(plane):
    """(Z, P) color plane -> (Z, P, nc) 2-tap linear splat weights."""
    coords = plane * INV
    base = np.floor(coords)
    frac = coords - base
    out = np.zeros(plane.shape + (nc,), np.float32)
    for k in range(nc):
        out[..., k] = (np.where(base == k, 1 - frac, 0)
                       + np.where(base + 1 == k, frac, 0))
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    rgb = rng.rand(Z, 3, P).astype(np.float32) * 255
    V = rng.rand(Z, L, P).astype(np.float32)
    ar, ag, ab = (_chan_factor(rgb[:, i]) for i in range(3))
    # joint factors, c = r*nc+g; d = b*L + l (b-MAJOR, the kernel layout)
    t_rg = (ar[:, :, :, None] * ag[:, :, None, :]).reshape(Z, P, C)
    t_lb = (ab[:, :, :, None]
            * V.transpose(0, 2, 1)[:, :, None, :]).reshape(Z, P, D)
    return rgb, V, t_rg, t_lb, ab


def test_splat_matches_dense(data):
    rgb, V, t_rg, t_lb, _ = data
    G = np.asarray(splat_planes(jnp.asarray(rgb), jnp.asarray(V), nc=nc,
                                L=L, inv_step=INV, interpret=True))
    assert G.shape == (Z, Dp, Cp)
    np.testing.assert_array_equal(G[:, D:], 0.0)  # d-pad rows zeroed
    ref = np.einsum("zpd,zpc->zdc", t_lb, t_rg)
    err = np.abs(G[:, :D, :C] - ref).max() / np.abs(ref).max()
    assert err < 5e-3, err              # bf16 contraction tolerance
    np.testing.assert_array_equal(G[:, :, C:], 0.0)  # lane-pad tail zeroed


def test_splat_scale_folds_per_pixel(data):
    rgb, V, t_rg, t_lb, _ = data
    rng = np.random.RandomState(1)
    scale = rng.rand(Z, 1, P).astype(np.float32)
    G = np.asarray(splat_planes(jnp.asarray(rgb), jnp.asarray(V),
                                jnp.asarray(scale), nc=nc, L=L,
                                inv_step=INV, interpret=True))
    ref = np.einsum("zpd,zpc->zdc", t_lb * scale.transpose(0, 2, 1), t_rg)
    err = np.abs(G[:, :D, :C] - ref).max() / np.abs(ref).max()
    assert err < 5e-3, err


def test_slice_matches_dense_with_fused_color_blur(data):
    rgb, V, t_rg, t_lb, ab = data
    rng = np.random.RandomState(2)
    Gt = np.zeros((Z, Dp, Cp), np.float32)
    Gt[:, :D, :C] = rng.rand(Z, D, C)
    brg = np.zeros((Cp, Cp), np.float32)
    brg[:C, :C] = rng.rand(C, C)
    bb_taps = (0.25, 1.0, 0.25)
    out = np.asarray(slice_planes(jnp.asarray(rgb), jnp.asarray(Gt),
                                  jnp.asarray(brg), nc=nc, L=L, inv_step=INV,
                                  bb_taps=bb_taps, interpret=True))
    # reference: rg-blur, then banded b-blur, then slice
    g = np.einsum("zdc,ck->zdk", Gt[:, :D, :C], brg[:C, :C])
    g4 = g.reshape(Z, nc, L, C)
    gb = np.zeros_like(g4)
    for b in range(nc):
        for off, w in zip((-1, 0, 1), bb_taps):
            if 0 <= b + off < nc:
                gb[:, b] += w * g4[:, b + off]
    m = np.einsum("zdc,zpc->zpd", gb.reshape(Z, D, C), t_rg)
    ref = np.einsum("zpbl,zpb->zlp", m.reshape(Z, P, nc, L), ab)
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-2, err


def _attrs_of(rgb, gn, bn, bs, lab=None, bscale=None):
    zeros = np.zeros_like(gn)
    return np.concatenate(
        [rgb, gn, bn, bs,
         zeros if lab is None else lab.astype(np.float32),
         zeros if bscale is None else bscale], axis=1)


def test_mf_step_is_slice_plus_messages_softmax(data):
    rgb, V, _, _, _ = data
    rng = np.random.RandomState(3)
    Gt = np.zeros((Z, Dp, Cp), np.float32)
    Gt[:, :D] = rng.rand(Z, D, Cp)
    brg = np.eye(Cp, dtype=np.float32)
    U = rng.rand(Z, L, P).astype(np.float32)
    fg = rng.rand(Z, L, P).astype(np.float32)
    q = rng.rand(Z, L, P).astype(np.float32)
    gn = rng.rand(Z, 1, P).astype(np.float32)
    bn = rng.rand(Z, 1, P).astype(np.float32)
    bs = rng.rand(Z, 1, P).astype(np.float32)
    cg, cb = 3.0, 10.0
    kw = dict(nc=nc, L=L, inv_step=INV, bb_taps=(1.0,), cg=cg, cb=cb,
              interpret=True)
    attrs = _attrs_of(rgb, gn, bn, bs)
    (qn,) = mf_step_planes(jnp.asarray(attrs), jnp.asarray(Gt),
                           jnp.asarray(brg), jnp.asarray(fg),
                           jnp.asarray(q), jnp.asarray(U), **kw)
    qn = np.asarray(qn, np.float32)
    filt = np.asarray(slice_planes(jnp.asarray(rgb), jnp.asarray(Gt),
                                   jnp.asarray(brg), nc=nc, L=L,
                                   inv_step=INV, bb_taps=(1.0,),
                                   interpret=True))
    msg_g = (fg - q * gn) * gn
    # the kernel clamps the excluded-self bilateral message at 0 (the exact
    # quantity is nonnegative; see _mf_step_kernel)
    msg_b = np.maximum(filt - bs * bn * q, 0.0) * bn
    logits = -U + cg * msg_g + cb * msg_b
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    ref = e / e.sum(axis=1, keepdims=True)
    assert np.abs(qn - ref).max() < 1e-2
    np.testing.assert_allclose(qn.sum(axis=1), 1.0, rtol=1e-2)


def test_mf_step_in_kernel_label_unary_matches_unary_stream(data):
    """Serving path: the unary rebuilt in-kernel from the packed label row
    equals streaming the equivalent two-level unary tensor."""
    import math

    rgb, V, _, _, _ = data
    rng = np.random.RandomState(4)
    Gt = np.zeros((Z, Dp, Cp), np.float32)
    Gt[:, :D] = rng.rand(Z, D, Cp)
    brg = np.eye(Cp, dtype=np.float32)
    fg = rng.rand(Z, L, P).astype(np.float32)
    q = rng.rand(Z, L, P).astype(np.float32)
    gn = rng.rand(Z, 1, P).astype(np.float32)
    bn = rng.rand(Z, 1, P).astype(np.float32)
    bs = rng.rand(Z, 1, P).astype(np.float32)
    lab = rng.randint(0, L, (Z, 1, P))
    gt_prob = 0.7
    n_e = -math.log((1.0 - gt_prob) / (L - 1))
    p_e = -math.log(gt_prob)
    U = np.where(lab == np.arange(L, dtype=lab.dtype).reshape(1, L, 1),
                 p_e, n_e).astype(np.float32)
    kw = dict(nc=nc, L=L, inv_step=INV, bb_taps=(1.0,), cg=3.0, cb=10.0,
              interpret=True)
    attrs = _attrs_of(rgb, gn, bn, bs, lab=lab)
    got = mf_step_planes(jnp.asarray(attrs), jnp.asarray(Gt),
                         jnp.asarray(brg), jnp.asarray(fg), jnp.asarray(q),
                         n_energy=n_e, p_energy=p_e, **kw)
    want = mf_step_planes(jnp.asarray(attrs), jnp.asarray(Gt),
                          jnp.asarray(brg), jnp.asarray(fg), jnp.asarray(q),
                          jnp.asarray(U), **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_splat_packed_attrs_scale_matches_explicit(data):
    """Packed-attrs splat (scale in the ATTR_BSCALE row) == explicit-scale
    splat."""
    rgb, V, _, _, _ = data
    rng = np.random.RandomState(5)
    scale = rng.rand(Z, 1, P).astype(np.float32)
    want = np.asarray(splat_planes(jnp.asarray(rgb), jnp.asarray(V),
                                   jnp.asarray(scale), nc=nc, L=L,
                                   inv_step=INV, interpret=True))
    gn = np.zeros((Z, 1, P), np.float32)
    attrs = _attrs_of(rgb, gn, gn, gn, bscale=scale)
    got = np.asarray(splat_planes(jnp.asarray(attrs), jnp.asarray(V),
                                  nc=nc, L=L, inv_step=INV, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_dw_matches_reference():
    """Retained negative-result experiment: correct, just not faster."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 1) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    offset = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
    got = np.asarray(fused_dw_bn_relu6(x, w, scale, offset, interpret=True))
    ref = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (0, 1, 3, 2)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=8)
    ref = np.asarray(jnp.clip(ref * scale + offset, 0.0, 6.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_blur_gn_multiply_in_kernel_matches_premultiplied():
    """gaussian_blur_planes(a, gn) == gaussian_blur_planes(a * gn): the
    in-kernel g_norm multiply (which saves the step kernel an output
    stream) must not change the filter result."""
    from deeplab_tpu.kernels.crf_fused import gaussian_blur_planes

    B, ny, nx, cs_y, cs_x, Lb = 2, 3, 2, 8, 128, 4
    P2 = cs_y * cs_x
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.rand(B * ny * nx, Lb, P2), jnp.bfloat16)
    gn = jnp.asarray(rng.rand(B * ny * nx, 1, P2), jnp.float32)
    taps = (0.25, 0.5, 1.0, 0.5, 0.25)
    kw = dict(taps=taps, B=B, ny=ny, nx=nx, cs_y=cs_y, cs_x=cs_x,
              interpret=True)
    want = gaussian_blur_planes(
        (a.astype(jnp.float32) * gn).astype(jnp.bfloat16), **kw)
    got = gaussian_blur_planes(a, gn, **kw)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
