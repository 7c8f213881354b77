"""Fully-connected CRF mean-field inference on TPU (SURVEY.md N2).

Replaces pydensecrf's C++ permutohedral filtering (reference utils.py:74-91)
with an on-device pipeline so image -> logits -> CRF -> mask never leaves HBM:

- unary from a hard label map (``unary_from_labels``, gt_prob 0.7)
- spatial Gaussian kernel (sxy=3, compat 3): truncated separable conv — the
  H/W contractions run as matmuls on the MXU
- bilateral kernel (sxy=80, srgb=13, compat 10): bilateral-grid
  splat -> separable 5-D Gaussian blur -> slice (multilinear, 32 corners),
  the TPU-friendly stand-in for the permutohedral lattice
- symmetric kernel normalization, self-interaction excluded (computed in
  closed form per pixel for the grid kernel), 5 iterations

Semantics follow Krähenbühl & Koltun Algorithm 1 / the densecrf defaults the
reference relies on; ``deeplab_tpu.crf.brute`` is the exact O(N^2) oracle the
approximation is tested against.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CrfConfig:
    sxy_gaussian: float = 3.0
    compat_gaussian: float = 3.0
    sxy_bilateral: float = 80.0
    srgb: float = 13.0
    compat_bilateral: float = 10.0
    n_iters: int = 5
    gt_prob: float = 0.7
    # Bilateral-grid color sampling in units of srgb: 1.0 = sample at sigma
    # (accurate), 2.0 = half the bins per channel (~7x fewer grid FLOPs,
    # slightly coarser kernel quadrature).
    color_step: float = 1.0
    # Splat from every s-th pixel per axis (x s^2 weight): the grid is a
    # kernel-density estimate, so subsampling the splat side barely moves a
    # sxy=80/srgb=13 kernel while cutting the worst-shaped matmul s^2-fold.
    splat_stride: int = 1
    # Opt-in serving knob: run mean field at 1/s resolution (kernel widths
    # rescaled to keep physical extents) and upsample the refined mask.
    # s=1 is the reference-faithful default.
    resolution_scale: int = 1
    # Color-blur quadrature: "gaussian" samples the Gaussian at the grid
    # offsets (the classic bilateral grid); "lsq" solves for the
    # least-squares-optimal symmetric band taps of the effective kernel
    # hat(x)^T B hat(y) ~ exp(-(x-y)^2 / 2 srgb^2) over [0, 255]^2 — a
    # strictly better quadrature of the SAME reference kernel
    # (utils.py:85's srgb) at the same cost, which lets a coarser grid
    # (fewer bins -> smaller splat/slice matmuls) match or beat the
    # step-1 gaussian grid's oracle agreement.  Measured on the committed
    # exact-oracle goldens (tests/test_crf_goldens.py).
    color_taps: str = "gaussian"
    color_taps_radius: int = 2
    # Bilateral filter backend: "auto" picks the fused Pallas kernels on TPU
    # (kernels/crf_fused.py) and the XLA formulation elsewhere; "xla" /
    # "pallas" force one (pallas off-TPU runs in interpret mode — tests only).
    backend: str = "auto"

    def __post_init__(self):
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"backend must be 'auto', 'xla' or 'pallas', "
                f"got {self.backend!r}")
        if self.color_taps not in ("gaussian", "lsq", "nnls"):
            raise ValueError(f"color_taps must be 'gaussian', 'lsq' or "
                             f"'nnls', got {self.color_taps!r}")


def unary_from_labels(labels: jnp.ndarray, n_labels: int, gt_prob: float,
                      zero_unsure: bool = True) -> jnp.ndarray:
    """(N,) int labels -> (N, L) unary energies (pydensecrf semantics)."""
    labels = labels.reshape(-1)
    n_energy = -math.log((1.0 - gt_prob) / (n_labels - 1))
    p_energy = -math.log(gt_prob)
    idx = labels - 1 if zero_unsure else labels
    one_hot = jax.nn.one_hot(idx, n_labels, dtype=jnp.float32)
    U = n_energy + (p_energy - n_energy) * one_hot
    if zero_unsure:
        U = jnp.where((labels == 0)[:, None],
                      -math.log(1.0 / n_labels), U)
    return U


# ------------------------------------------------------ spatial Gaussian ----

def _gauss_taps(sigma: float):
    radius = int(math.ceil(2.5 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    return np.exp(-0.5 * (x / sigma) ** 2).astype(np.float32)


def _sep_conv_hw(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable spatial filter over (H, W, L) via two MXU matmuls with
    banded (out=in) Toeplitz matrices built at trace time.

    Note: a 17-tap depthwise conv is ~30x fewer FLOPs on paper, but with
    only L=21 channels it badly underfills the 128-lane VPU/MXU and measures
    ~7 ms/image slower end-to-end than these dense 512x512 matmuls.
    """
    h, w, _ = x.shape
    # f32 inputs keep exact 6-pass precision; bf16 inputs take the fast
    # single-pass MXU path (used for the per-iteration message only — the
    # normalization is always computed in f32).
    if x.dtype == jnp.float32:
        prec = jax.lax.Precision.HIGHEST
        th = _band_matrix(h, taps)
        tw = _band_matrix(w, taps)
    else:
        prec = jax.lax.Precision.DEFAULT
        th = _band_matrix(h, taps).astype(x.dtype)
        tw = _band_matrix(w, taps).astype(x.dtype)
    y = jnp.einsum("ih,hwl->iwl", th, x, precision=prec)
    y = jnp.einsum("jw,hwl->hjl", tw, y, precision=prec)
    return y


_BAND_CACHE = {}


def _band_matrix(n: int, taps: np.ndarray) -> jnp.ndarray:
    key = (n, taps.tobytes())
    if key not in _BAND_CACHE:
        radius = len(taps) // 2
        m = np.zeros((n, n), np.float32)
        for offset, wgt in zip(range(-radius, radius + 1), taps):
            diag = np.arange(max(0, -offset), min(n, n - offset))
            m[diag, diag + offset] = wgt
        _BAND_CACHE[key] = m
    return jnp.asarray(_BAND_CACHE[key])


def gaussian_norm(hw, sigma: float) -> jnp.ndarray:
    taps = _gauss_taps(sigma)
    ones = jnp.ones(tuple(hw) + (1,), jnp.float32)
    ksum = _sep_conv_hw(ones, taps) - 1.0        # exclude self (center tap 1)
    return jax.lax.rsqrt(jnp.maximum(ksum, 1e-20))


def gaussian_message(Q_img: jnp.ndarray, sigma: float, norm=None
                     ) -> jnp.ndarray:
    """Normalized spatial-Gaussian message with self excluded.
    Q_img: (H, W, L) -> (H, W, L)."""
    taps = _gauss_taps(sigma)
    if norm is None:
        norm = gaussian_norm(Q_img.shape[:2], sigma)
    nq = Q_img * norm
    filt = _sep_conv_hw(nq, taps) - nq           # exclude self
    return filt * norm


# ------------------------------------------------------- bilateral grid ----

def _blur_taps(step: float = 1.0) -> np.ndarray:
    """Gaussian taps at integer grid offsets; grid step is ``step`` feature
    sigmas (features pre-scaled by sigma)."""
    radius = max(1, int(math.ceil(2.2 / step)))
    d = np.arange(-radius, radius + 1, dtype=np.float64)
    return np.exp(-0.5 * (d * step) ** 2).astype(np.float32)


_LSQ_TAPS_CACHE = {}


def color_band_taps(step: float, mode: str = "gaussian", radius: int = 2,
                    range_sigmas: float = 255.0 / 13.0) -> np.ndarray:
    """Symmetric band taps of the color blur matrix B (grid step ``step``
    kernel sigmas, value range ``range_sigmas`` sigmas).

    ``gaussian``: B samples exp(-0.5 (k step)^2) at integer bin offsets —
    the classic bilateral grid (Paris & Durand).  ``lsq``: the
    least-squares-optimal Toeplitz band minimizing
    || exp(-(x-y)^2/2) - hat(x)^T B hat(y) ||_F over the value range —
    the same 2-tap hat basis and kernel shapes, strictly better kernel
    quadrature per bin.  Measured on [0,255]/srgb=13: relF error 0.127
    (gaussian, step 1, nc=21) vs 0.115 (lsq, step 1.346, nc=16) — i.e. a
    24% smaller grid axis with BETTER kernel fidelity, which cuts the
    splat/slice matmul cost (D x C ~ nc^3) ~2.7x.  Oracle MAP agreement
    is pinned by tests/test_crf_goldens.py."""
    if mode == "gaussian":
        return _blur_taps(step)
    key = (mode, round(float(step), 6), int(radius),
           round(float(range_sigmas), 4))
    if key not in _LSQ_TAPS_CACHE:
        R, h = float(range_sigmas), float(step)
        nc = int(math.floor(R / h)) + 2
        xs = np.linspace(0.0, R, 768)
        c = xs[:, None] / h - np.arange(nc)[None, :]
        P = np.maximum(0.0, 1.0 - np.abs(c))               # hat factors
        K = np.exp(-0.5 * (xs[:, None] - xs[None, :]) ** 2)
        feats = []
        for k in range(radius + 1):
            Bk = np.zeros((nc, nc))
            idx = np.arange(0, nc - k)
            Bk[idx, idx + k] = 1.0
            if k:
                Bk[idx + k, idx] = 1.0
            feats.append(P @ Bk @ P.T)
        A = np.stack([f.ravel() for f in feats], axis=1)
        if mode == "nnls":
            # nonnegativity keeps the effective kernel >= 0 everywhere
            # (qualitatively Gaussian — no repulsive side lobes that could
            # flip bistable mean-field regions); costs ~3% fit error vs
            # unconstrained lsq, still far below the gaussian sampling
            from scipy.optimize import nnls as _nnls
            t, _ = _nnls(A, K.ravel())
        else:
            t, *_ = np.linalg.lstsq(A, K.ravel(), rcond=None)
        taps = np.zeros(2 * radius + 1, np.float32)
        taps[radius] = t[0]
        for k in range(1, radius + 1):
            taps[radius - k] = taps[radius + k] = t[k]
        _LSQ_TAPS_CACHE[key] = taps
    return _LSQ_TAPS_CACHE[key]


def _cfg_color_taps(cfg: "CrfConfig") -> np.ndarray:
    return color_band_taps(cfg.color_step, cfg.color_taps,
                           cfg.color_taps_radius, 255.0 / cfg.srgb)


def _pad_to_cells(x: jnp.ndarray, cs: int):
    h, w = x.shape[:2]
    ph, pw = (-h) % cs, (-w) % cs
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, pad)
    return x, (h + ph) // cs, (w + pw) // cs


class _BilateralPlan:
    """V-independent precomputation for one image: cell geometry, the joint
    (r,g) factor, the b factor, blur matrices.  Built once per image and
    reused by all 6 filter applications of a mean-field run (the factors are
    the expensive pixel-space tensors)."""

    def __init__(self, im, sxy: float, srgb: float, color_step: float,
                 splat_stride: int = 1, ctaps=None):
        self.ctaps = ctaps if ctaps is not None else _blur_taps(color_step)
        h, w, _ = im.shape
        self.h, self.w = h, w
        self.cs = cs = max(int(round(sxy)), 1)
        # same guard as _PallasPlan: a stride that doesn't divide the cell
        # size falls back to 1 (the subsample reshape requires it)
        self.stride = (splat_stride
                       if splat_stride > 1 and cs % splat_stride == 0
                       else 1)
        srgb_grid = srgb * color_step
        self.nc = nc = int(math.floor(255.0 / srgb_grid)) + 2
        self.color_step = color_step
        im_pad, self.ny, self.nx = _pad_to_cells(im, cs)
        self.P = P = cs * cs
        self.Z = self.ny * self.nx

        im_cells = self.cells_of(im_pad.astype(jnp.float32), 3)  # (Z, P, 3)
        coords = im_cells / srgb_grid
        base = jnp.floor(coords)
        frac = coords - base
        base = base.astype(jnp.int32)
        bins = jnp.arange(nc, dtype=jnp.int32)
        fac = (base[..., None] == bins) * (1.0 - frac[..., None]) \
            + ((base + 1)[..., None] == bins) * frac[..., None]  # (Z,P,3,nc)
        ar, ag, ab = fac[:, :, 0], fac[:, :, 1], fac[:, :, 2]

        # All big tensors live in FLAT (Z, P, nc*nc) layouts — nc-sized minor
        # dims would be tile-padded ~6x on TPU and force relayouts.
        bf = jnp.bfloat16
        self.t_rg = (jnp.repeat(ar, nc, axis=-1)
                     * jnp.tile(ag, (1, 1, nc))).astype(bf)   # c = r*nc+g
        self.ab = ab                                          # (Z, P, nc)
        s = self.stride
        if s > 1:
            self.t_rg_sub = self.subsample(self.t_rg, nc * nc)
            self.ab_sub = self.subsample(ab, nc)
        else:
            self.t_rg_sub, self.ab_sub = self.t_rg, ab
        self._ab_tile_cache = {}
        self.S = _kron_band(self.ny, self.nx, 1.0)            # (Z, Z)
        self.Brg = _kron_band(nc, nc, color_step, self.ctaps)  # (c, c)

    def ab_tile(self, L: int):
        if L not in self._ab_tile_cache:
            self._ab_tile_cache[L] = jnp.tile(self.ab, (1, 1, L)).astype(
                jnp.bfloat16)
        return self._ab_tile_cache[L]

    def subsample(self, x, ch):
        """(Z, P, ch) -> (Z, P/stride^2, ch): every stride-th pixel per axis
        within each cell."""
        s, cs, Z = self.stride, self.cs, self.Z
        x = x.reshape(Z, cs, cs, ch)[:, ::s, ::s]
        return x.reshape(Z, (cs // s) ** 2, ch)

    def cells_of(self, x, ch):
        return (x.reshape(self.ny, self.cs, self.nx, self.cs, ch)
                .transpose(0, 2, 1, 3, 4).reshape(self.ny * self.nx,
                                                  self.cs * self.cs, ch))

    def uncells(self, x, ch):
        ny, nx, cs = self.ny, self.nx, self.cs
        return (x.reshape(ny, nx, cs, cs, ch).transpose(0, 2, 1, 3, 4)
                .reshape(ny * cs, nx * cs, ch))[:self.h, :self.w]

    def apply(self, values: jnp.ndarray) -> jnp.ndarray:
        """values: (N, L) -> filtered (N, L).  Self-contribution INCLUDED."""
        L = values.shape[1]
        nc, Z, P = self.nc, self.Z, self.P
        bf = jnp.bfloat16
        v_img, _, _ = _pad_to_cells(values.reshape(self.h, self.w, L), self.cs)
        V = self.cells_of(v_img, L)                          # (Z, P, L)
        ab_tile = self.ab_tile(L)
        if self.stride > 1:
            V_sub = self.subsample(V, L)
            t_lb_sub = (jnp.repeat(V_sub, nc, axis=-1)
                        * jnp.tile(self.ab_sub, (1, 1, L))).astype(bf)
        else:
            t_lb_sub = jnp.repeat(V, nc, axis=-1).astype(bf) * ab_tile

        # splat: one batched MXU matmul (c x P) @ (P x d) per cell
        G = jnp.einsum("zpc,zpd->zcd", self.t_rg_sub, t_lb_sub,
                       preferred_element_type=jnp.float32)   # (Z, c, d)
        if self.stride > 1:
            G = G * float(self.stride ** 2)

        # separable Gaussian blur as three flat matmuls (Kronecker bands)
        BLb = jnp.asarray(np.kron(np.eye(L, dtype=np.float32),
                                  _band_matrix_np(nc, self.color_step,
                                                  self.ctaps)))
        G = jnp.einsum("zcd,zZ->Zcd", G, self.S)
        G = jnp.einsum("zcd,cC->zCd", G, self.Brg)
        G = jnp.einsum("zcd,dD->zcD", G, BLb).astype(bf)

        # slice: transpose contraction (bf16), then fold in the b factor
        t1 = jnp.einsum("zpc,zcd->zpd", self.t_rg, G,
                        preferred_element_type=jnp.bfloat16)  # (Z, P, L*nc)
        t1 = t1 * ab_tile
        out = t1.reshape(Z, P, L, nc).sum(axis=-1,
                                          dtype=jnp.float32)  # (Z, P, L)
        return self.uncells(out, L).reshape(self.h * self.w, L)


def _use_pallas(cfg: "CrfConfig") -> bool:
    from deeplab_tpu.kernels.crf_fused import pallas_available
    return (cfg.backend == "pallas"
            or (cfg.backend == "auto" and pallas_available()))


class _PallasPlan:
    """Batched fused-kernel bilateral plan (kernels/crf_fused.py).

    Everything lives in pixel-major *cell planes* ``(B*Z, ch, P)`` — the
    pixel axis minor keeps every HBM tile 128-lane dense, where the
    image-layout ``(..., L=21)`` tensors of the XLA path are lane-padded
    ~6x (measured: the pad alone cost more than the filter kernels).
    The grid is stored transposed ``(B*Z, D, C)`` with d = b*L + l b-major;
    the (r, g) and b color blurs are fused into the slice kernel, so the
    only XLA work per apply is the cross-cell blur einsum (~0.1 GFLOP).
    """

    def __init__(self, imgs, sxy: float, srgb: float, color_step: float,
                 splat_stride: int = 1, ctaps=None):
        from deeplab_tpu.kernels.crf_fused import pallas_available
        ctaps = ctaps if ctaps is not None else _blur_taps(color_step)
        B, h, w, _ = imgs.shape
        self.B, self.h, self.w = B, h, w
        cs = max(int(round(sxy)), 1)
        # Anisotropic cells: when sigma is large, snap the x cell width to
        # the 128-lane tile.  Square 80px cells force every cells_v /
        # uncells_v reshape through 80-lane (1.6x padded) tiles — measured
        # costlier per iteration than the filter kernels themselves.  The
        # coarser x quantization (<= 1.6 sigma grid step, Gaussian-blurred)
        # is the same approximation class as color_step=2.  The y cell
        # height prefers a divisor of H within [sxy/2, sxy]: no pad rows to
        # copy each iteration and a FINER (<= 1 sigma) y quantization.
        self.cs_y = cs
        for d in range(cs, max(cs // 2, 1) - 1, -1):
            if h % d == 0:
                self.cs_y = d
                break
        self.cs_x = 128 if cs >= 80 else cs
        srgb_grid = srgb * color_step
        self.nc = nc = int(math.floor(255.0 / srgb_grid)) + 2
        self.inv_step = 1.0 / srgb_grid
        self.ny, self.nx = -(-h // self.cs_y), -(-w // self.cs_x)
        self.Z = self.ny * self.nx
        self.P = self.cs_y * self.cs_x
        self.rgb = self.cells_v(
            jnp.moveaxis(imgs.astype(jnp.float32), -1, 1))  # (B*Z, 3, P)
        self.stride = (splat_stride
                       if splat_stride > 1 and self.cs_y % splat_stride == 0
                       and self.cs_x % splat_stride == 0 else 1)
        if self.stride > 1:
            self.rgb_sub = self.subsample(self.rgb, 3)
        self.S = jnp.asarray(np.kron(
            _band_matrix_np(self.ny, self.cs_y / sxy),
            _band_matrix_np(self.nx, self.cs_x / sxy)))          # (Z, Z)
        from deeplab_tpu.kernels.crf_fused import _c_pad
        C, Cp = nc * nc, _c_pad(nc)
        brg = np.zeros((Cp, Cp), np.float32)
        brg[:C, :C] = np.kron(_band_matrix_np(nc, color_step, ctaps),
                              _band_matrix_np(nc, color_step, ctaps))
        self.Brg = jnp.asarray(brg)                 # (C_pad, C_pad), 0-tail
        self.bb_taps = tuple(float(t) for t in ctaps)
        self.interpret = not pallas_available()

    # ---- layout transforms: (B, ch, H, W) <-> (B*Z, ch, P) ----

    def cells_v(self, x):
        """(B, ch, H, W) -> (B*Z, ch, P), zero-padding H/W up to cells."""
        B, ch = x.shape[:2]
        ph, pw = self.ny * self.cs_y - self.h, self.nx * self.cs_x - self.w
        if ph or pw:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, ph), (0, pw)])
        return (x.reshape(B, ch, self.ny, self.cs_y, self.nx, self.cs_x)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(B * self.Z, ch, self.P))

    def uncells_v(self, y, ch):
        """(B*Z, ch, P) -> (B, ch, H, W)."""
        B, ny, nx = self.B, self.ny, self.nx
        return (y.reshape(B, ny, nx, ch, self.cs_y, self.cs_x)
                .transpose(0, 3, 1, 4, 2, 5)
                .reshape(B, ch, ny * self.cs_y,
                         nx * self.cs_x))[:, :, :self.h, :self.w]

    def uncells_v_wh(self, y, ch):
        """(B*Z, ch, P) -> (B, ch, W, H) — the W-major orientation the
        spatial filter wants first (see ``_sep_conv_bwh_to_bhw``); same
        single 6D relayout as ``uncells_v``, different permutation."""
        B, ny, nx = self.B, self.ny, self.nx
        return (y.reshape(B, ny, nx, ch, self.cs_y, self.cs_x)
                .transpose(0, 3, 2, 5, 1, 4)
                .reshape(B, ch, nx * self.cs_x,
                         ny * self.cs_y))[:, :, :self.w, :self.h]

    def subsample(self, x, ch):
        s = self.stride
        sub = x.reshape(-1, ch, self.cs_y, self.cs_x)[:, :, ::s, ::s]
        return sub.reshape(-1, ch, self.P // (s * s))

    def z_blur(self, G):
        """Cross-cell spatial blur of the grid: (B*Z, D, C).  Flattened to
        3D and fed as an explicitly-batched matmul (S broadcast over B) so
        XLA emits (B, Y, K) directly instead of a transposing dot."""
        BZ, D, C = G.shape
        S_b = jnp.broadcast_to(self.S.astype(G.dtype),
                               (self.B, self.Z, self.Z))
        G = jnp.einsum("bzy,bzk->byk", S_b,
                       G.reshape(self.B, self.Z, D * C))
        return G.reshape(BZ, D, C)

    # (the norm pass and per-pixel self weight that used to live here as
    # apply()/self_weight() moved INTO kernels/crf_fused._slice_attrs_kernel
    # — the fused norm tail computes them in closed form per pixel)


def _sep_conv_bwh_to_bhw(x, taps):
    """Separable spatial filter: (B, L, W, H) bf16 in -> (B, L, H, W) out.

    Both passes are merged right-multiplies ((B*L*W, H) @ (H, H) etc.) —
    a transposing form like einsum('ih,blhw->bliw') makes XLA relayout the
    whole tensor per pass (measured ~10x slower).  The one axis swap in
    the middle is the only relayout; the band matrices are symmetric so
    right-multiplication applies the same filter."""
    b, l, w, h = x.shape
    th = _band_matrix(h, taps).astype(jnp.bfloat16)
    tw = _band_matrix(w, taps).astype(jnp.bfloat16)
    y = (x.astype(jnp.bfloat16).reshape(-1, h) @ th).reshape(b, l, w, h)
    y = jnp.swapaxes(y, 2, 3)                        # (B, L, H, W)
    return (y.reshape(-1, w) @ tw).reshape(b, l, h, w)


def _mean_field_planes(plan: _PallasPlan, cfg: "CrfConfig", n_labels: int,
                       labels_c: jnp.ndarray = None,
                       unary_c: jnp.ndarray = None) -> jnp.ndarray:
    """Mean-field inference in cell-plane layout.  Give EITHER ``labels_c``
    (B*Z, 1, P) hard labels — the serving path: the two-level unary is
    rebuilt inside the step kernel from the packed label plane, no (L, P)
    unary tensor is ever materialized — or ``unary_c`` (B*Z, L, P) caller
    energies (streamed to the kernel).  Returns Q: (B*Z, L, P).  Same math
    as ``mean_field`` — Krähenbühl & Koltun Algorithm 1 with symmetric
    normalization and self-interaction excluded — laid out for the TPU
    memory system."""
    L = n_labels
    if unary_c is None:
        n_energy = -math.log((1.0 - cfg.gt_prob) / (n_labels - 1))
        p_energy = -math.log(cfg.gt_prob)
    else:
        n_energy = p_energy = 0.0
    taps = _gauss_taps(cfg.sxy_gaussian)
    # spatial normalization (f32-exact, hoisted) per IMAGE POSITION — it is
    # identical across the batch, so only the (Z, 1, P) single-image planes
    # are built; the attrs kernel index-maps them over B
    gn_img = gaussian_norm((plan.h, plan.w), cfg.sxy_gaussian)   # (H, W, 1)
    gn_small = plan.cells_v(jnp.moveaxis(gn_img, -1, 0)[None])   # (Z, 1, P)
    # bilateral normalization: norm pass over ones.  ``valid`` masks the
    # cell-padding pixels out of every splat (they don't exist in the XLA
    # path, whose value tensors are zero-padded per apply).
    valid = plan.cells_v(jnp.ones((plan.B, 1, plan.h, plan.w), jnp.float32))

    from deeplab_tpu.kernels.crf_fused import (gaussian_blur_planes,
                                               mf_step_planes,
                                               slice_attrs_planes,
                                               splat_planes)

    # spatial message: blur directly on the cell planes when the truncated
    # radius fits inside a cell AND the cell width is 128-lane aligned (the
    # kernels' free in-block P-splits are Mosaic shape-casts) — this
    # removes two full image<->cell relayouts per iteration, measured ~46%
    # of CRF time; small-sigma cells (e.g. the resolution_scale knob) fall
    # back to the image-layout band matmuls
    taps_t = tuple(float(t) for t in taps)
    fuse_spatial = (len(taps) // 2 <= min(plan.cs_y, plan.cs_x)
                    and plan.cs_x % 128 == 0)

    def spatial(Q, gn):
        """blur(Q * g_norm) — the multiply happens inside the blur kernel
        (one fewer padded (L, P) stream out of the step kernel)."""
        if fuse_spatial:
            return gaussian_blur_planes(
                Q, gn, taps=taps_t, B=plan.B, ny=plan.ny, nx=plan.nx,
                cs_y=plan.cs_y, cs_x=plan.cs_x, interpret=plan.interpret)
        A = Q * jnp.tile(gn, (plan.B, 1, 1)).astype(Q.dtype)
        return plan.cells_v(_sep_conv_bwh_to_bhw(plan.uncells_v_wh(A, L),
                                                 taps))

    # the Q state and per-iteration message tensors are bf16 (halves the
    # HBM traffic of every transform/elementwise pass); all kernel-internal
    # arithmetic and the normalization terms stay f32
    bf = jnp.bfloat16
    # Keep the splat kernel's factor tensors ((D + 2C) x chunk bf16) inside
    # VMEM: a single-chunk nc>=13 splat spills and measured 3.3x slower
    # (97 -> 30 TF/s on v5e).  Chunked grids accumulate across chunks in an
    # f32 kernel scratch and still emit bf16 directly (crf_fused.
    # _splat_kernel), so every config gets the half-width grid through the
    # z-blur + slice.  chunk must divide P exactly; odd P (small odd cells
    # from a small sigma) can't halve — those planes are tiny and fit.
    from deeplab_tpu.kernels.crf_fused import _c_pad, _d_pad

    def _splat_chunk(P_v, Lv):
        budget = 12 << 20
        chunk = P_v
        while ((_d_pad(plan.nc, Lv) + 2 * _c_pad(plan.nc)) * chunk * 2
               > budget) and chunk % 2 == 0:
            chunk //= 2
        return chunk

    def _splat_q(a, v):
        return splat_planes(a, v, nc=plan.nc, L=L, inv_step=plan.inv_step,
                            chunk=_splat_chunk(v.shape[-1], L),
                            out_dtype=bf, interpret=plan.interpret)

    # Norm pass: splat the valid mask, cross-cell-blur it, then ONE fused
    # kernel slices it and emits the packed attrs planes (b_self, b_norm,
    # b_scale, unary softmax all in closed form per pixel) + the initial Q
    # + the stride-subsampled copies.  Nothing between the norm grid and
    # the first iteration is materialized by XLA (the 6-tensor concat and
    # its five (B*Z, 1, P) 8x-sublane-padded inputs profiled ~0.15 ms/img).
    if plan.stride > 1:
        v_sub = plan.subsample(valid, 1)
        Gn = splat_planes(plan.rgb_sub, v_sub, None,
                          nc=plan.nc, L=1, inv_step=plan.inv_step,
                          chunk=_splat_chunk(v_sub.shape[-1], 1),
                          interpret=plan.interpret) * float(plan.stride ** 2)
    else:
        Gn = splat_planes(plan.rgb, valid, None, nc=plan.nc, L=1,
                          inv_step=plan.inv_step,
                          chunk=_splat_chunk(plan.P, 1),
                          interpret=plan.interpret)
    # (norm splat stays f32-out — the rsqrt(ksum - b_self) cancellation
    # needs exact accumulation; chunked f32 accumulates in-out)
    Gn = plan.z_blur(Gn)  # f32: bf16 cancellation in (ksum - b_self)
    # would explode the rsqrt for pixels with no similar neighbors
    lab_i = (labels_c if labels_c is not None
             else jnp.zeros((plan.rgb.shape[0], 1, plan.P), jnp.int32))
    outs = slice_attrs_planes(
        plan.rgb, Gn, plan.Brg, gn_small, lab_i, nc=plan.nc, L=L,
        inv_step=plan.inv_step, bb_taps=plan.bb_taps, stride=plan.stride,
        cs_y=plan.cs_y, cs_x=plan.cs_x, h=plan.h, w=plan.w, nx=plan.nx,
        Z=plan.Z, gt_prob=float(cfg.gt_prob), interpret=plan.interpret)
    attrs, Q0 = outs[0], outs[1]
    if len(outs) > 2:
        attrs_sub, Q0_sub = outs[2], outs[3]
    elif plan.stride > 1:
        # kernel couldn't emit the subsampled copies (non-128-aligned
        # cs_x, e.g. small-sigma / resolution_scale cells): XLA fallback
        from deeplab_tpu.kernels.crf_fused import ATTR_ROWS
        attrs_sub = plan.subsample(attrs, ATTR_ROWS)
        Q0_sub = plan.subsample(Q0, L)
    else:
        attrs_sub, Q0_sub = attrs, None
    unary_b = None if unary_c is None else unary_c.astype(bf)

    def body(Q, Q_sub, last=False):
        # spatial message: blur(Q * g_norm), multiply in the blur kernel;
        # self-exclusion + normalization happen inside the fused step kernel
        f_gauss = spatial(Q, gn_small)
        # bilateral splat: Q*b_norm (and the pad mask) folded into the
        # kernel; the grid comes out bf16 directly (half-width through the
        # z-blur + slice — the separate astype profiled 0.7 ms/call)
        if plan.stride > 1:
            G = _splat_q(attrs_sub, Q_sub)
        else:
            G = _splat_q(attrs, Q)
        G = plan.z_blur(G)
        # fused: color blurs + slice + messages + compatibilities + softmax
        # (+ the next iteration's subsampled splat input — an XLA strided
        # slice of Q would relayout-copy the whole state per iteration;
        # the last iteration has no next splat, so skip the sub output)
        out = mf_step_planes(
            attrs, G, plan.Brg, f_gauss, Q, unary_b, nc=plan.nc, L=L,
            inv_step=plan.inv_step, bb_taps=plan.bb_taps,
            cg=float(cfg.compat_gaussian), cb=float(cfg.compat_bilateral),
            n_energy=n_energy, p_energy=p_energy,
            sub_stride=1 if last else plan.stride,
            cs_y=plan.cs_y, cs_x=plan.cs_x, interpret=plan.interpret)
        if last or plan.stride == 1:
            return out[0], None
        if len(out) == 2:
            return out
        return out[0], plan.subsample(out[0], L)

    # static unroll: a lax.scan carry of the (B*Z, L, P) state inserts
    # whole-state copies at every iteration boundary (profiled as ~15% of
    # device time); n_iters is small and static
    if unary_c is None:
        # serving path: Q0 (softmax of the two-level unary) came out of the
        # attrs kernel in closed form
        Q, Q_sub = Q0, Q0_sub
    else:
        Q = jax.nn.softmax(-unary_c.astype(jnp.float32), axis=1).astype(bf)
        Q_sub = plan.subsample(Q, L) if plan.stride > 1 else None
    for i in range(cfg.n_iters):
        Q, Q_sub = body(Q, Q_sub, last=(i == cfg.n_iters - 1))
    return Q.astype(jnp.float32)


def bilateral_filter(im: jnp.ndarray, values: jnp.ndarray, sxy: float,
                     srgb: float, color_step: float = 1.0) -> jnp.ndarray:
    """Approximate K @ values for the bilateral kernel.

    TPU-native formulation with zero scatters/gathers:
    - spatial: box cells of ``round(sxy)`` px — pixel->cell assignment is a
      pure reshape; cell-to-cell Gaussian blur finishes the spatial kernel
    - color: per-channel multilinear factors contracted on the MXU
      (splat: (rg x P)@(P x lb) per cell; slice: the transpose)
    im: (H, W, 3); values: (N, L).  Self-contribution is INCLUDED
    (see ``bilateral_self_weight``).
    """
    return _BilateralPlan(im, sxy, srgb, color_step).apply(values)




_BAND_NP_CACHE = {}


def _band_matrix_np(n: int, step: float = 1.0, taps=None) -> np.ndarray:
    """(n, n) banded blur matrix with grid step ``step`` sigmas; ``taps``
    overrides the Gaussian-sampled band (see ``color_band_taps``)."""
    key = (n, step) if taps is None else (n, step, taps.tobytes())
    if key not in _BAND_NP_CACHE:
        if taps is None:
            taps = _blur_taps(step)
        radius = len(taps) // 2
        m = np.zeros((n, n), np.float32)
        for offset, wgt in zip(range(-radius, radius + 1), taps):
            diag = np.arange(max(0, -offset), min(n, n - offset))
            m[diag, diag + offset] = wgt
        _BAND_NP_CACHE[key] = m
    return _BAND_NP_CACHE[key]


def _kron_band(n1: int, n2: int, step: float = 1.0, taps=None
               ) -> jnp.ndarray:
    return jnp.asarray(np.kron(_band_matrix_np(n1, step, taps),
                               _band_matrix_np(n2, step, taps)))


def bilateral_self_weight(im: jnp.ndarray, sxy: float, srgb: float,
                          color_step: float = 1.0, ctaps=None) -> jnp.ndarray:
    """Closed-form per-pixel self-weight of the box-cell splat/blur/slice
    kernel: spatial part contributes B(0)^2 == 1 (same cell, center blur
    tap); each color dim contributes (s0^2+s1^2) B(0) + 2 s0 s1 B(1) —
    a pixel's two hat taps only span blur offsets 0 and 1, so the form
    holds for any taps radius."""
    coords = (im.astype(jnp.float32) / (srgb * color_step)).reshape(-1, 3)
    frac = coords - jnp.floor(coords)
    s0, s1 = 1.0 - frac, frac
    taps = ctaps if ctaps is not None else _blur_taps(color_step)
    b0, b1 = float(taps[len(taps) // 2]), float(taps[len(taps) // 2 + 1])
    per_dim = (s0 ** 2 + s1 ** 2) * b0 + 2.0 * s0 * s1 * b1
    return jnp.prod(per_dim, axis=1)  # (N,)


def bilateral_norm(im: jnp.ndarray, sxy: float, srgb: float,
                   color_step: float = 1.0):
    """Constant-per-image normalization terms, hoisted out of the iteration
    loop: (norm, w_self) with norm = 1/sqrt(K 1 - w_self)."""
    n = im.shape[0] * im.shape[1]
    w_self = bilateral_self_weight(im, sxy, srgb, color_step)[:, None]
    ones = jnp.ones((n, 1), jnp.float32)
    ksum = bilateral_filter(im, ones, sxy, srgb, color_step) - w_self
    norm = jax.lax.rsqrt(jnp.maximum(ksum, 1e-20))
    return norm, w_self


def bilateral_message(im: jnp.ndarray, Q: jnp.ndarray, sxy: float,
                      srgb: float, norm=None, w_self=None,
                      color_step: float = 1.0) -> jnp.ndarray:
    """Normalized bilateral message with self excluded. Q: (N, L)."""
    if norm is None:
        norm, w_self = bilateral_norm(im, sxy, srgb, color_step)
    nq = Q * norm
    filt = bilateral_filter(im, nq, sxy, srgb, color_step) - w_self * nq
    return filt * norm


# ----------------------------------------------------------- mean field ----

@partial(jax.jit, static_argnames=("cfg", "n_labels"))
def mean_field(im: jnp.ndarray, unary: jnp.ndarray, cfg: CrfConfig,
               n_labels: int) -> jnp.ndarray:
    """im: (H, W, 3) 0-255; unary: (N, L) energies.  Returns Q (N, L)."""
    h, w, _ = im.shape
    s = cfg.resolution_scale
    if s > 1:
        # run at 1/s resolution with physically-rescaled kernel widths,
        # then nearest-upsample Q (same serving knob semantics as
        # mean_field_batched)
        im_s = im[::s, ::s]
        hs, ws = im_s.shape[:2]
        u_s = unary.reshape(h, w, n_labels)[::s, ::s].reshape(-1, n_labels)
        cfg_s = dataclasses.replace(
            cfg, resolution_scale=1,
            sxy_gaussian=cfg.sxy_gaussian / s,
            sxy_bilateral=cfg.sxy_bilateral / s)
        Q_s = mean_field(im_s, u_s, cfg_s, n_labels).reshape(hs, ws,
                                                            n_labels)
        Q = jnp.repeat(jnp.repeat(Q_s, s, axis=0), s, axis=1)[:h, :w]
        return Q.reshape(-1, n_labels)
    if _use_pallas(cfg):
        plan = _PallasPlan(im[None], cfg.sxy_bilateral, cfg.srgb,
                           cfg.color_step, cfg.splat_stride,
                           ctaps=_cfg_color_taps(cfg))
        u_img = jnp.moveaxis(unary.reshape(h, w, n_labels), -1, 0)[None]
        Qc = _mean_field_planes(plan, cfg, n_labels,
                                unary_c=plan.cells_v(u_img))
        q_img = plan.uncells_v(Qc, n_labels)                 # (1, L, H, W)
        return jnp.moveaxis(q_img[0], 0, -1).reshape(-1, n_labels)
    g_norm = gaussian_norm((h, w), cfg.sxy_gaussian)
    # One bilateral plan per image: the image-derived precomputation is
    # V-independent and shared by the norm pass + all 5 iterations.
    plan = _BilateralPlan(im, cfg.sxy_bilateral, cfg.srgb, cfg.color_step,
                          cfg.splat_stride, ctaps=_cfg_color_taps(cfg))
    b_self = bilateral_self_weight(im, cfg.sxy_bilateral, cfg.srgb,
                                   cfg.color_step,
                                   ctaps=_cfg_color_taps(cfg))[:, None]
    ones = jnp.ones((h * w, 1), jnp.float32)
    ksum = plan.apply(ones) - b_self
    # with a subsampled splat the KDE can miss an off-lattice pixel's own
    # mass — floor the denominator at b_self so the norm stays bounded
    # (same rationale as kernels/crf_fused._slice_attrs_kernel)
    floor = b_self if plan.stride > 1 else 1e-20
    b_norm = jax.lax.rsqrt(jnp.maximum(ksum, floor))

    def body(Q, _):
        q_img = Q.reshape(h, w, n_labels)
        msg_g = gaussian_message(q_img, cfg.sxy_gaussian,
                                 norm=g_norm).reshape(-1, n_labels)
        nq = Q * b_norm
        # clamp at 0: the exact excluded-self message is nonnegative (see
        # kernels/crf_fused._mf_step_kernel)
        msg_b = jnp.maximum(plan.apply(nq) - b_self * nq, 0.0) * b_norm
        logits = -unary + cfg.compat_gaussian * msg_g \
            + cfg.compat_bilateral * msg_b
        return jax.nn.softmax(logits, axis=-1), None

    Q0 = jax.nn.softmax(-unary, axis=-1)
    Q, _ = jax.lax.scan(body, Q0, None, length=cfg.n_iters)
    return Q


def do_crf(im, mask, zero_unsure: bool = True, cfg: CrfConfig = CrfConfig()):
    """Reference utils.py:74-91 API: hard mask in/out with label compression
    and remap.  ``im`` HxWx3 0-255, ``mask`` HxW int."""
    im = np.asarray(im)
    mask = np.asarray(mask)
    colors, labels = np.unique(mask, return_inverse=True)
    n_labels = len(colors)
    if n_labels == 1:
        return mask.copy()
    U = unary_from_labels(jnp.asarray(labels), n_labels, cfg.gt_prob,
                          zero_unsure=zero_unsure)
    Q = mean_field(jnp.asarray(im, jnp.float32), U, cfg, n_labels)
    MAP = np.argmax(np.asarray(Q), axis=-1).reshape(mask.shape[:2])
    return colors[MAP]


@partial(jax.jit, static_argnames=("cfg", "n_labels"))
def mean_field_batched(imgs: jnp.ndarray, masks: jnp.ndarray,
                       cfg: CrfConfig = CrfConfig(), n_labels: int = 21
                       ) -> jnp.ndarray:
    """Batched on-device CRF over hard masks (no label compression — all
    n_labels classes).  imgs: (B, H, W, 3); masks: (B, H, W) int.
    Returns refined masks (B, H, W)."""
    if _use_pallas(cfg):
        B, H, W = masks.shape
        s = cfg.resolution_scale
        if s > 1:
            imgs_s = imgs[:, ::s, ::s]
            masks_s = masks[:, ::s, ::s]
            cfg_s = dataclasses.replace(
                cfg, resolution_scale=1,
                sxy_gaussian=cfg.sxy_gaussian / s,
                sxy_bilateral=cfg.sxy_bilateral / s)
            out_s = mean_field_batched(imgs_s, masks_s, cfg_s, n_labels)
            out = jnp.repeat(jnp.repeat(out_s, s, axis=1), s, axis=2)
            return out[:, :H, :W]
        plan = _PallasPlan(imgs.astype(jnp.float32), cfg.sxy_bilateral,
                           cfg.srgb, cfg.color_step, cfg.splat_stride,
                           ctaps=_cfg_color_taps(cfg))
        labels_c = plan.cells_v(masks[:, None].astype(jnp.int32))
        Q = _mean_field_planes(plan, cfg, n_labels, labels_c=labels_c)
        pred_c = jnp.argmax(Q, axis=1, keepdims=True)    # (B*Z, 1, P)
        return plan.uncells_v(pred_c, 1)[:, 0]           # (B, H, W)

    def one(args):
        im, mask = args
        s = cfg.resolution_scale
        if s > 1:
            h, w = mask.shape
            im_s = im[::s, ::s]
            mask_s = mask[::s, ::s]
            cfg_s = dataclasses.replace(
                cfg, resolution_scale=1,
                sxy_gaussian=cfg.sxy_gaussian / s,
                sxy_bilateral=cfg.sxy_bilateral / s)
            U = unary_from_labels(mask_s.reshape(-1), n_labels, cfg.gt_prob,
                                  zero_unsure=False)
            Q = mean_field(im_s, U, cfg_s, n_labels)
            out_s = jnp.argmax(Q, axis=-1).reshape(mask_s.shape)
            return jnp.repeat(jnp.repeat(out_s, s, axis=0), s, axis=1)[:h, :w]
        U = unary_from_labels(mask.reshape(-1), n_labels, cfg.gt_prob,
                              zero_unsure=False)
        Q = mean_field(im, U, cfg, n_labels)
        return jnp.argmax(Q, axis=-1).reshape(mask.shape)

    # sequential chunks: the per-image pixel-space intermediates are large
    # (hundreds of MB); full vmap would multiply them by the batch size.
    # A symbolic batch dim (jax.export shape polymorphism) cannot be split
    # into fixed chunks — scan one-at-a-time there instead.
    bs = 2 if isinstance(imgs.shape[0], int) else None
    return jax.lax.map(one, (imgs.astype(jnp.float32), masks), batch_size=bs)
