"""Pallas TPU kernels for the CRF bilateral grid (SURVEY.md N2 north star).

The XLA formulation (crf/dense_crf.py) materializes the per-pixel factor
tensors ``t_rg (P, nc^2)`` and ``t_lb (P, nc*L)`` in HBM (~hundreds of MB per
filter call).  These kernels keep them in VMEM only:

- inputs are the small per-channel factors ``ar/ag/ab (Z, P, nc)`` (built by
  XLA elementwise) and values ``v (Z, P, L)``;
- in-kernel, the joint factors are expanded with static one-hot *selector*
  matmuls (MXU work, not VPU iota arithmetic):
      t_rg = (ar @ SelR) * (ag @ SelG)        # (CHUNK, nc^2)
      t_lb = (ab @ SelB) * (v @ SelL)         # (CHUNK, nc*L)
- ``splat_cells`` accumulates G[z] += t_rg^T @ t_lb over pixel chunks in the
  revisited output block; ``slice_cells`` computes
  ((t_rg @ G[z]) * (ab @ SelB)) @ R with R the static b-summing matrix.

Factor layouts match dense_crf.py: c = r*nc+g, d = l*nc+b.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=None)
def _selectors(nc: int, L: int):
    c_w, d_w = nc * nc, L * nc
    sel_r = np.zeros((nc, c_w), np.float32)
    sel_g = np.zeros((nc, c_w), np.float32)
    for c in range(c_w):
        sel_r[c // nc, c] = 1.0
        sel_g[c % nc, c] = 1.0
    sel_l = np.zeros((L, d_w), np.float32)
    sel_b = np.zeros((nc, d_w), np.float32)
    red = np.zeros((d_w, L), np.float32)
    for d in range(d_w):
        sel_l[d // nc, d] = 1.0
        sel_b[d % nc, d] = 1.0
        red[d, d // nc] = 1.0
    return sel_r, sel_g, sel_l, sel_b, red


def _expand(x_ref, sel_ref):
    return jnp.dot(x_ref[0], sel_ref[:],
                   preferred_element_type=jnp.float32)


def _splat_kernel(ar_ref, ag_ref, ab_ref, v_ref, selr_ref, selg_ref,
                  sell_ref, selb_ref, out_ref, *, nc, L):
    k = pl.program_id(1)
    t_rg = _expand(ar_ref, selr_ref) * _expand(ag_ref, selg_ref)  # (CHUNK, c)
    t_lb = _expand(ab_ref, selb_ref) * _expand(v_ref, sell_ref)   # (CHUNK, d)
    contrib = jax.lax.dot_general(
        t_rg, t_lb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (c, d)

    @pl.when(k == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(k != 0)
    def _():
        out_ref[0] += contrib


def _slice_kernel(ar_ref, ag_ref, ab_ref, g_ref, selr_ref, selg_ref,
                  selb_ref, red_ref, out_ref, *, nc, L):
    t_rg = _expand(ar_ref, selr_ref) * _expand(ag_ref, selg_ref)  # (CHUNK, c)
    m = jnp.dot(t_rg, g_ref[0], preferred_element_type=jnp.float32)
    m = m * _expand(ab_ref, selb_ref)                        # (CHUNK, d)
    out_ref[0] = jnp.dot(m, red_ref[:],
                         preferred_element_type=jnp.float32)  # (CHUNK, L)


def _factor_specs(chunk, nc, L):
    fspec = pl.BlockSpec((1, chunk, nc), lambda z, k: (z, k, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, chunk, L), lambda z, k: (z, k, 0),
                         memory_space=pltpu.VMEM)
    return fspec, vspec


@functools.partial(jax.jit, static_argnames=("nc", "L", "chunk", "interpret"))
def splat_cells(ar, ag, ab, values, nc: int, L: int, chunk: int = 1600,
                interpret: bool = False) -> jnp.ndarray:
    """ar/ag/ab: (Z, P, nc) per-channel factors; values: (Z, P, L).
    Returns G: (Z, nc*nc, L*nc) f32."""
    Z, P, _ = ar.shape
    assert P % chunk == 0, (P, chunk)
    fspec, vspec = _factor_specs(chunk, nc, L)
    sel_r, sel_g, sel_l, sel_b, _ = _selectors(nc, L)
    const = lambda a: pl.BlockSpec(a.shape, lambda z, k: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_splat_kernel, nc=nc, L=L),
        grid=(Z, P // chunk),
        in_specs=[fspec, fspec, fspec, vspec,
                  const(sel_r), const(sel_g), const(sel_l), const(sel_b)],
        out_specs=pl.BlockSpec((1, nc * nc, L * nc), lambda z, k: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, nc * nc, L * nc), jnp.float32),
        interpret=interpret,
    )(ar, ag, ab, values, sel_r, sel_g, sel_l, sel_b)


@functools.partial(jax.jit, static_argnames=("nc", "L", "chunk", "interpret"))
def slice_cells(ar, ag, ab, grid_vals, nc: int, L: int, chunk: int = 1600,
                interpret: bool = False) -> jnp.ndarray:
    """ar/ag/ab: (Z, P, nc); grid_vals: (Z, nc*nc, L*nc).
    Returns out: (Z, P, L) f32."""
    Z, P, _ = ar.shape
    assert P % chunk == 0, (P, chunk)
    fspec, vspec = _factor_specs(chunk, nc, L)
    sel_r, sel_g, _, sel_b, red = _selectors(nc, L)
    const = lambda a: pl.BlockSpec(a.shape, lambda z, k: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_slice_kernel, nc=nc, L=L),
        grid=(Z, P // chunk),
        in_specs=[fspec, fspec, fspec,
                  pl.BlockSpec((1, nc * nc, L * nc), lambda z, k: (z, 0, 0),
                               memory_space=pltpu.VMEM),
                  const(sel_r), const(sel_g), const(sel_b), const(red)],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((Z, P, L), jnp.float32),
        interpret=interpret,
    )(ar, ag, ab, grid_vals, sel_r, sel_g, sel_b, red)
