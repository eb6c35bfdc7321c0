"""Pallas TPU kernels for the framework's hot dense ops.

Kernels here follow the TPU playbook (pallas_guide.md): MXU-shaped tiles,
VMEM residency, fused epilogues, no data-dependent shapes.  Every kernel has
a pure-XLA reference implementation used as fallback (CPU tests run the
fallback; the TPU path is validated against it).

Currently implemented:

  * :func:`min_dist_grid` — nearest-point distance field for the
    perception-mode SDF (reference builds this with a host KD-tree,
    ``omg/core.py:426-457``).  The naive formulation materializes a
    [grid_cells x points] distance matrix (GBs); this kernel tiles grid
    cells onto the MXU via the ||g-p||^2 = ||g||^2 + ||p||^2 - 2 g.p
    expansion and keeps a running min in the matmul epilogue, so memory
    stays O(tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TILE_G = 1024  # grid cells per program (1-D block alignment)
_TILE_N = 1024  # points per reduction step

try:  # pallas availability is platform-dependent
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _min_dist_kernel(g_ref, p_ref, p2_ref, out_ref):
    """One grid tile against all point tiles; running min in VMEM."""
    g = g_ref[...]                      # [TILE_G, 3]
    g2 = jnp.sum(g * g, axis=1, keepdims=True)          # [TILE_G, 1]
    n_tiles = p_ref.shape[0] // _TILE_N

    def body(i, best):
        off = pl.multiple_of(i * _TILE_N, _TILE_N)
        p = p_ref[pl.ds(off, _TILE_N), :]               # [TILE_N, 3]
        p2 = p2_ref[pl.ds(off, _TILE_N)]                # [TILE_N]
        dots = jax.lax.dot_general(
            g, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [TILE_G, TILE_N]
        d2 = g2 + p2[None, :] - 2.0 * dots
        return jnp.minimum(best, jnp.min(d2, axis=1))

    best = jax.lax.fori_loop(
        0, n_tiles, body, jnp.full((_TILE_G,), jnp.inf, jnp.float32))
    out_ref[...] = jnp.sqrt(jnp.maximum(best, 0.0))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def min_dist_grid_xla(grid: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Reference path: blocked jnp computation (fallback + oracle)."""
    g2 = jnp.sum(grid**2, axis=1, keepdims=True)
    p2 = jnp.sum(points**2, axis=1)[None, :]
    d2 = g2 + p2 - 2.0 * (grid @ points.T)
    return jnp.sqrt(jnp.maximum(d2.min(axis=1), 0.0))


def min_dist_grid(grid: jnp.ndarray, points: jnp.ndarray,
                  use_pallas: bool | None = None) -> jnp.ndarray:
    """Min distance from each grid cell [G, 3] to the point set [N, 3].

    Pads to MXU-aligned tiles; padded points sit at +inf distance (a far
    sentinel), padded grid rows are dropped.
    """
    if use_pallas is None:
        use_pallas = HAVE_PALLAS and jax.default_backend() not in ("cpu",)
    if not use_pallas:
        return min_dist_grid_xla(grid, points)

    g = grid.shape[0]
    n = points.shape[0]
    gp = _round_up(g, _TILE_G)
    np_ = _round_up(n, _TILE_N)
    grid_pad = jnp.zeros((gp, 3), jnp.float32).at[:g].set(grid)
    far = 1e6
    pts_pad = jnp.full((np_, 3), far, jnp.float32).at[:n].set(points)
    p2 = jnp.sum(pts_pad**2, axis=1)

    out = pl.pallas_call(
        _min_dist_kernel,
        grid=(gp // _TILE_G,),
        in_specs=[
            pl.BlockSpec((_TILE_G, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all points resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_G,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gp,), jnp.float32),
    )(grid_pad, pts_pad, p2)
    return out[:g]
