"""Point-cloud SDF construction on device.

Replaces the reference's perception mode SDF build — a host-side
``scipy.spatial.cKDTree.query`` over every workspace voxel
(``omg/core.py:426-457``) — with a brute-force nearest-point distance grid
computed as one batched matmul-shaped program:

    ||g - p||^2 = ||g||^2 + ||p||^2 - 2 g.p

which XLA maps straight onto the MXU.  For the reference's default sizes
(0.02 m resolution, 0.24 m margin, ~4k points) this is a few GFLOPs — well
under a millisecond of TPU compute vs seconds of host KD-tree queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sdf import SignedDensityField


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _min_dist_grid(points: jnp.ndarray, dims: tuple, origin: tuple,
                   delta: float) -> jnp.ndarray:
    """[N, 3] points -> [dims] grid of nearest-point distances.

    On TPU this dispatches to the tiled Pallas kernel
    (``ops/pallas_kernels.min_dist_grid``); elsewhere a chunked XLA
    reduction keeps memory at O(chunk x N) instead of materializing the
    full [G, N] distance matrix."""
    from .pallas_kernels import HAVE_PALLAS, min_dist_grid, min_dist_grid_xla

    ax = [jnp.asarray(origin[i]) + jnp.arange(dims[i]) * delta
          for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*ax, indexing="ij")
    grid = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [G, 3]
    if HAVE_PALLAS and jax.default_backend() not in ("cpu",):
        return min_dist_grid(grid, points, use_pallas=True).reshape(dims)
    g = grid.shape[0]
    chunk = 16384
    pad = (-g) % chunk
    grid_p = jnp.concatenate([grid, jnp.zeros((pad, 3))], axis=0)
    out = jax.lax.map(
        lambda c: min_dist_grid_xla(c, points),
        grid_p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:g].reshape(dims)


def sdf_from_points(
    points: np.ndarray,
    resolution: float = 0.02,
    margin: float = 0.24,
) -> SignedDensityField:
    """Build an (unsigned) distance field around a point cloud.

    Grid layout matches the reference (``core.py:435-452``): workspace
    bounds from the points, ``margin`` padding on every side, cell centers
    at ``origin + i * resolution``.
    """
    points = np.asarray(points, np.float32)
    if points.shape[0] == 0:
        points = np.full((2, 3), 3.0, np.float32)  # core.py:433-434
    lo = points.min(0) - margin
    hi = points.max(0) + margin
    dims = tuple(int(np.ceil((hi[i] - lo[i]) / resolution)) for i in range(3))
    data = _min_dist_grid(
        jnp.asarray(points), dims, tuple(float(v) for v in lo), resolution)
    return SignedDensityField(np.asarray(data), lo.astype(np.float64),
                              resolution)
