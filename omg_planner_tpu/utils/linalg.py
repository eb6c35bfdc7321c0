"""Small fixed-size linear algebra, unrolled for the TPU VPU.

XLA:TPU lowers batched tiny solves (``jnp.linalg.solve`` on ``[B, 6, 6]``)
through a batched LU path that costs ~1.1 ms/iteration at B=384 inside the
IK loop (round-2 microbenchmark); an unrolled Cholesky is pure elementwise
arithmetic that vectorizes across the batch on the VPU — measured 2x faster
at 384 lanes and 4x at 1920 lanes, max deviation 5e-8 vs ``linalg.solve``.

Only valid for SPD systems (the damped-least-squares normal matrix
``J J^T + lambda I`` always is).
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_spd_unrolled(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a x = b`` for SPD ``a [..., n, n]`` and ``b [..., n]``.

    Fully unrolled Cholesky + two triangular substitutions; ``n`` must be a
    small static size (the IK use is n=6).  All operations are elementwise
    over the leading batch dims — no batched-LU lowering.
    """
    n = a.shape[-1]
    # Cholesky: a = L L^T, column by column
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-20))
        l[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv_d
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x, axis=-1)


def take_rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather ``a[idx]`` via flat scalar takes.

    ``jnp.take(a, idx, axis=0)`` on a multi-dim ``a`` lowers to
    ``lax.gather`` with slice_sizes > 1, which is ~50x slower than plain
    scalar gathers on this chip (DESIGN.md §3b; a [384]-row compaction of
    [624, 5, 4, 4] targets measured 41 ms).  Flattening to 1-D scalar takes
    runs at the ~150 M gathers/s ceiling instead.
    """
    if a.ndim == 1:
        return jnp.take(a, idx)
    shp = a.shape
    row = 1
    for s in shp[1:]:
        row *= s
    off = idx[:, None] * row + jnp.arange(row, dtype=idx.dtype)[None, :]
    out = jnp.take(a.reshape(-1), off.reshape(-1))
    return out.reshape((idx.shape[0],) + shp[1:])
