"""Endpoint-corrected finite-difference derivative operators.

Reproduces the reference's ``get_derivative`` semantics
(``omg/config.py:134-159``): apply the (n+1, n) banded difference matrix,
add boundary corrections from the fixed ``start``/``end`` states, and drop
the final row.  Works on arrays with leading batch dims; the differenced
axis is ``-2``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DIFF_RULES, DIFF_RULE_LENGTH, HorizonParams


def get_derivative(
    hp: HorizonParams,
    data: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    order: int = 1,
) -> jnp.ndarray:
    """Differentiate ``data [..., n, m]`` along axis -2; returns [..., n, m].

    ``start``/``end`` are the fixed boundary states with the same trailing
    shape ``[..., m]`` (broadcastable).
    """
    n = data.shape[-2]
    dmat = jnp.asarray(hp.diff_matrices[order - 1][: n + 1, :n])
    # one large [n+1, n] @ [n, B] matmul instead of B tiny batched
    # [n+1, n] @ [n, m] dots (XLA:TPU pads the latter onto full MXU tiles;
    # the learner's arc-length sweep has B ~ 10^4 of them per step)
    moved = jnp.moveaxis(data, -2, 0)           # [n, ..., m]
    out = (dmat @ moved.reshape(n, -1)).reshape(
        (n + 1,) + moved.shape[1:])
    out = jnp.moveaxis(out, 0, -2)              # [..., n+1, m]
    mid = DIFF_RULE_LENGTH // 2
    rule = DIFF_RULES[order - 1]
    dt = hp.time_interval ** order
    out = out.at[..., 0, :].add(rule[mid - 1] * start / dt)
    out = out.at[..., -2, :].add(rule[mid + 1] * end / dt)
    out = out.at[..., -1, :].add(rule[mid] * end / dt)
    return out[..., :-1, :]
