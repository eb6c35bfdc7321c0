"""Trajectory initialization splines, closed-form and batched.

The reference initializes trajectories with a *clamped cubic spline* between
exactly two waypoints via scipy (``omg/util.py:238-290``).  For two waypoints
with zero end-derivatives the spline has the closed form

    p(t) = start + (end - start) * (3 t^2 - 2 t^3)

evaluated at the interior points of ``linspace(0, 1, n + 2)``.  We use that
closed form (no scipy in the jitted path) and a plain linear ramp for the
online learner's candidate trajectories (``omg/util.py:261-290``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _interior_times(n: int) -> jnp.ndarray:
    return jnp.linspace(0.0, 1.0, n + 2)[1:-1]


def cubic_interpolate(start: jnp.ndarray, end: jnp.ndarray, n: int) -> jnp.ndarray:
    """Clamped cubic from start to end; returns [n, dof].

    Matches ``interpolate_waypoints(stack([start, end]), n, dof, "cubic")``
    (reference ``omg/util.py:238-258`` with 2 waypoints).
    """
    t = _interior_times(n)
    s = 3.0 * t**2 - 2.0 * t**3
    return start[None, :] + s[:, None] * (end - start)[None, :]


def linear_interpolate(start: jnp.ndarray, end: jnp.ndarray, n: int) -> jnp.ndarray:
    """Linear ramp; returns [n, dof]."""
    t = _interior_times(n)
    return start[None, :] + t[:, None] * (end - start)[None, :]


def multi_linear_interpolate(start: jnp.ndarray, goals: jnp.ndarray, n: int) -> jnp.ndarray:
    """One start to many goals, linear; returns [g, n, dof].

    Matches ``multi_interpolate_waypoints`` with mode="linear"
    (reference ``omg/util.py:261-290``), without the flattening.
    """
    t = _interior_times(n)
    if start.ndim == 1:
        start = jnp.broadcast_to(start[None, :], goals.shape)
    return start[:, None, :] + t[None, :, None] * (goals - start)[:, None, :]


def multi_cubic_interpolate(start: jnp.ndarray, goals: jnp.ndarray, n: int) -> jnp.ndarray:
    """One start to many goals, clamped cubic; returns [g, n, dof]."""
    t = _interior_times(n)
    s = 3.0 * t**2 - 2.0 * t**3
    if start.ndim == 1:
        start = jnp.broadcast_to(start[None, :], goals.shape)
    return start[:, None, :] + s[None, :, None] * (goals - start)[:, None, :]
