"""Articulated rigid-body dynamics for the Panda arm.

Completes the reference's Bullet Panda-model surface natively: the
reference drives its arm through PyBullet's TORQUE_CONTROL motors and
``calculateInverseDynamics`` (``bullet/panda_gripper.py:176-192``),
delegating the dynamics to Bullet's C engine.  Here the same quantities
come from a closed-form Lagrangian formulation over the FK chain —
deliberately NOT the sequential recursive Newton-Euler algorithm, whose
link-by-link forward/backward passes are a pure latency chain on TPU:

* every link's world Jacobian comes from one batched FK call
  (``models/panda.py::forward_kinematics(return_joint_info=True)``);
* the joint-space mass matrix is two stacked einsums over those
  Jacobians, ``M = sum_l m_l J_v^T J_v + I_l J_w^T J_w`` — the world
  rotational term collapses to a scalar because every URDF link inertia
  is isotropic (``bullet/models/panda/panda_gripper.urdf`` inertials:
  ixx = iyy = izz, COM at the link origin);
* Coriolis/centrifugal bias is assembled from ``jax.jvp``/``jax.grad``
  of the mass-matrix quadratic form (``c = Mdot qd - 1/2 d/dq (qd^T M
  qd)``) — the classic Christoffel contraction, but produced by the AD
  engine as one fused program instead of nested loops.

Inertial constants below are data extracted from the reference URDF
(masses, isotropic inertia scalars, gravity -9.81 as set by
``bullet/panda_scene.py:208``).  All functions take the 9-vector joint
layout used everywhere in this package (7 arm revolute + 2 finger
prismatic); the reference's 10-slot Bullet layout inserts a zero for the
fixed ``panda_joint8`` (``panda_gripper.py:154-162``) which
:mod:`panda_ctrl` adapts at the surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import panda

# Link inertial data, reference URDF bullet/models/panda/panda_gripper.urdf
# (<inertial> blocks), in this package's link order: link1..link7, hand,
# leftfinger, rightfinger.  link0 is the fixed base — no dynamics.
LINK_MASSES = np.asarray(
    [2.34, 2.36, 2.38, 2.43, 3.5, 1.47, 0.45, 0.68, 0.01, 0.01])
# ixx = iyy = izz per link -> world inertia tensor is isotropic:
# R diag(i,i,i) R^T = i * eye(3), so only the scalar survives.
LINK_INERTIAS = np.asarray(
    [0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.1, 0.1, 0.1])
GRAVITY = 9.81  # bullet/panda_scene.py:208 setGravity(0, 0, -9.81)

# Per-joint effort limits from the URDF <limit effort=...> tags — the
# physically meaningful clamp.  (The reference's Panda class overrides
# them with a uniform 250 N m, panda_gripper.py:43-55; panda_ctrl
# follows the class, this table is for callers who want the real datasheet
# limits.)
JOINT_EFFORT_LIMITS = np.asarray(
    [87.0, 87.0, 87.0, 87.0, 12.0, 12.0, 12.0, 20.0, 20.0])


def link_jacobians(model: panda.PandaModel, q9: jnp.ndarray):
    """World-frame link Jacobians for one configuration ``q9 [9]``.

    Returns ``(J_v [10, 3, 9], J_w [10, 3, 9], p [10, 3])`` where row
    ``l`` maps joint velocities to link ``l``'s COM linear / angular
    world velocity.  COMs sit at the link-frame origins (URDF inertial
    origins are all zero).  vmap over a leading batch axis for batches.
    """
    poses, origins, axes = panda.forward_kinematics(
        model, q9, apply_offset=False, return_joint_info=True)
    p = poses[:, :3, 3]                                   # [10, 3]

    # revolute columns (joints 0..6): joint j moves link l iff j <= l,
    # and every joint moves the hand/finger links (l >= 7).
    link_idx = jnp.arange(10)
    active = jnp.arange(7)[None, :] <= jnp.minimum(link_idx, 6)[:, None]
    actf = active[..., None].astype(q9.dtype)             # [10, 7, 1]
    lever = p[:, None, :] - origins[None, :7, :]          # [10, 7, 3]
    jv_rev = jnp.cross(axes[None, :7, :], lever) * actf   # [10, 7, 3]
    jw_rev = jnp.broadcast_to(axes[None, :7, :], (10, 7, 3)) * actf

    # prismatic finger columns: q[7] translates link 8 along axes[8]
    # (+y of the hand), q[8] translates link 9 along axes[9] (-y) —
    # matching the FK's finger offsets (models/panda.py:190-191).
    jv_fing = jnp.zeros((10, 2, 3), q9.dtype)
    jv_fing = jv_fing.at[8, 0].set(axes[8])
    jv_fing = jv_fing.at[9, 1].set(axes[9])
    jw_fing = jnp.zeros((10, 2, 3), q9.dtype)

    j_v = jnp.concatenate([jv_rev, jv_fing], axis=1)      # [10, 9, 3]
    j_w = jnp.concatenate([jw_rev, jw_fing], axis=1)
    return jnp.swapaxes(j_v, 1, 2), jnp.swapaxes(j_w, 1, 2), p


def mass_matrix(model: panda.PandaModel, q9: jnp.ndarray) -> jnp.ndarray:
    """Joint-space inertia matrix ``M(q) [9, 9]`` (symmetric PD)."""
    j_v, j_w, _ = link_jacobians(model, q9)
    m = jnp.asarray(LINK_MASSES, q9.dtype)
    i = jnp.asarray(LINK_INERTIAS, q9.dtype)
    return (jnp.einsum("l,lai,laj->ij", m, j_v, j_v)
            + jnp.einsum("l,lai,laj->ij", i, j_w, j_w))


def potential_energy(model: panda.PandaModel, q9: jnp.ndarray) -> jnp.ndarray:
    """Gravitational potential ``V(q)`` (zero level: world z = 0)."""
    poses = panda.forward_kinematics(model, q9, apply_offset=False)
    z = poses[:, 2, 3]
    return GRAVITY * jnp.sum(jnp.asarray(LINK_MASSES, q9.dtype) * z)


def kinetic_energy(model: panda.PandaModel, q9: jnp.ndarray,
                   qd9: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * qd9 @ mass_matrix(model, q9) @ qd9


def gravity_torque(model: panda.PandaModel, q9: jnp.ndarray) -> jnp.ndarray:
    """``g(q) = dV/dq``: the torque gravity exerts must be countered by
    ``+g(q)`` for a static hold (``M qdd + c + g = tau``)."""
    return jax.grad(lambda q: potential_energy(model, q))(q9)


def bias_torque(model: panda.PandaModel, q9: jnp.ndarray,
                qd9: jnp.ndarray) -> jnp.ndarray:
    """Coriolis/centrifugal + gravity bias ``c(q, qd) + g(q)``.

    ``Mdot qd`` comes from a jvp of ``q -> M(q) qd`` along ``qd`` (the
    chain rule gives exactly ``(dM/dq . qd) qd``); the quadratic-form
    gradient supplies the other Christoffel half.
    """
    mdot_qd = jax.jvp(lambda q: mass_matrix(model, q) @ qd9,
                      (q9,), (qd9,))[1]
    quad = jax.grad(
        lambda q: 0.5 * qd9 @ mass_matrix(model, q) @ qd9)(q9)
    return mdot_qd - quad + gravity_torque(model, q9)


def inverse_dynamics(model: panda.PandaModel, q9: jnp.ndarray,
                     qd9: jnp.ndarray, qdd9: jnp.ndarray) -> jnp.ndarray:
    """``tau = M(q) qdd + c(q, qd) + g(q)`` — the native
    ``calculateInverseDynamics`` (reference ``panda_gripper.py:191-192``)."""
    return mass_matrix(model, q9) @ qdd9 + bias_torque(model, q9, qd9)


def forward_dynamics(model: panda.PandaModel, q9: jnp.ndarray,
                     qd9: jnp.ndarray, tau9: jnp.ndarray) -> jnp.ndarray:
    """``qdd = M(q)^-1 (tau - c - g)`` via Cholesky (M is SPD)."""
    m = mass_matrix(model, q9)
    rhs = tau9 - bias_torque(model, q9, qd9)
    c, lower = jax.scipy.linalg.cho_factor(m)
    return jax.scipy.linalg.cho_solve((c, lower), rhs)
