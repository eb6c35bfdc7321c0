"""The robot-model protocol the planner consumes (VERDICT r1 item 6).

The CHOMP/plan stack calls THESE functions, never ``panda.*`` directly, so
any model satisfying the protocol plans end-to-end.  Two implementations
ship: :class:`~.panda.PandaModel` (the flagship, with its hand-tuned
lane-last FK) and :class:`~.chain.ChainModel` (any URDF serial chain).
Dispatch is ``isinstance`` at trace time — zero runtime cost under jit.

The protocol (shapes: L links, P points/link, D dofs):

  * ``fk_with_joint_info_batch(model, q[n, D])`` ->
    (poses [n, L, 4, 4], joint origins [n, L', 3], joint axes [n, L', 3])
  * ``fk_one(model, q[D])`` -> poses [L, 4, 4]
  * ``fk_batch(model, q[n, D])`` -> poses [n, L, 4, 4]
  * ``point_positions(model, poses)`` -> [.., L, P, 3]
  * ``point_jacobians(model, origins, axes, x)`` -> [n, L, P, D, 3]
  * ``tip_pose(model, q)`` -> [4, 4] (IK/grasp frame: panda_hand, or the
    chain tip)
  * ``num_links/dof/soft_limits`` — static host-side metadata
  * ``finger_link_mask/arm_dof_mask/gripper_clamp`` — gripper conventions
    (the Panda's finger softening / clamp; identity for a plain chain)

Goal-set construction (grasp DBs, standoff chains, anchor IK seeds) stays
Panda-specific by nature — it encodes the panda_hand grasp frame
(``omg/planner.py:395-443``); a new end-effector supplies its own grasp
machinery.  The plan loop itself (``planner/plan.py`` with
``goal_set_proj=False`` or an externally built goal set) is fully generic,
exercised by ``tests/test_chain_plan.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import chain as chain_mod
from . import panda as panda_mod
from .chain import FIXED, PRISMATIC, ChainModel
from .panda import PandaModel


def num_links(model) -> int:
    return model.collision_points.shape[0]


def dof(model) -> int:
    if isinstance(model, PandaModel):
        return panda_mod.DOF
    return model.num_dof


def _chain_tables(model: ChainModel):
    """(dof->joint-row index, affect [L, D], prismatic [D]) — static."""
    jt = np.asarray(model.jtype)
    moving = np.where(jt != FIXED)[0]
    links = np.arange(len(jt))
    affect = (links[:, None] >= moving[None, :]).astype(np.float32)
    prismatic = (jt[moving] == PRISMATIC).astype(np.float32)
    return moving, affect, prismatic


def fk_with_joint_info_batch(model, q: jnp.ndarray):
    if isinstance(model, PandaModel):
        return panda_mod.fk_with_joint_info_batch(model, q)
    return chain_mod.chain_fk_with_joint_info_batch(model, q)


def fk_one(model, q: jnp.ndarray):
    if isinstance(model, PandaModel):
        return panda_mod.forward_kinematics(model, q)
    return chain_mod.chain_fk(model, q)


def fk_batch(model, q: jnp.ndarray):
    if isinstance(model, PandaModel):
        return panda_mod.forward_kinematics_batch(model, q)
    return chain_mod.chain_fk_batch(model, q)


def point_positions(model, poses: jnp.ndarray):
    # the broadcast multiply-add form only touches model.collision_points —
    # shared by both implementations
    return panda_mod.collision_point_positions(model, poses)


def point_jacobians(model, origins_w, axes_w, x):
    """[n, L, P, D, 3] linear point Jacobians; the generic formula of
    ``panda.point_jacobians`` driven by model-derived static tables."""
    if isinstance(model, PandaModel):
        return panda_mod.point_jacobians(model, origins_w, axes_w, x)
    d2j, affect, prismatic = _chain_tables(model)
    ax = axes_w[:, d2j, :]
    og = origins_w[:, d2j, :]
    rel = x[:, :, :, None, :] - og[:, None, None, :, :]  # [n, L, P, D, 3]
    rev = jnp.cross(jnp.broadcast_to(ax[:, None, None], rel.shape), rel)
    pris = jnp.broadcast_to(ax[:, None, None], rel.shape)
    p_mask = jnp.asarray(prismatic)[None, None, None, :, None]
    jac = rev * (1.0 - p_mask) + pris * p_mask
    return jac * jnp.asarray(affect)[None, :, None, :, None]


def tip_pose(model, q: jnp.ndarray):
    if isinstance(model, PandaModel):
        return panda_mod.hand_pose(model, q)
    return chain_mod.chain_fk(model, q)[-1]


def soft_limits(model, padding: float):
    return model.soft_limits(padding)


# -- gripper conventions ----------------------------------------------------

def finger_link_mask(model) -> np.ndarray:
    """[L] host float mask: 1 for finger links (Panda: the last two)."""
    m = np.zeros(num_links(model), np.float32)
    if isinstance(model, PandaModel):
        m[-2:] = 1.0
    return m


def arm_dof_mask(model) -> np.ndarray:
    """[D] host float mask: 1 for non-gripper dofs."""
    m = np.ones(dof(model), np.float32)
    if isinstance(model, PandaModel):
        m[-2:] = 0.0
    return m


def gripper_clamp(model, xi: jnp.ndarray) -> jnp.ndarray:
    """Clamp gripper dofs to their hard range (Panda fingers to
    [0, 0.04], ``omg/core.py:43-51``); identity for gripperless chains."""
    if isinstance(model, PandaModel):
        return xi.at[..., -2:].set(jnp.clip(xi[..., -2:], 0.0, 0.04))
    return xi
