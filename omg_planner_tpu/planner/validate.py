"""Execution validation: grade a planned trajectory the way the physics
harness would, without a physics engine.

The reference's de-facto integration test is PyBullet lift success
(``bullet/panda_scene.py:486-504``): execute open-loop, close the gripper,
lift 20 cm, check the object came along.  PyBullet cannot be installed in
this image (``apps/bullet_exec.py`` stays the gated real-physics path), so
this module grades the same failure modes kinematically, strictly more
finely than the planner's own terminate predicate:

  1. **Swept collision**: the plan is resampled at a configuration
     resolution fine enough that no collision point moves more than half
     an SDF cell between samples; every sample is tested against the
     EXACT per-object query with zero clearance — not the planner's
     top-k / epsilon-band cost, and not the fused field.
  2. **Grasp geometry**: at the final configuration the finger pads must
     straddle the target (target surface points between the pads within
     the finger stroke) — the kinematic precondition for the gripper
     close at ``panda_scene.py:470-480``.
  3. **Antipodal friction cone**: among the points inside the closing
     volume there must be contact candidates on BOTH pad sides whose
     outward surface normals lie within the friction cone of the pad
     travel axis — the quasi-static force-closure precondition of the
     pinch (a straddle whose surfaces parallel the pads slips under the
     lift load).
  4. **Lift clearance**: the straight +z lift of the hand by 20 cm (the
     harness's reward motion) is swept against the scene with the target
     attached, catching plans that grasp successfully but cannot retract.

A plan passing all four fails in physics only through dynamics (inertia,
contact softness) — exactly the residual a real-robot deployment
validates on hardware anyway.  Used by the suite runner for an execution-validated
success column next to the planner verdicts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import api as model_api
from ..ops.sdf import sdf_potentials


class ExecutionReport(NamedTuple):
    swept_collision_points: int   # exact-query hits along the fine sweep
    grasp_ok: bool                # fingers straddle the target
    antipodal_ok: bool            # pad contacts admit a friction-cone pinch
    lift_collision_points: int    # hits along the +z retract sweep
    valid: bool                   # all checks pass

    def to_dict(self) -> dict:
        return {
            "swept_collision_points": int(self.swept_collision_points),
            "grasp_ok": bool(self.grasp_ok),
            "antipodal_ok": bool(self.antipodal_ok),
            "lift_collision_points": int(self.lift_collision_points),
            "valid": bool(self.valid),
        }


def _resample(traj: np.ndarray, max_step: float) -> np.ndarray:
    """Piecewise-linear resample so no joint moves more than ``max_step``
    rad between consecutive samples (config-space Lipschitz bound on
    point motion; the Panda's longest lever arm is < 1 m, so 0.5 cm of
    workspace motion <= ~0.005 rad of joint motion)."""
    out = [traj[0]]
    for a, b in zip(traj[:-1], traj[1:]):
        d = float(np.abs(b - a).max())
        n = max(int(np.ceil(d / max_step)), 1)
        for i in range(1, n + 1):
            out.append(a + (b - a) * (i / n))
    return np.asarray(out)


def _exact_hits(model, scene_sdf, params, q_samples: jnp.ndarray,
                skip_fingers: bool) -> jnp.ndarray:
    """Total exact-query collision count over configurations [N, D]."""
    poses = model_api.fk_batch(model, q_samples)
    x = model_api.point_positions(model, poses)  # [N, L, P, 3]
    _, _, collide = sdf_potentials(
        scene_sdf, params.inv_poses, x.reshape(-1, 3), params.epsilons,
        params.padding_scales, jnp.zeros_like(params.clearances),
        params.disables)
    collide = collide.reshape(x.shape[:3])
    if skip_fingers:
        keep = jnp.asarray(1.0 - model_api.finger_link_mask(model))
        collide = collide * keep[None, :, None]
    return collide.sum()


@functools.partial(jax.jit, static_argnums=(3,))
def _ik_one(model, target, seed7, cfg_key, lo7, hi7):
    from ..ops.ik import ik_single

    return ik_single(model, target, seed7, cfg_key, lo7, hi7)


@jax.jit
def _analytic_grad_jit(kind, half, penal, pts):
    from ..ops.sdf import _analytic_sdf_grad

    return _analytic_sdf_grad(kind, half, penal, pts)


@jax.jit
def _grasp_geometry(hand_pose, target_pts_w, finger_opening):
    """Fingers straddle the target: some target surface point sits inside
    the closing volume between the pads, expressed in the HAND frame
    (+z approach, +/-y pad travel; grasp center ~0.103 m along +z —
    ``io/assets.py::HAND_TO_GRASP``)."""
    r, t = hand_pose[:3, :3], hand_pose[:3, 3]
    local = (target_pts_w - t) @ r
    between_pads = jnp.abs(local[:, 1]) < finger_opening
    in_stroke = (jnp.abs(local[:, 0]) < 0.05) & \
        (jnp.abs(local[:, 2] - 0.103) < 0.05)
    return (between_pads & in_stroke).any()


def _target_surface_normals_obj(target, pts_obj: np.ndarray) -> np.ndarray:
    """Outward unit surface normals (object frame) at surface points:
    closed-form for analytic primitives, central-difference of the grid
    lookup for data-backed volumes."""
    sdf = target.sdf
    ana = getattr(sdf, "analytic", None)
    if ana is not None:
        kind, half, penal = ana
        # one jitted dispatch (eager jnp ops each pay a tunnel round trip)
        _, g = _analytic_grad_jit(
            jnp.asarray([kind]), jnp.asarray(half, jnp.float32)[None],
            jnp.asarray([penal], jnp.float32),
            jnp.asarray(pts_obj, jnp.float32)[None])
        n = np.asarray(g[0])
    else:
        eps = float(sdf.delta)
        n = np.stack(
            [(sdf.get_distance(pts_obj + d) - sdf.get_distance(pts_obj - d))
             for d in (np.array([eps, 0, 0]), np.array([0, eps, 0]),
                       np.array([0, 0, eps]))], axis=-1) / (2 * eps)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def _grasp_antipodal(hand_pose, pts_w, normals_w, finger_opening,
                     mu: float = 0.8) -> bool:
    """Force-closure precondition of the parallel pinch: among the points
    inside the closing volume there must be contact candidates on BOTH pad
    sides whose outward normals lie within the friction cone of the pad
    travel axis (hand-frame ±y).  This is the quasi-static content of the
    harness's lift reward (``bullet/panda_scene.py:486-504``) — a straddle
    whose surfaces are near-parallel to the pads slips out under load."""
    r, t = np.asarray(hand_pose[:3, :3]), np.asarray(hand_pose[:3, 3])
    local = (np.asarray(pts_w) - t) @ r
    n_local = np.asarray(normals_w) @ r
    near = (np.abs(local[:, 1]) < finger_opening) \
        & (np.abs(local[:, 0]) < 0.05) & (np.abs(local[:, 2] - 0.103) < 0.05)
    if not near.any():
        return False
    cos_cone = 1.0 / np.sqrt(1.0 + mu * mu)   # cos(atan(mu))
    ny = n_local[near, 1]
    return bool((ny > cos_cone).any() and (ny < -cos_cone).any())


def validate_execution(scene, traj: np.ndarray,
                       max_joint_step: float = 0.02,
                       lift_height: float = 0.2,
                       lift_samples: int = 20) -> ExecutionReport:
    """Grade ``traj`` on ``scene`` (a PlanningScene) — see module doc.

    ``max_joint_step`` 0.02 rad => < ~2 cm of collision-point motion per
    sample, well under the 7.5 mm SDF cells' hinge band.
    """
    model = scene.model
    env = scene.env
    params = env.cost_params()
    scene_sdf = env.scene_sdf()
    from ..ops.sdf import AnalyticScene
    if isinstance(scene_sdf, AnalyticScene):
        # grade against the SHARP true field: the planner's edge rounding
        # (ops/sdf.py::_analytic_sdf_points) must not hide corner contacts
        # from the validator
        scene_sdf = scene_sdf._replace(
            rounds=jnp.zeros_like(scene_sdf.rounds))

    fine = _resample(np.asarray(traj), max_joint_step)
    swept = int(np.asarray(_exact_hits(
        model, scene_sdf, params, jnp.asarray(fine, jnp.float32),
        skip_fingers=True)))

    # grasp geometry at the final configuration
    target = env.target
    q_end = jnp.asarray(traj[-1], jnp.float32)
    grasp_ok = True
    antipodal_ok = True
    if target is not None and target.points is not None:
        pts_obj = np.asarray(target.points)
        pts_w = (pts_obj @ target.pose_mat[:3, :3].T
                 + target.pose_mat[:3, 3])
        opening = float(np.asarray(traj[-1][-2:]).sum()) or 0.08
        hand = np.asarray(model_api.tip_pose(model, q_end))
        grasp_ok = bool(np.asarray(_grasp_geometry(
            jnp.asarray(hand, jnp.float32),
            jnp.asarray(pts_w, jnp.float32),
            jnp.asarray(opening, jnp.float32))))
        if grasp_ok:
            normals_w = _target_surface_normals_obj(
                target, pts_obj) @ target.pose_mat[:3, :3].T
            antipodal_ok = _grasp_antipodal(hand, pts_w, normals_w, opening)

    # lift sweep: track the hand up by lift_height with the target's own
    # collision disabled (it rides the hand)
    lift_hits = 0
    if target is not None:
        disables = np.asarray(params.disables).copy()
        tgt_idx = int(np.asarray(params.target_idx))
        disables[tgt_idx] = 1.0
        params_lift = params._replace(disables=jnp.asarray(disables))
        from ..ops.ik import ik_single

        cfg = scene.cfg.replace(ik_max_iters=12)
        lo7 = model.joint_lower[:7]
        hi7 = model.joint_upper[:7]
        hand0 = np.asarray(model_api.tip_pose(model, q_end))
        q = np.asarray(q_end)
        qs = []
        for i in range(1, lift_samples + 1):
            target_pose = hand0.copy()
            target_pose[2, 3] += lift_height * i / lift_samples
            res = _ik_one(model, jnp.asarray(target_pose, jnp.float32),
                          jnp.asarray(q[:7], jnp.float32),
                          cfg.jit_key(), lo7, hi7)
            q = np.concatenate([np.asarray(res.q), q[7:]])
            qs.append(q)
        lift_hits = int(np.asarray(_exact_hits(
            model, scene_sdf, params_lift,
            jnp.asarray(np.stack(qs), jnp.float32), skip_fingers=True)))

    valid = (swept == 0) and grasp_ok and antipodal_ok and (lift_hits == 0)
    return ExecutionReport(swept, grasp_ok, antipodal_ok, lift_hits, valid)
