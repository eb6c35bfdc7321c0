"""Open-loop plan execution in the native physics stepper.

Mirrors the reference's PyBullet execution harness:

* ``bullet_execute_plan`` (``bullet/panda_scene.py:535-544``): step the
  position-controlled arm through every plan waypoint;
* ``PandaYCBEnv.retract`` (``:424-448``): close the fingers, then lift
  the end effector +0.03 m x 10 via IK;
* ``PandaYCBEnv._reward`` (``:486-504``): reward 1 iff the target ends
  within 0.2 m of the hand and above the table height.

Differences from the PyBullet harness, by design (documented in
docs/DESIGN.md §7):

* Only the TARGET is dynamic; other scene objects are static colliders.
  (The reference's reward depends only on the target's motion; obstacle
  dynamics never enter the score.)
* Finger position control is emulated kinematically: the close phase
  drives the finger joints toward the object's grasp width minus a fixed
  squeeze, and the solver's capped depenetration bias converts the
  remaining overlap into bounded steady pinch force — the observable
  behavior of PyBullet's ``maxForce`` position control without actuator
  DOFs.  (The reference commands fingers to 0 and lets the motor stall,
  ``panda_scene.py:427-428``.)
* The arm replays the plan kinematically (perfect tracking).  The
  reference's position controller also tracks waypoints closely; plan
  feasibility w.r.t. arm dynamics is out of scope for both.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import api as model_api
from ..utils.pose import mat_to_quat
from . import rigid


@functools.lru_cache(maxsize=2)
def _phys_model(n_points: int = 48):
    """Denser collision-point model for contact generation: the planner's
    15 points/link are tuned for cost evaluation; a pinched object can
    drift a few mm along the finger to a gap between 15 sparse spheres
    and silently lose contact.  48/link closes the gaps (measured: the
    drift-escape disappears)."""
    from ..models import panda

    return panda.load_panda(collision_point_num=n_points)


class PhysExecReport(NamedTuple):
    reward: int                 # the harness's binary lift reward
    lifted_m: float             # target height gain over the rollout
    hand_dist_m: float          # final |target - hand|
    moved_in_playback_m: float  # target displacement before the grasp
    grasp_impulse: float        # mean robot-contact normal impulse (lift)
    finger_stop_m: float        # commanded finger stop (grasp width/2 - squeeze)

    def to_dict(self) -> dict:
        return {k: (int(v) if k == "reward" else float(v))
                for k, v in self._asdict().items()}


def _static_world(env) -> rigid.StaticWorld:
    kinds, halfs, rounds, invs, mask = [], [], [], [], []
    for i, o in enumerate(env.objects):
        if i == env.target_idx:
            continue
        ana = getattr(o.sdf, "analytic", None)
        if ana is None:
            continue  # data-backed obstacle: not a physics collider
        kind, half, _ = ana
        kinds.append(int(kind))
        halfs.append(np.asarray(half, np.float32))
        rounds.append(float(o.sdf.delta))
        invs.append(np.linalg.inv(o.pose_mat).astype(np.float32))
        mask.append(1.0)
    if not kinds:  # keep shapes valid: one inactive dummy
        kinds, halfs = [0], [np.ones(3, np.float32)]
        rounds, invs, mask = [0.0], [np.eye(4, dtype=np.float32)], [0.0]
    return rigid.StaticWorld(
        kinds=jnp.asarray(kinds, jnp.int32),
        halfs=jnp.asarray(np.stack(halfs), jnp.float32),
        rounds=jnp.asarray(rounds, jnp.float32),
        inv_poses=jnp.asarray(np.stack(invs), jnp.float32),
        mask=jnp.asarray(mask, jnp.float32))


@jax.jit
def _finger_phi_grid(model, q_end9: jnp.ndarray, grid: jnp.ndarray,
                     kind: jnp.ndarray, half: jnp.ndarray,
                     inv_pose: jnp.ndarray) -> jnp.ndarray:
    """min target-SDF value over each finger link's collision points, for
    every candidate finger-joint value in ``grid [G]`` -> [G, 2]."""
    from ..ops.sdf import _analytic_sdf_grad

    qs = jnp.broadcast_to(q_end9[None], (grid.shape[0],) + q_end9.shape)
    qs = qs.at[:, -2:].set(grid[:, None])
    poses = model_api.fk_batch(model, qs)
    x = model_api.point_positions(model, poses)[:, -2:]   # [G, 2, P, 3]
    rel = jnp.einsum("ab,gfpb->gfpa", inv_pose[:3, :3], x) + inv_pose[:3, 3]
    phi, _ = _analytic_sdf_grad(
        kind[None], half[None], jnp.ones((1,), jnp.float32),
        rel.reshape(1, -1, 3))
    return phi.reshape(x.shape[:3]).min(-1)               # [G, 2]


def _finger_stops(model, q_end: np.ndarray, target,
                  squeeze: float, n_grid: int = 41) -> np.ndarray:
    """Per-finger joint stop: sweep the finger joint from open to 0 and
    find, from the finger links' ACTUAL collision geometry via FK, the
    largest joint value at which the finger penetrates the target by
    ``squeeze`` — where PyBullet's stalled position controller would hold
    it (``panda_scene.py:427-428`` commands 0 and lets the motor stall).
    0 (full close) when the finger never reaches the object: the grasp
    then honestly closes on air and the lift fails."""
    ana = target.sdf.analytic
    grid = np.linspace(0.0, 0.04, n_grid, dtype=np.float32)
    phi = np.asarray(_finger_phi_grid(
        model, jnp.asarray(q_end, jnp.float32), jnp.asarray(grid),
        jnp.asarray(ana[0], jnp.int32),
        jnp.asarray(np.asarray(ana[1]), jnp.float32),
        jnp.asarray(np.linalg.inv(target.pose_mat), jnp.float32)))  # [G, 2]
    stops = np.zeros(2, np.float32)
    start = np.clip(np.asarray(q_end[-2:], np.float64), 0.0, 0.04)
    for f in range(2):
        pen = -phi[:, f] - squeeze          # >= 0 where squeezed enough
        hit = np.nonzero(pen >= 0.0)[0]
        if len(hit) == 0:
            stops[f] = 0.0                  # closes on air
        else:
            i = int(hit.max())              # largest joint value touching
            if i + 1 < len(grid) and pen[i + 1] < 0.0:
                # linear refine between grid[i] (touching) and grid[i+1]
                t = pen[i] / max(pen[i] - pen[i + 1], 1e-9)
                stops[f] = grid[i] + t * (grid[i + 1] - grid[i])
            else:
                stops[f] = grid[i]
        stops[f] = min(stops[f], start[f])
    return stops


def _lift_configs(scene, q_end: np.ndarray, lift_height: float,
                  stages: int) -> np.ndarray:
    """IK waypoints for the +z retract (``retract``'s 10 x 0.03 m IK
    steps), via the framework's damped-least-squares IK."""
    from ..planner.validate import _ik_one

    model = scene.model
    cfg = scene.cfg.replace(ik_max_iters=12)
    lo7, hi7 = model.joint_lower[:7], model.joint_upper[:7]
    hand0 = np.asarray(model_api.tip_pose(
        model, jnp.asarray(q_end, jnp.float32)))
    q = np.asarray(q_end, np.float64).copy()
    out = []
    for i in range(1, stages + 1):
        target_pose = hand0.copy()
        target_pose[2, 3] += lift_height * i / stages
        res = _ik_one(model, jnp.asarray(target_pose, jnp.float32),
                      jnp.asarray(q[:7], jnp.float32),
                      cfg.jit_key(), lo7, hi7)
        q = np.concatenate([np.asarray(res.q), q[7:]])
        out.append(q.copy())
    return np.stack(out)


def _config_track(traj: np.ndarray, finger_stops: np.ndarray,
                  lift_qs: np.ndarray, sub_plan: int, sub_close: int,
                  sub_lift: int, settle: int) -> tuple[np.ndarray, int]:
    """Substep-resolution joint track: settle / playback / close / lift.
    Returns (configs [T, D], index where the playback phase ends)."""
    segs = [np.repeat(traj[0][None], settle, 0)]
    for a, b in zip(traj[:-1], traj[1:]):
        t = np.linspace(0.0, 1.0, sub_plan, endpoint=False)[:, None]
        segs.append(a[None] + (b - a)[None] * t)
    segs.append(traj[-1][None])
    playback_end = sum(len(s) for s in segs)
    q_close = traj[-1].copy()
    q_close[-2:] = finger_stops
    t = np.linspace(0.0, 1.0, sub_close)[:, None]
    segs.append(traj[-1][None] + (q_close - traj[-1])[None] * t)
    # during the lift the fingers CREEP closed (2 mm over the whole
    # retract): PyBullet's position controller keeps commanding 0 and the
    # stalled motor keeps pressing (panda_scene.py:427-428) — a sustained
    # approach velocity is what converts to sustained pinch force in the
    # velocity-level solver
    creep = 0.002
    n_lift = len(lift_qs)
    prev = q_close
    for j, ql in enumerate(lift_qs):
        ql = ql.copy()
        ql[-2:] = np.maximum(finger_stops - creep * (j + 1) / n_lift, 0.0)
        t = np.linspace(0.0, 1.0, sub_lift, endpoint=False)[:, None]
        segs.append(prev[None] + (ql - prev)[None] * t)
        prev = ql
    segs.append(prev[None])
    return np.concatenate(segs).astype(np.float32), playback_end


def execute_plan(scene, traj: np.ndarray,
                 params: rigid.PhysParams | None = None,
                 lift_height: float = 0.3,
                 squeeze: float = 0.002,
                 density: float = 300.0,
                 sub_plan: int = 6, sub_close: int = 60,
                 sub_lift: int = 12, lift_stages: int = 10,
                 settle: int = 30,
                 return_trace: bool = False):
    """Execute ``traj`` on ``scene`` (a PlanningScene) in the native
    stepper and score the reference's lift reward.  See module doc for
    the harness correspondence."""
    env = scene.env
    model = _phys_model()          # dense contact spheres (same kinematics)
    target = env.target
    ana = getattr(target.sdf, "analytic", None)
    if ana is None:
        raise ValueError("physics execution needs an analytic target "
                         "primitive (data-backed SDFs carry no mass model)")
    spec = rigid.body_spec_from_primitive(
        int(ana[0]), np.asarray(ana[1]), np.asarray(target.points),
        density=density)
    world = _static_world(env)
    pp = params if params is not None else rigid.default_params()

    traj = np.asarray(traj, np.float64)
    f_stops = _finger_stops(model, traj[-1], target, squeeze)
    lift_qs = _lift_configs(scene, traj[-1], lift_height, lift_stages)
    configs, playback_end = _config_track(
        traj, f_stops, lift_qs, sub_plan, sub_close, sub_lift, settle)
    configs_j = jnp.asarray(configs)

    x0 = jnp.asarray(target.pose_mat[:3, 3], jnp.float32)
    q0 = mat_to_quat(jnp.asarray(target.pose_mat[:3, :3], jnp.float32))
    state0 = rigid.BodyState(x=x0, q=q0,
                             v=jnp.zeros(3, jnp.float32),
                             w=jnp.zeros(3, jnp.float32))
    pad_center, pad_samples = _pad_geometry(model)
    final, trace = _rollout_with_fk(model, spec, world, pp, configs_j,
                                    state0, pad_center, pad_samples)
    final = jax.block_until_ready(final)

    xs = np.asarray(trace["x"])
    imps = np.asarray(trace["robot_impulse"])
    hand_end = np.asarray(model_api.tip_pose(
        model, jnp.asarray(configs[-1], jnp.float32)))[:3, 3]
    obj_end = np.asarray(final.x)
    lifted = float(obj_end[2] - float(x0[2]))
    hand_dist = float(np.linalg.norm(obj_end - hand_end))
    moved = float(np.linalg.norm(xs[playback_end - 1] - np.asarray(x0)))
    # the reference's reward: near the hand AND above the table
    # (panda_scene.py:486-504); "above the table" here = meaningfully
    # higher than where it started resting
    reward = int((hand_dist < 0.2) and (lifted > 0.05))
    report = PhysExecReport(
        reward=reward, lifted_m=lifted, hand_dist_m=hand_dist,
        moved_in_playback_m=moved,
        grasp_impulse=float(imps[playback_end:].mean()),
        finger_stop_m=float(f_stops.mean()))
    if return_trace:
        out = {k: np.asarray(v) for k, v in trace.items()}
        out.update(playback_end=playback_end, configs=configs)
        return report, out
    return report


def _box_surface_grid(half: np.ndarray, m: int = 4) -> np.ndarray:
    """``m x m`` sample grid on each face of the box [-half, half]
    (6 m^2 points, centered frame)."""
    pts = []
    for ax in range(3):
        u, v = [i for i in range(3) if i != ax]
        gu, gv = np.meshgrid(np.linspace(-half[u], half[u], m),
                             np.linspace(-half[v], half[v], m),
                             indexing="ij")
        for s in (-1.0, 1.0):
            p = np.zeros((m, m, 3), np.float32)
            p[..., ax] = s * half[ax]
            p[..., u] = gu
            p[..., v] = gv
            pts.append(p.reshape(-1, 3))
    return np.concatenate(pts)


def _pad_geometry(model, m: int = 4):
    """Finger-pad contact surfaces from the finger links' own point
    clouds: an axis-aligned bounding box per pad in its link frame (the
    pads ARE the finger geometry the planner's cost used), sampled with
    a fixed surface grid — the contact resolution lives on the PAD, so
    the pinch is densely resolved independent of object size (see
    ``rigid._pad_contacts``).  Returns (center [2,3], samples [2,Sp,3]
    relative to center)."""
    pts = np.asarray(model.collision_points)[-2:]      # [2, P, 3]
    mins, maxs = pts.min(1), pts.max(1)
    center = (mins + maxs) / 2.0
    half = (maxs - mins) / 2.0 + 1e-3
    samples = np.stack([_box_surface_grid(half[f], m) for f in range(2)])
    return (jnp.asarray(center, jnp.float32),
            jnp.asarray(samples, jnp.float32))


@jax.jit
def _rollout_with_fk(model, spec, world, pp, configs, state0,
                     pad_center, pad_samples):
    poses = model_api.fk_batch(model, configs)
    x = model_api.point_positions(model, poses)      # [T, L, P, 3]
    sph = x.reshape(x.shape[0], -1, 3)
    fing = jnp.repeat(jnp.asarray(model_api.finger_link_mask(model)),
                      x.shape[2])
    pad = poses[:, -2:]                              # [T, 2, 4, 4]
    shift = jnp.einsum("tfab,fb->tfa", pad[..., :3, :3], pad_center)
    pad = pad.at[..., :3, 3].add(shift)
    return rigid.rollout(spec, world, pp, state0, sph, fing,
                         pad, pad_samples)
