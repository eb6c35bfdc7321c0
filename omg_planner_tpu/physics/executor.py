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
* Finger position control is emulated with a dynamic in-scan joint: the
  close phase commands the finger joints to 0 (exactly the reference,
  ``panda_scene.py:427-428``) and the realized joint value advances at
  the motor rate until pad penetration stalls it — so the grip closes on
  the object WHERE IT IS (the object drifts a few mm during playback;
  precomputed stops left one pad hovering short — measured on suite
  scene 0).  The stalled motor keeps pressing via the solver's pinned
  per-pad stall impulses, PyBullet's ``maxForce`` stall observable.
* The arm replays the plan kinematically (perfect tracking).  The
  reference's position controller also tracks waypoints closely; plan
  feasibility w.r.t. arm dynamics is out of scope for both.
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import api as model_api
from ..utils.pose import mat_to_quat
from . import rigid


def ensure_cpu_backend() -> None:
    """Make the CPU backend available ALONGSIDE the ambient platform.

    The rollout is a ~1700-substep sequential ``lax.scan`` — latency-
    bound, measured ~6x faster on host CPU (0.4 s) than over the remote-
    TPU tunnel (2.5 s warm, DESIGN §7 item 12).  The ambient env pins
    ``JAX_PLATFORMS=axon`` (TPU only); extending it to ``axon,cpu``
    keeps the TPU the default device for planning while letting the
    physics jits place on CPU.  Must run BEFORE the first jax op; a
    no-op when CPU is already listed or no platform is pinned."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats or "cpu" in plats.split(","):
        return
    os.environ["JAX_PLATFORMS"] = plats + ",cpu"
    try:
        jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass  # backends already initialized: library fallback handles it


def _phys_ctx():
    """Device context for the physics jits: host CPU when a CPU backend
    is initialized (the measured-faster default — ADVICE r4 #1), the
    ambient device otherwise.  ``OMG_PHYS_DEVICE=ambient`` opts back
    into the ambient platform (the TPU A/B knob)."""
    if os.environ.get("OMG_PHYS_DEVICE", "cpu").lower() != "cpu":
        return contextlib.nullcontext()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def _on_phys_device(fn):
    """Run an execution entry point under :func:`_phys_ctx`."""
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with _phys_ctx():
            return fn(*a, **k)
    return wrapped


def _body_spec_for(target, density: float, cfg=None) -> rigid.RigidBodySpec:
    """Dynamic-body spec for a scene object: analytic primitives use the
    closed-form SDF; mesh-pipeline objects (data-backed grids) use the
    baked 4-channel grid with voxel-integrated mass properties."""
    ana = getattr(target.sdf, "analytic", None)
    if ana is not None:
        return rigid.body_spec_from_primitive(
            int(ana[0]), np.asarray(ana[1]), density=density)
    if target.points is None:
        raise rigid.NoMassModelError(
            "data-backed target needs surface points for "
            "world contact candidates")
    penal = float(getattr(cfg, "penalize_constant", 5.0) or 5.0)
    return rigid.body_spec_from_grid(
        target.sdf, np.asarray(target.points), density=density,
        inside_penalty=penal)


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
    finger_stop_m: float        # realized finger joint at rollout end
    #                             (where the motor actually stalled)
    lift_height_m: float        # commanded retract (clearance-capped)

    def to_dict(self) -> dict:
        return {k: (int(v) if k == "reward" else float(v))
                for k, v in self._asdict().items()}


def _static_world(env, pad_to: int = 0, cfg=None) -> rigid.StaticWorld:
    """Kinematic scene colliders: analytic primitives directly, and
    DATA-BACKED obstacles (mesh-pipeline grids) as baked 4-channel SDF
    colliders.  ``pad_to`` pads the primitive count with inactive
    dummies so every scene in a suite shares one rollout program shape
    (grid colliders key the compile on their own shapes — rare outside
    mesh scenes)."""
    kinds, halfs, rounds, invs, mask = [], [], [], [], []
    g4s, glims, ginvs = [], [], []
    penal = float(getattr(cfg, "penalize_constant", 5.0) or 5.0)
    for i, o in enumerate(env.objects):
        if i == env.target_idx:
            continue
        ana = getattr(o.sdf, "analytic", None)
        if ana is None:                    # mesh obstacle: baked grid
            _, grid4, lim = rigid.bake_grid_sdf(o.sdf, penal)
            g4s.append(grid4)
            glims.append(lim)
            ginvs.append(np.linalg.inv(o.pose_mat).astype(np.float32))
            continue
        kind, half, _ = ana
        kinds.append(int(kind))
        halfs.append(np.asarray(half, np.float32))
        rounds.append(float(o.sdf.delta))
        invs.append(np.linalg.inv(o.pose_mat).astype(np.float32))
        mask.append(1.0)
    while len(kinds) < max(pad_to, 1):     # >=1 keeps shapes valid
        kinds.append(0)
        halfs.append(np.ones(3, np.float32))
        rounds.append(0.0)
        invs.append(np.eye(4, dtype=np.float32))
        mask.append(0.0)
    grid4 = grid_limits = grid_inv = None
    if g4s:
        n = max(len(g) for g in g4s)       # pad flat volumes to one shape
        g4s = [np.pad(g, ((0, n - len(g)), (0, 0))) for g in g4s]
        grid4 = jnp.asarray(np.stack(g4s), jnp.float32)
        grid_limits = jnp.asarray(np.stack(glims), jnp.float32)
        grid_inv = jnp.asarray(np.stack(ginvs), jnp.float32)
    return rigid.StaticWorld(
        kinds=jnp.asarray(kinds, jnp.int32),
        halfs=jnp.asarray(np.stack(halfs), jnp.float32),
        rounds=jnp.asarray(rounds, jnp.float32),
        inv_poses=jnp.asarray(np.stack(invs), jnp.float32),
        mask=jnp.asarray(mask, jnp.float32),
        grid4=grid4, grid_limits=grid_limits, grid_inv_poses=grid_inv)


def _pad_axes(model, q9: np.ndarray, eps: float = 5e-3) -> np.ndarray:
    """Each finger's prismatic axis in its own link frame, computed
    NUMERICALLY from the model's FK (finite-difference the pad origin
    along the finger joint) — model-agnostic, no URDF axis plumbing.
    A prismatic joint translates the link frame without rotating it, so
    the pad pose at any joint offset is the tracked pose composed with
    ``axis * dv`` (``rigid._pad_pose``)."""
    q9 = np.asarray(q9, np.float64)
    qs = np.stack([q9, q9, q9])
    qs[1, -2] += eps
    qs[2, -1] += eps
    poses = np.asarray(model_api.fk_batch(
        model, jnp.asarray(qs, jnp.float32)))       # [3, L, 4, 4]
    axes = np.zeros((2, 3), np.float32)
    for f in range(2):
        p0 = poses[0, -2 + f]
        p1 = poses[1 + f, -2 + f]
        a = p0[:3, :3].T @ (p1[:3, 3] - p0[:3, 3]) / eps
        axes[f] = a / max(np.linalg.norm(a), 1e-9)
    return axes


def _lift_clearance(world: rigid.StaticWorld, surf_w: np.ndarray,
                    lift_height: float, margin: float = 0.012,
                    n_heights: int = 31) -> float:
    """Largest +z travel (<= ``lift_height``) for which the object's
    surface samples stay ``margin`` clear of every static collider.

    The reference's retract is tabletop-only (``panda_scene.py:424-448``
    — 10 x 0.03 m straight up with nothing overhead); this suite has
    shelf scenes where a full 0.3 m retract rams the held object into
    the board above and rips it from a perfectly good grasp.  The
    evaluator's job is to score the GRASP, so the retract height adapts
    to the scene's headroom (floor 0.08 m keeps the 0.05 m reward
    threshold meaningful — a grasp that can't survive even 8 cm of lift
    fails honestly)."""
    hs = np.linspace(0.0, lift_height, n_heights)
    pts = surf_w[None] + np.array([0.0, 0.0, 1.0]) * hs[:, None, None]
    phi = np.asarray(_clearance_phi(world, jnp.asarray(pts, jnp.float32)))
    # only geometry the sample APPROACHES while rising can block the
    # lift: the support surface under the object (SDF ~0 at rest, grows
    # with height) and resting side-contacts with neighbors (SDF ~0,
    # constant) must not count, or every tabletop scene reads "blocked
    # at the first height step"
    approaching = phi < phi[:, :1] - 1e-4
    blocked_h = ((phi < margin) & approaching).any(axis=(0, 2))  # [H]
    idx = np.nonzero(blocked_h)[0]
    h_ok = lift_height if len(idx) == 0 else float(hs[idx[0]]) - margin
    return float(np.clip(h_ok, 0.08, lift_height))


@jax.jit
def _clearance_phi(world: rigid.StaticWorld, pts: jnp.ndarray) -> jnp.ndarray:
    """World-SDF values of the lift sweep points, one jitted dispatch
    (CLAUDE.md rule: everything device-side inside jit — the eager sweep
    paid a per-op round trip on the remote-TPU tunnel).
    ``pts [H, S, 3]`` -> ``phi [O, H, S]`` (inactive colliders inf)."""
    from ..ops.sdf import _analytic_sdf_grad

    po = jnp.einsum("oab,hsb->ohsa", world.inv_poses[:, :3, :3], pts) \
        + world.inv_poses[:, None, None, :3, 3]
    phi, _ = _analytic_sdf_grad(
        world.kinds, world.halfs, jnp.ones_like(world.rounds),
        po.reshape(world.kinds.shape[0], -1, 3), rounds=world.rounds)
    phi = phi.reshape(world.kinds.shape[0], pts.shape[0], -1)
    phi = jnp.where(world.mask[:, None, None] > 0.5, phi, jnp.inf)
    if world.grid4 is not None and world.grid4.shape[0]:
        from ..ops.sdf import _query_one_object_baked

        pg = jnp.einsum("oab,hsb->ohsa", world.grid_inv_poses[:, :3, :3],
                        pts) + world.grid_inv_poses[:, None, None, :3, 3]
        ng = world.grid4.shape[0]
        phi_g, _ = jax.vmap(_query_one_object_baked)(
            world.grid4, world.grid_limits, pg.reshape(ng, -1, 3))
        # grid OOB reads 1.0 (clear) — consistent with "no blocker"
        phi = jnp.concatenate(
            [phi, phi_g.reshape(ng, pts.shape[0], -1)], axis=0)
    return phi


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


def _playback_segs(traj: np.ndarray, sub_plan: int,
                   settle: int) -> list[np.ndarray]:
    """Settle + waypoint-interpolated playback segments (shared by the
    pick and place track builders — one interpolation convention)."""
    segs = [np.repeat(traj[0][None], settle, 0)]
    for a, b in zip(traj[:-1], traj[1:]):
        t = np.linspace(0.0, 1.0, sub_plan, endpoint=False)[:, None]
        segs.append(a[None] + (b - a)[None] * t)
    return segs


def _config_track(traj: np.ndarray, lift_qs: np.ndarray, jv_ref: np.ndarray,
                  sub_plan: int, sub_close: int, sub_lift: int,
                  settle: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Substep-resolution tracks: settle / playback / close / lift.

    Returns ``(configs [T, D], jv_cmd [T, 2], playback_end)``.
    ``configs`` drives the FK for the sphere + pad-frame tracks with the
    FINGER JOINTS FROZEN at ``jv_ref`` — the realized finger value is
    dynamic state inside the rollout scan, and the pad pose at joint
    value jv is the tracked frame translated by ``axis * (jv - jv_ref)``
    (``rigid._pad_pose``).  ``jv_cmd`` is the position-control COMMAND:
    the plan's own finger values through playback, then 0 from the close
    phase on (the reference commands 0 and lets the motor stall,
    ``panda_scene.py:427-428``); the motor-rate/stall dynamics produce
    the close, the squeeze, and the re-centering on a drifted object."""
    segs = _playback_segs(traj, sub_plan, settle)
    segs.append(traj[-1][None])
    playback_end = sum(len(s) for s in segs)
    segs.append(np.repeat(traj[-1][None], sub_close, 0))  # arm holds
    for prev, ql in zip([traj[-1]] + list(lift_qs[:-1]), lift_qs):
        t = np.linspace(0.0, 1.0, sub_lift, endpoint=False)[:, None]
        segs.append(prev[None] + (ql - prev)[None] * t)
    segs.append(lift_qs[-1][None])
    configs = np.concatenate(segs).astype(np.float32)
    # clip to the Panda finger joint range [0, 0.04] like jv_ref: an
    # out-of-range plan column must not command an opening past the limit
    # (it would skew the motor-rate close timing vs the reference's
    # position controller) — ADVICE r4 #4
    jv_cmd = np.clip(configs[:, -2:], 0.0, 0.04).astype(np.float32)
    jv_cmd[playback_end:] = 0.0
    configs[:, -2:] = np.asarray(jv_ref, np.float32)[None]
    return configs, jv_cmd, playback_end


@_on_phys_device
def execute_plan(scene, traj: np.ndarray,
                 params: rigid.PhysParams | None = None,
                 lift_height: float = 0.3,
                 density: float = 300.0,
                 sub_plan: int = 6, sub_close: int = 90,
                 sub_lift: int = 12, lift_stages: int = 10,
                 settle: int = 30, pad_statics: int = 0,
                 iters: int = 96,
                 return_trace: bool = False):
    """Execute ``traj`` on ``scene`` (a PlanningScene) in the native
    stepper and score the reference's lift reward.  See module doc for
    the harness correspondence.

    ``iters=96``: the pinch patch has ~50 ALIGNED contacts, and the
    alignment-split Jacobi solve needs ~that many iterations for the
    tangential (grip-friction) modes — at 48 a held object creeps down
    the pads ~0.06 m/s and falls out mid-lift (suite scene 13, measured);
    96 converges (96 == 192 bit-for-bit on the reward metrics)."""
    env = scene.env
    model = _phys_model()          # dense contact spheres (same kinematics)
    target = env.target
    spec = _body_spec_for(target, density, scene.cfg)
    world = _static_world(env, pad_to=pad_statics, cfg=scene.cfg)
    pp = params if params is not None else rigid.default_params()

    traj = np.asarray(traj, np.float64)
    jv_ref = np.clip(traj[0, -2:], 0.0, 0.04).astype(np.float32)
    r0 = np.asarray(target.pose_mat[:3, :3], np.float32)
    # state is the COM pose (spec.com = COM in the object's own frame)
    x0_np = (np.asarray(target.pose_mat[:3, 3])
             + r0 @ np.asarray(spec.com)).astype(np.float32)
    surf_w = x0_np + np.asarray(spec.surf) @ r0.T
    lift_h = _lift_clearance(world, surf_w, lift_height)
    lift_qs = _lift_configs(scene, traj[-1], lift_h, lift_stages)
    configs, jv_cmd, playback_end = _config_track(
        traj, lift_qs, jv_ref, sub_plan, sub_close, sub_lift, settle)
    configs_j = jnp.asarray(configs)

    x0 = jnp.asarray(x0_np)
    q0 = mat_to_quat(jnp.asarray(target.pose_mat[:3, :3], jnp.float32))
    state0 = rigid.BodyState(x=x0, q=q0,
                             v=jnp.zeros(3, jnp.float32),
                             w=jnp.zeros(3, jnp.float32))
    pad_center, pad_samples = _pad_geometry(model)
    pad_axis = _pad_axes(model, traj[-1])
    final, trace = _rollout_with_fk(
        model, spec, world, pp, configs_j, state0, pad_center, pad_samples,
        jnp.asarray(pad_axis), jnp.asarray(jv_cmd),
        jnp.asarray(jv_ref), iters=iters)
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
        finger_stop_m=float(np.asarray(trace["jv"])[-1].mean()),
        lift_height_m=float(lift_h))
    if return_trace:
        out = {k: np.asarray(v) for k, v in trace.items()}
        out.update(playback_end=playback_end, configs=configs)
        return report, out
    return report


class PlaceExecReport(NamedTuple):
    """Scorecard of :func:`execute_place`."""

    reward: int             # placed within tolerance and settled
    place_err_xy_m: float   # final horizontal distance to the commanded pose
    place_err_z_m: float    # final vertical offset (signed, + = above)
    settle_speed: float     # |v| at the end (0 = at rest)
    carried: int            # 1 = the object survived the transport in-grip
    drop_h_m: float         # release-to-rest height (how far it fell)

    def to_dict(self) -> dict:
        ints = ("reward", "carried")
        return {k: (int(v) if k in ints else float(v))
                for k, v in self._asdict().items()}


def _finger_hold_width(model, spec: rigid.RigidBodySpec, q9: np.ndarray,
                       held_pose: np.ndarray, stall_pen: float,
                       n_grid: int = 81) -> float:
    """Finger joint value at which the pads pinch the HELD object to the
    motor's stall depth — the initial condition of a place rollout (the
    pick already established this grip; re-deriving it from the pad
    geometry is exact because the held pose is known, no drift).  0 when
    no width reaches the stall depth: the rollout then starts with the
    fingers closing on air and the object falls — a bad hold fails
    honestly."""
    pad_center, pad_samples = _pad_geometry(model)
    pad_axis = jnp.asarray(_pad_axes(model, q9))
    poses = model_api.fk_batch(model, jnp.asarray(q9[None], jnp.float32))[0]
    pad = poses[-2:]
    shift = jnp.einsum("fab,fb->fa", pad[:, :3, :3], pad_center)
    pad = pad.at[:, :3, 3].add(shift)
    x_com = held_pose[:3, 3] + held_pose[:3, :3] @ np.asarray(spec.com)
    state = rigid.BodyState(
        x=jnp.asarray(x_com, jnp.float32),
        q=mat_to_quat(jnp.asarray(held_pose[:3, :3], jnp.float32)),
        v=jnp.zeros(3, jnp.float32), w=jnp.zeros(3, jnp.float32))
    jv_ref = jnp.asarray(np.clip(q9[-2:], 0.0, 0.04), jnp.float32)
    grid = jnp.linspace(0.0, 0.04, n_grid)
    pens = np.asarray(_hold_width_pens(
        spec, state, pad, pad_axis, pad_samples, jv_ref, grid))
    ok = np.nonzero(pens >= stall_pen)[0]
    return float(grid[ok.max()]) if len(ok) else 0.0


@jax.jit
def _hold_width_pens(spec, state, pad, pad_axis, pad_samples, jv_ref, grid):
    """Min pad-sample penetration for each candidate joint value in
    ``grid`` — module-level jit so repeated place executions hit the
    compile cache (a per-call ``jax.jit`` closure re-traces every
    time)."""
    def pen_at(jv):
        pose = rigid._pad_pose(pad, pad_axis, jnp.stack([jv, jv]) - jv_ref)
        return rigid._pad_probe_pen(spec, state, pose, pad_samples).min()

    return jax.vmap(pen_at)(grid)


@_on_phys_device
def execute_place(scene, traj: np.ndarray, place_pose: np.ndarray,
                  rel_hand_pose: np.ndarray,
                  params: rigid.PhysParams | None = None,
                  density: float = 300.0,
                  sub_plan: int = 24, settle: int = 30,
                  open_steps: int = 90, retract_height: float = 0.1,
                  retract_stages: int = 4, sub_lift: int = 12,
                  pad_statics: int = 0, iters: int = 96,
                  tol_xy: float = 0.05, tol_z: float = 0.05,
                  return_trace: bool = False):
    """Execute a PLACEMENT plan in the native stepper and score it.

    The reference's kitchen/real-world task layer places held objects by
    executing the planned trajectory in PyBullet and releasing
    (``real_world/trial.py:68-185``); this is that harness natively: the
    object starts IN the grip (held pose = hand(traj[0]) @
    ``rel_hand_pose``, the attach transform recorded by
    ``PlanningScene.attach_target``), the motor pinch carries it through
    the playback (gravity on — a weak hold drops it in transit), the
    fingers then open and the arm retracts straight up, and the object
    must come to REST within tolerance of the commanded ``place_pose``.

    Reward = horizontal error < ``tol_xy`` AND vertical error < ``tol_z``
    AND settled (final speed < 5 cm/s).  ``carried`` reports whether the
    object was still at its attach-relative pose at release (within
    5 cm), so a failed transport is distinguishable from a bad drop."""
    env = scene.env
    model = _phys_model()
    target = env.target
    spec = _body_spec_for(target, density, scene.cfg)
    world = _static_world(env, pad_to=pad_statics, cfg=scene.cfg)
    pp = params if params is not None else rigid.default_params()

    traj = np.asarray(traj, np.float64)
    jv_ref = np.clip(traj[0, -2:], 0.0, 0.04).astype(np.float32)
    hand0 = np.asarray(model_api.tip_pose(
        model, jnp.asarray(traj[0], jnp.float32)))
    held0 = hand0 @ np.asarray(rel_hand_pose)
    jv0 = _finger_hold_width(model, spec, traj[0], held0,
                             float(pp.stall_pen))

    retract_qs = _lift_configs(scene, traj[-1], retract_height,
                               retract_stages)
    # settle (grip forms) / place playback / hold / open / retract
    segs = _playback_segs(traj, sub_plan, settle)
    segs.append(np.repeat(traj[-1][None], settle, 0))
    playback_end = sum(len(s) for s in segs)
    segs.append(np.repeat(traj[-1][None], open_steps, 0))
    release_end = playback_end + open_steps
    for prev, ql in zip([traj[-1]] + list(retract_qs[:-1]), retract_qs):
        t = np.linspace(0.0, 1.0, sub_lift, endpoint=False)[:, None]
        segs.append(prev[None] + (ql - prev)[None] * t)
    segs.append(np.repeat(retract_qs[-1][None], settle, 0))
    configs = np.concatenate(segs).astype(np.float32)
    jv_cmd = np.zeros((len(configs), 2), np.float32)
    jv_cmd[playback_end:] = 0.04            # open from the release phase on
    configs[:, -2:] = jv_ref[None]
    jv_cmd[0] = jv0                          # rollout's initial joint value

    com = np.asarray(spec.com)
    x0 = jnp.asarray(held0[:3, 3] + held0[:3, :3] @ com, jnp.float32)
    q0 = mat_to_quat(jnp.asarray(held0[:3, :3], jnp.float32))
    state0 = rigid.BodyState(x=x0, q=q0,
                             v=jnp.zeros(3, jnp.float32),
                             w=jnp.zeros(3, jnp.float32))
    pad_center, pad_samples = _pad_geometry(model)
    pad_axis = _pad_axes(model, traj[0])
    final, trace = _rollout_with_fk(
        model, spec, world, pp, jnp.asarray(configs), state0, pad_center,
        pad_samples, jnp.asarray(pad_axis), jnp.asarray(jv_cmd),
        jnp.asarray(jv_ref), iters=iters)
    final = jax.block_until_ready(final)

    xs = np.asarray(trace["x"])
    pp_mat = np.asarray(place_pose)
    place_p = pp_mat[:3, 3] + pp_mat[:3, :3] @ com   # commanded COM
    # carried = at the end of the playback the object still sits at its
    # attach-relative pose (within 5 cm) — distinguishes a drop in
    # transit from a bad release
    held_rel = (np.asarray(model_api.tip_pose(
        model, jnp.asarray(configs[playback_end - 1], jnp.float32)))
        @ np.asarray(rel_hand_pose))
    hand_rel = held_rel[:3, 3] + held_rel[:3, :3] @ com
    carried = int(np.linalg.norm(xs[playback_end - 1] - hand_rel) < 0.05)
    err = np.asarray(final.x) - place_p
    err_xy = float(np.linalg.norm(err[:2]))
    err_z = float(err[2])
    speed = float(np.linalg.norm(np.asarray(final.v)))
    drop = float(xs[release_end - 1][2] - np.asarray(final.x)[2])
    reward = int(err_xy < tol_xy and abs(err_z) < tol_z and speed < 0.05)
    report = PlaceExecReport(
        reward=reward, place_err_xy_m=err_xy, place_err_z_m=err_z,
        settle_speed=speed, carried=carried, drop_h_m=drop)
    if return_trace:
        out = {k: np.asarray(v) for k, v in trace.items()}
        out.update(playback_end=playback_end, release_end=release_end,
                   configs=configs)
        return report, out
    return report


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
    samples = np.stack(
        [rigid.box_face_grid(half[f], m).astype(np.float32)
         for f in range(2)])
    return (jnp.asarray(center, jnp.float32),
            jnp.asarray(samples, jnp.float32))


@functools.partial(jax.jit, static_argnames=("iters",))
def _rollout_with_fk(model, spec, world, pp, configs, state0,
                     pad_center, pad_samples, pad_axis, jv_cmd, jv_ref,
                     iters: int = 48):
    poses = model_api.fk_batch(model, configs)       # fingers frozen at
    x = model_api.point_positions(model, poses)      # jv_ref; [T, L, P, 3]
    sph = x.reshape(x.shape[0], -1, 3)
    fing = jnp.repeat(jnp.asarray(model_api.finger_link_mask(model)),
                      x.shape[2])
    pad = poses[:, -2:]                              # [T, 2, 4, 4]
    shift = jnp.einsum("tfab,fb->tfa", pad[..., :3, :3], pad_center)
    pad = pad.at[..., :3, 3].add(shift)
    return rigid.rollout(spec, world, pp, state0, sph, fing,
                         pad, pad_samples, pad_axis, jv_cmd, jv_ref,
                         iters=iters)
