"""Goal-set construction: grasp augmentation, batched IK, pruning, sampling.

Re-implements the reference pipeline (``omg/planner.py:226-597``) as
fixed-capacity masked array programs:

  grasp DB (object frame) -> world poses -> [z/y upsampling] ->
  vmapped standoff-chain IK over (grasps x seeds) ->
  C-space wrist-flip augmentation -> task-space rotation/downward filters ->
  batched collision pruning -> greedy diversity dedupe -> random sample.

The reference solves IK serially across a 4-process pool and manipulates
ragged python lists; every stage here is a masked static-shape device
computation, so goal-set construction for a scene is one jitted call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OMGConfig
from ..models import panda
from ..ops import ik as ik_ops
from ..ops.chomp import CostParams, GoalSet
from ..ops.sdf import SceneSDF, sdf_potentials
from ..utils.linalg import take_rows
from ..utils.pose import rot_y, rot_z
from ..utils.spline import multi_linear_interpolate

# 13 anchor seed configurations for IK (data table from the reference,
# ``omg/util.py:19-35``; first row is replaced by the trajectory start).
ANCHOR_SEEDS = np.array(
    [
        [2.5, 0.23, -2.89, -1.69, 0.056, 1.46, -1.27, 0.04, 0.04],
        [2.8, 0.23, -2.89, -1.69, 0.056, 1.46, -1.27, 0.04, 0.04],
        [2.0, 0.23, -2.89, -1.69, 0.056, 1.46, -1.27, 0.04, 0.04],
        [2.5, 0.83, -2.89, -1.69, 0.056, 1.46, -1.27, 0.04, 0.04],
        [0.049, 1.22, -1.87, -0.67, 2.12, 0.99, -0.85, 0.04, 0.04],
        [-2.28, -0.43, 2.47, -1.35, 0.62, 2.28, -0.27, 0.04, 0.04],
        [-2.02, -1.29, 2.20, -0.83, 0.22, 1.18, 0.74, 0.04, 0.04],
        [-2.2, 0.03, -2.89, -1.69, 0.056, 1.46, -1.27, 0.04, 0.04],
        [-2.5, -0.71, -2.73, -0.82, -0.7, 0.62, -0.56, 0.04, 0.04],
        [-2.0, -0.71, -2.73, -0.82, -0.7, 0.62, -0.56, 0.04, 0.04],
        [-2.66, -0.55, 2.06, -1.77, 0.96, 1.77, -1.35, 0.04, 0.04],
        [1.51, -1.48, -1.12, -1.55, -1.57, 1.15, 0.24, 0.04, 0.04],
        [-2.61, -0.98, 2.26, -0.85, 0.61, 1.64, 0.23, 0.04, 0.04],
    ]
)


def z_upsample_poses(poses: jnp.ndarray, object_pos: jnp.ndarray,
                     bins: int = 50) -> jnp.ndarray:
    """Upsample grasps by global-z rotation about the object origin
    (placement support, ``omg/planner.py:324-334``). [N,4,4] -> [N*bins,4,4]."""
    angs = jnp.linspace(-jnp.pi, jnp.pi, bins)
    rz = jax.vmap(rot_z)(angs)  # [bins, 4, 4]
    centered = poses.at[:, :3, 3].add(-object_pos)
    out = jnp.einsum("bac,ncd->nbad", rz, centered)
    out = out.at[:, :, :3, 3].add(object_pos)
    return out.reshape(-1, 4, 4)


def y_upsample_poses(poses: jnp.ndarray, bins: int = 10) -> jnp.ndarray:
    """Upsample by local-y tilts about the antipodal finger contact
    (``omg/planner.py:336-347``)."""
    angs = jnp.linspace(-jnp.pi / 4, jnp.pi / 4, bins)
    ry = jax.vmap(rot_y)(angs)[:, :3, :3]  # [B, 3, 3]
    finger = jnp.asarray([0.0, 0.0, 0.13])
    contact = jnp.einsum("nab,b->na", poses[:, :3, :3], finger) + poses[:, :3, 3]
    local_rot = jnp.einsum("nab,Bbc->nBac", poses[:, :3, :3], ry)
    delta = jnp.einsum("nBab,b->nBa", local_rot, finger)
    out = jnp.tile(poses[:, None], (1, bins, 1, 1))
    out = out.at[:, :, :3, :3].set(local_rot)
    out = out.at[:, :, :3, 3].set(contact[:, None] - delta)
    return out.reshape(-1, 4, 4)


def flip_wrist(configs: jnp.ndarray, cfg: OMGConfig):
    """C-space wrist +/- pi augmentation (``omg/planner.py:226-237``).

    configs [..., 9]; returns (flipped configs, within-limits mask)."""
    wrist = configs[..., 6]
    flipped = jnp.where(wrist < 0, wrist + jnp.pi, wrist - jnp.pi)
    out = configs.at[..., 6].set(flipped)
    lim = 2.8973 - cfg.soft_joint_limit_padding
    ok = (flipped < lim) & (flipped > -lim)
    return out, ok


def task_space_filter(
    model: panda.PandaModel,
    cfg: OMGConfig,
    start: jnp.ndarray,          # [9]
    reach_grasps: jnp.ndarray,   # [C, tail, 9]
    valid: jnp.ndarray,          # [C]
):
    """Remove grasps needing heavy wrist rotation or camera-downward approach
    (``omg/planner.py:260-293``)."""
    start_hand = panda.hand_pose(model, start)
    if cfg.use_standoff:
        n = 5
        interp = multi_linear_interpolate(start, reach_grasps[:, -1], n)
        flat = interp.reshape(-1, 9)
    else:
        n = 1
        flat = reach_grasps[:, -1]
    hands = panda.hand_pose_batch(model, flat)
    hands = hands.reshape(-1, n, 4, 4)
    r_diff = jnp.einsum("cnab,db->cnad", hands[..., :3, :3],
                        start_hand[:3, :3])
    tr = jnp.trace(r_diff, axis1=-2, axis2=-1)
    angle = jnp.abs(jnp.arccos(jnp.clip((tr - 1) / 2, -1.0, 1.0)))
    rot_mask = angle * 180 / jnp.pi > cfg.target_hand_filter_angle
    x_axis = hands[..., :3, 0]
    x_axis = x_axis / (jnp.linalg.norm(x_axis, axis=-1, keepdims=True) + 1e-9)
    down_mask = x_axis[..., 2] < -0.3
    bad = (rot_mask | down_mask).sum(-1) > 0
    if not cfg.remove_flip_grasp:
        bad = jnp.zeros_like(bad)
    return valid & (~bad)


def collision_prune(
    model: panda.PandaModel,
    scene: SceneSDF,
    params: CostParams,
    cfg: OMGConfig,
    standoff_goals: jnp.ndarray,  # [C, 9]
    valid: jnp.ndarray,
):
    """Batch collision check of candidate goal configs
    (``omg/planner.py:508-539``).  Returns (valid', potentials [C])."""
    poses = panda.forward_kinematics_batch(model, standoff_goals)
    x = panda.collision_point_positions(model, poses)
    c = standoff_goals.shape[0]
    p = x.shape[2]
    pot, _, collide = sdf_potentials(
        scene, params.inv_poses, x.reshape(-1, 3), params.epsilons,
        params.padding_scales, params.clearances, params.disables)
    pot = pot.reshape(c, panda.NUM_LINKS, p)
    collide = collide.reshape(c, panda.NUM_LINKS, p)
    # uncheck_finger_collision=-1 semantics (cost.py:350-353)
    scale = jnp.ones((panda.NUM_LINKS,)).at[-2:].set(0.1)
    pot = pot * scale[None, :, None]
    collide = collide.at[:, -2:].set(0.0)
    n_collide = collide.sum(axis=(1, 2))
    potentials = pot.sum(axis=(1, 2))
    return valid & (n_collide <= cfg.allow_collision_point), potentials


def diversity_dedupe(configs: jnp.ndarray, valid: jnp.ndarray,
                     min_dist: float = 0.5, mode: str = "scan"):
    """Greedy config-space dedupe (``omg/planner.py:547-562``): keep a
    candidate only if farther than ``min_dist`` from every kept one.

    ``mode="scan"`` replays the reference's sequential greedy pass;
    ``mode="rounds"`` computes the SAME kept set (the greedy result is
    the lexicographically-first maximal independent set of the
    conflict graph on valid nodes) as a parallel fixed point: each round
    a lane resolves KEPT once every lower-indexed conflicting lane is
    resolved REJECTED, and REJECTED as soon as some lower-indexed lane
    is KEPT.  At least the whole prefix up to the first unresolved
    dependency chain resolves per round, so round count is the conflict
    graph's dependency depth (small for clustered grasp sets) instead of
    C sequential scan steps — each round is two masked [C, C] any-
    reductions, pure VPU width instead of loop latency."""
    c = configs.shape[0]
    d2 = jnp.sum(
        (configs[:, None, :] - configs[None, :, :]) ** 2, axis=-1)
    close = d2 < min_dist**2

    if mode == "rounds":
        lower_close = close & (jnp.arange(c)[None, :] < jnp.arange(c)[:, None])

        def cond(state):
            kept, rejected = state
            return jnp.any(~kept & ~rejected)

        def body(state):
            kept, rejected = state
            unknown = ~kept & ~rejected
            blocked = jnp.any(lower_close & kept[None, :], axis=1)
            ready = ~jnp.any(lower_close & ~rejected[None, :], axis=1)
            kept = kept | (unknown & ready & ~blocked)
            rejected = rejected | (unknown & blocked)
            return kept, rejected

        kept, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros(c, bool), ~valid))
        return kept

    def body(kept, i):
        conflict = jnp.any(kept & close[i] & (jnp.arange(c) < i))
        keep_i = valid[i] & (~conflict)
        return kept.at[i].set(keep_i), keep_i

    kept0 = jnp.zeros(c, bool)
    # unroll: the body is a handful of elementwise ops on [C] lanes; at
    # C~1e3 the scan is pure loop-overhead-bound on TPU (~45 us/iter)
    kept, _ = jax.lax.scan(body, kept0, jnp.arange(c), unroll=16)
    return kept


def sample_goals(key, valid: jnp.ndarray, capacity: int):
    """Uniform sample of <= capacity valid candidates without replacement
    (``omg/planner.py:565-568``), via Gumbel top-k.  Returns indices [cap]
    and a mask [cap]."""
    g = jax.random.gumbel(key, valid.shape)
    scores = jnp.where(valid, g, -jnp.inf)
    top = jax.lax.top_k(scores, capacity)
    return top[1], jnp.isfinite(top[0])


def pinch_centers(model, configs: jnp.ndarray) -> jnp.ndarray:
    """World midpoint of the two finger-pad centers at each config [C, 9]
    -> [C, 3]: the point the pinch (closing) line passes through.  Pad
    centers are the finger links' collision-point bounding-box centers —
    the same pad geometry the physics executor contacts with
    (``physics/executor._pad_geometry``), so the ranking and the
    simulated grip agree on where the pinch actually is."""
    from ..models import api as model_api

    poses = model_api.fk_batch(model, configs)          # [C, L, 4, 4]
    pts = model.collision_points[-2:]                   # [2, P, 3]
    centers = (pts.min(axis=1) + pts.max(axis=1)) / 2.0  # traceable
    pad = poses[:, -2:]                                 # [C, 2, 4, 4]
    pc = pad[..., :3, 3] + jnp.einsum(
        "cfab,fb->cfa", pad[..., :3, :3], centers)
    return pc.mean(axis=1)


def build_goal_set(
    model: panda.PandaModel,
    cfg: OMGConfig,
    scene: SceneSDF,
    params: CostParams,
    grasp_poses_world: jnp.ndarray,  # [N, 4, 4] (already augmented/upsampled)
    grasp_valid: jnp.ndarray,        # [N]
    start: jnp.ndarray,              # [9]
    key: jax.Array,
    attached: bool = False,
    solve_fn=None,
    obj_pos: jnp.ndarray | None = None,  # [3] target COM (world)
) -> GoalSet:
    """Full goal-set construction for one target object (jittable with cfg
    static).  Capacity = ``cfg.goal_set_max_num``.

    ``solve_fn`` (signature of :func:`ik_ops.solve_goal_set`) overrides the
    IK sweep — the mesh-sharded pipeline injects a wrapper that solves a
    shard of the grasp lanes locally and all_gathers the survivors
    (``parallel/batch.py``); every downstream stage (augment / filter /
    prune / dedupe / sample) treats lanes as an unordered bag, so it runs
    replicated on the gathered result unchanged."""
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    seeds = jnp.concatenate([
        start[None, :7],
        jnp.asarray(ANCHOR_SEEDS[: cfg.ik_seed_num, :7], start.dtype)])
    solve = solve_fn if solve_fn is not None else ik_ops.solve_goal_set

    reach, standoff, valid, _ = solve(
        model, cfg, grasp_poses_world, seeds, lo[:7], hi[:7], attached,
        grasp_valid=grasp_valid)

    if cfg.increment_iks:
        # second pass reseeded from found solutions (reference
        # ``increment_iks``, ``omg/planner.py:436-441``): sample up to 10
        # successful standoff configs as extra anchor seeds and re-solve.
        # Gated on first-pass yield (VERDICT r2 item 8): when the first
        # sweep already fills the goal cap, the lax.cond skips the whole
        # second chain solve (the dominant goal-set-build subprogram) —
        # reseeding exists to rescue LOW yields (planner.py:436-441).
        key, sub = jax.random.split(key)
        gumbel = jax.random.gumbel(sub, valid.shape)
        scores = jnp.where(valid, gumbel, -jnp.inf)
        top = jax.lax.top_k(scores, 10)
        extra = jnp.where(jnp.isfinite(top[0])[:, None],
                          take_rows(standoff, top[1])[:, :7], seeds[0][None])

        def second(_):
            r2, s2, v2, _n = solve(
                model, cfg, grasp_poses_world, extra, lo[:7], hi[:7],
                attached, grasp_valid=grasp_valid)
            return r2, s2, v2

        def skip(_):
            shapes = jax.eval_shape(second, None)
            return jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        need = valid.sum() < cfg.goal_set_max_num
        reach2, standoff2, valid2 = jax.lax.cond(need, second, skip, None)
        reach = jnp.concatenate([reach, reach2])
        standoff = jnp.concatenate([standoff, standoff2])
        valid = jnp.concatenate([valid, valid2])

    if cfg.augment_flip_grasp and not attached:
        flip_standoff, ok1 = flip_wrist(standoff, cfg)
        flip_reach, _ = flip_wrist(reach, cfg)
        # reference masks the augmented copies by the standoff-config limit
        # check (planner.py:252-256)
        reach = jnp.concatenate([reach, flip_reach])
        standoff = jnp.concatenate([standoff, flip_standoff])
        valid = jnp.concatenate([valid, valid & ok1])

    if cfg.remove_flip_grasp and not attached:
        valid = task_space_filter(model, cfg, start, reach, valid)

    if cfg.goal_prune_cap and cfg.goal_prune_cap < reach.shape[0]:
        # Compact to valid lanes before the expensive collision prune and
        # the O(C^2) dedupe: invalid lanes need no collision check. Gumbel
        # top-k = uniform subsample if (rarely) more than cap lanes are
        # valid; sorting the survivors preserves the greedy dedupe's
        # original lane order, so when valid-count <= cap the result is
        # bit-identical to the uncompacted pipeline. fold_in (not split)
        # keeps the main key stream unchanged so downstream sampling —
        # and therefore every committed snapshot — is unaffected.
        sub = jax.random.fold_in(key, 0x9d5)
        g = jax.random.gumbel(sub, valid.shape)
        sel = jnp.sort(
            jax.lax.top_k(jnp.where(valid, g, -jnp.inf),
                          cfg.goal_prune_cap)[1])
        reach = take_rows(reach, sel)
        standoff = take_rows(standoff, sel)
        valid = jnp.take(valid, sel)

    valid, potentials = collision_prune(
        model, scene, params, cfg, standoff, valid)
    kept = diversity_dedupe(standoff, valid, mode=cfg.dedupe_mode)
    idx, mask = sample_goals(key, kept, cfg.goal_set_max_num)

    # take_rows: a[idx] on multi-dim rows lowers to the slow slice_sizes>1
    # lax.gather on v5e (DESIGN.md §3b)
    reach_sel = take_rows(reach, idx)
    standoff_sel = take_rows(standoff, idx)
    pot_sel = jnp.take(potentials, idx)
    grasps_sel = reach_sel[:, -1] if cfg.use_standoff else standoff_sel

    if cfg.grasp_optimize:
        # grasp-quality term (declared but unimplemented in the reference's
        # released code — cfg.grasp_optimize/base_grasp_weight exist with
        # info["grasp"]=0, omg/cost.py:513): penalize approach directions
        # far from top-down (lift stability) plus the collision potential
        # at the goal. Folded into `potentials` so the learner's and the
        # init policy's costs both see it.
        hands = panda.hand_pose_batch(model, grasps_sel)
        approach_z = hands[:, :3, 2]  # world z-axis of panda_hand
        downness = -approach_z[:, 2]  # 1 = straight down
        quality = 0.5 * (1.0 - downness)
        pot_sel = pot_sel + cfg.base_grasp_weight * quality

    if cfg.grip_quality_weight and obj_pos is not None:
        # grip-quality ranking (framework extension, VERDICT r4 item 2):
        # penalize goals whose pinch center sits far from the target COM.
        # A pinch line offset from the COM leaves a gravity moment arm —
        # the held object pendulums about the contact line during the
        # lift and swings past the reward's 0.2 m hand gate
        # (``physics/executor.py`` reward semantics, reference
        # ``bullet/panda_scene.py:486-504``); the r4 execution failures
        # are all in that class (docs/phys_exec_r04_100.json).
        com_dist = jnp.linalg.norm(
            pinch_centers(model, grasps_sel) - obj_pos[None], axis=-1)
        pot_sel = pot_sel + cfg.grip_quality_weight * com_dist

    return GoalSet(
        grasps=jnp.where(mask[:, None], grasps_sel, 0.0),
        reach_grasps=jnp.where(mask[:, None, None], reach_sel, 0.0),
        mask=mask,
        potentials=jnp.where(mask, pot_sel, 0.0),
    )


def goal_idx_policy(cfg: OMGConfig, goal_set: GoalSet, start: jnp.ndarray):
    """Initial goal choice (``omg/planner.py:201-223``)."""
    proj_dist = jnp.linalg.norm(start[None] - goal_set.grasps, axis=-1)
    proj_dist = jnp.where(goal_set.mask, proj_dist, jnp.inf)
    if cfg.goal_idx >= 0:
        return jnp.asarray(cfg.goal_idx, jnp.int32)
    if cfg.ol_alg == "Proj":
        return jnp.argmin(proj_dist).astype(jnp.int32)
    if cfg.goal_idx == -1:
        costs = goal_set.potentials + cfg.dist_eps * proj_dist
        return jnp.argmin(
            jnp.where(goal_set.mask, costs, jnp.inf)).astype(jnp.int32)
    return jnp.asarray(0, jnp.int32)
