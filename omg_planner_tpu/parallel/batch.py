"""Scale-out: batched and mesh-sharded planning.

The reference's entire parallelism inventory is one CUDA kernel launch plus
a 4-process IK pool (SURVEY §2.3).  The TPU framework's axes of scale are
**scenes** (data-parallel analog) and **goals** (model-parallel analog):

  * :func:`plan_batch` — vmap the whole jitted plan over a scene batch on
    one chip (replaces the reference's serial 100-scene loop,
    ``omg/core.py:869-885``).
  * :func:`make_sharded_plan` — ``shard_map`` over a 2-D
    ``Mesh(('scene', 'goal'))``: scene shards ride the mesh rows; within a
    scene the online learner's goal-candidate evaluation (the largest
    tensor op per step: G x n FK + SDF sweeps) is sharded across the
    ``goal`` axis, with an ``all_gather`` over ICI to reassemble the cost
    vector and a masked ``psum`` to broadcast the chosen goal tail —
    replacing the reference's in-kernel ``atomicAdd`` + host ``np.argmax``
    (``online_learner.py:245``).

All collectives ride the mesh; scene parallelism is embarrassingly parallel
(DCN-safe), goal parallelism is intra-slice (ICI).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OMGConfig, schedule_weights
from ..models import panda
from ..ops import chomp
from ..ops import learner as ol
from ..ops.chomp import GoalSet
from ..planner.plan import PlanProblem, plan_fast


def stack_problems(problems: Sequence[PlanProblem]) -> PlanProblem:
    """Stack per-scene problems into one batched pytree (leading scene
    axis).  All problems must share static shapes — pad scenes to a common
    object count / SDF resolution first (``combine_sdfs(pad_to=...)`` plus
    disabled dummy objects)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *problems)


def pad_objects(problem: PlanProblem, num_objects: int) -> PlanProblem:
    """Pad a problem's object dimension with disabled dummy objects."""
    from ..ops.sdf import BakedSceneSDF

    baked = isinstance(problem.scene, BakedSceneSDF)
    vol = problem.scene.data4 if baked else problem.scene.data
    o = vol.shape[0]
    if o == num_objects:
        return problem
    extra = num_objects - o
    if baked:
        fill = jnp.zeros((extra,) + vol.shape[1:]).at[..., 0].set(1.0)
    else:
        fill = jnp.ones((extra,) + vol.shape[1:])
    data = jnp.concatenate([vol, fill], axis=0)
    lim = jnp.concatenate(
        [problem.scene.limits,
         jnp.tile(problem.scene.limits[-1:], (extra, 1))], axis=0)
    cp = problem.cost_params
    pad1 = lambda a, v: jnp.concatenate([a, jnp.full((extra,), v, a.dtype)])
    cost_params = cp._replace(
        inv_poses=jnp.concatenate(
            [cp.inv_poses, jnp.tile(jnp.eye(4)[None], (extra, 1, 1))]),
        epsilons=pad1(cp.epsilons, 0.2),
        padding_scales=pad1(cp.padding_scales, 1.0),
        clearances=pad1(cp.clearances, 0.0),
        disables=pad1(cp.disables, 1.0),
    )
    scene = (problem.scene._replace(data4=data, limits=lim) if baked
             else problem.scene._replace(data=data, limits=lim))
    return problem._replace(scene=scene, cost_params=cost_params)


def plan_batch(model: panda.PandaModel, cfg: OMGConfig,
               problems: PlanProblem):
    """Batch of plans on one device via ``lax.map``.

    Deliberately NOT ``vmap``: vmapping the plan adds operand batch dims to
    the SDF corner gathers, and XLA:TPU lowers batched gathers ~80x slower
    than the unbatched form (measured 17.4 s vs 0.2 s for 8x70-step plans).
    ``lax.map`` runs scenes sequentially on-chip, each iteration the fast
    unbatched program; device-level parallelism comes from the mesh
    (`make_sharded_plan`), not intra-chip batching.
    """
    return jax.lax.map(lambda pr: plan_fast(model, cfg, pr), problems)


def plan_batch_vmap(model: panda.PandaModel, cfg: OMGConfig,
                    problems: PlanProblem):
    """vmap variant (kept for comparison benchmarks)."""
    return jax.vmap(lambda pr: plan_fast(model, cfg, pr))(problems)


plan_batch_jit = jax.jit(plan_batch, static_argnums=(1,))


# ---------------------------------------------------------------------------
# mesh-sharded plan: scenes x goals
# ---------------------------------------------------------------------------

def _plan_goal_sharded(model, cfg, problem: PlanProblem, axis: str):
    """Full plan for ONE scene whose goal set is sharded over mesh axis
    ``axis``.  Runs inside ``shard_map``; trajectory state is replicated
    across the goal axis, candidate evaluation is local + all_gather."""
    hp = cfg.horizon()
    total = cfg.total_steps
    g_local = problem.goal_set.capacity  # local shard capacity
    n_shards = jax.lax.axis_size(axis)
    my_shard = jax.lax.axis_index(axis)

    def full_cost_vector(traj, t):
        cv_local = ol.cost_vector(
            model, problem.scene, problem.cost_params, cfg, hp, traj,
            problem.goal_set, t, problem.world_potential)
        cv_all = jax.lax.all_gather(cv_local, axis)  # [n_shards, g_local]
        return cv_all.reshape(-1)

    def gather_goal(goal_idx_global):
        """Fetch (grasp [9], tail [k, 9]) of a global goal index via masked
        psum (owner contributes, others zero)."""
        shard = goal_idx_global // g_local
        local = goal_idx_global % g_local
        own = (shard == my_shard).astype(jnp.float32)
        grasp = problem.goal_set.grasps[local] * own
        tail = problem.goal_set.reach_grasps[local] * own
        return (jax.lax.psum(grasp, axis), jax.lax.psum(tail, axis))

    mask_all = jax.lax.all_gather(problem.goal_set.mask, axis).reshape(-1)
    grasps_all = jax.lax.all_gather(
        problem.goal_set.grasps, axis).reshape(-1, 9)
    learner_on = cfg.ol_alg not in ("Baseline", "Proj")

    def learner_full_update(state_g, traj, t):
        """MD/FTL/... update over the gathered (global) cost vector.
        ``state_g`` lives on the gathered goal dimension (replicated)."""
        cv = full_cost_vector(traj, t)
        gathered_gs = GoalSet(
            grasps=grasps_all,
            reach_grasps=jnp.zeros((cv.shape[0], cfg.reach_tail_length, 9)),
            mask=mask_all, potentials=jnp.zeros_like(cv))
        state_g = ol.update_goal_dist(cfg, state_g, cv, gathered_gs, traj[-1])
        idx = jnp.argmax(jnp.where(mask_all, state_g.p, -jnp.inf))
        return state_g, idx.astype(jnp.int32)

    # init: min-cost goal + respline
    g_total = g_local * n_shards
    state = ol.LearnerState(
        p=mask_all.astype(jnp.float32) / jnp.maximum(mask_all.sum(), 1),
        sum_costs=jnp.zeros(g_total),
        experts_p=jnp.tile(
            (mask_all.astype(jnp.float32)
             / jnp.maximum(mask_all.sum(), 1))[None], (ol.NUM_EXPERTS, 1)),
        experts_costs=jnp.zeros(ol.NUM_EXPERTS),
        q=jnp.ones(ol.NUM_EXPERTS) / ol.NUM_EXPERTS,
        t=jnp.asarray(0.0), ti=jnp.zeros(g_total))

    if learner_on:
        cv0 = full_cost_vector(problem.traj_init, jnp.asarray(0.0))
        goal_idx0 = jnp.argmin(cv0).astype(jnp.int32)
    else:
        # grasp_init policy: closest goal (planner.py:219-220)
        d0 = jnp.where(mask_all,
                       jnp.linalg.norm(grasps_all - problem.start[None],
                                       axis=-1), jnp.inf)
        goal_idx0 = jnp.argmin(d0).astype(jnp.int32)
    grasp0, _ = gather_goal(goal_idx0)
    from ..utils.spline import cubic_interpolate
    traj0 = cubic_interpolate(problem.start, grasp0, cfg.timesteps)

    def body(step, carry):
        traj, goal_idx, state, done = carry
        if learner_on:
            state2, goal_idx2 = learner_full_update(state, traj, state.t + 1.0)
            state2 = state2._replace(t=state.t + 1.0)
            learn = (step < cfg.optim_steps) & (~done)
            state = jax.tree.map(
                lambda a, b: jnp.where(learn, b, a), state, state2)
            goal_idx = jnp.where(learn, goal_idx2, goal_idx)

        grasp, tail = gather_goal(goal_idx)
        obstacle_w, smooth_w, _, step_size = schedule_weights(cfg, step + 1)
        cost, grad, info = chomp.compute_total_loss(
            model, problem.scene, problem.cost_params, cfg, hp, traj,
            problem.start, grasp, grasp, obstacle_w, smooth_w)
        if not cfg.use_standoff:
            tail = grasp[None]
        update = chomp.goal_set_projection_update(
            hp, cfg, traj, grad, tail, step_size)
        new_traj = chomp.apply_update(cfg, traj, update)
        new_traj = chomp.handle_joint_limit(
            hp, cfg, new_traj, problem.joint_lower, problem.joint_upper)
        fired = info.terminate & (step > 0)
        traj = jnp.where(done | fired, traj, new_traj)
        return traj, goal_idx, state, done | fired

    def _vary(x):
        # mark carry leaves as varying over both mesh axes (loop-carry type
        # stability under shard_map's varying-manual-axes checks)
        have = getattr(jax.typeof(x), "vma", frozenset())
        need = tuple(a for a in ("scene", "goal") if a not in have)
        return jax.lax.pvary(x, need) if need else x

    carry0 = jax.tree.map(_vary, (traj0, goal_idx0, state, jnp.asarray(False)))
    traj, goal_idx, state, done = jax.lax.fori_loop(0, total, body, carry0)
    return traj, goal_idx, done


def make_sharded_plan(mesh: Mesh, model: panda.PandaModel, cfg: OMGConfig):
    """Build the jitted (scenes x goals)-sharded batch planner.

    Input: stacked ``PlanProblem`` with leading scene axis; goal-set arrays
    additionally sharded on their goal dimension.  Returns
    (trajs [S, T, 9], goal_idx [S], done [S]).
    """

    def local_batch(problems: PlanProblem):
        return jax.vmap(
            lambda pr: _plan_goal_sharded(model, cfg, pr, "goal"))(problems)

    jitted = {}

    def call(problems: PlanProblem):
        # specs depend on the problem pytree structure (SceneSDF vs baked)
        struct = jax.tree.structure(problems)
        if struct not in jitted:
            specs = jax.tree.map(lambda _: P("scene"), problems)
            specs = specs._replace(goal_set=GoalSet(
                grasps=P("scene", "goal"), reach_grasps=P("scene", "goal"),
                mask=P("scene", "goal"), potentials=P("scene", "goal")))
            fn = jax.shard_map(
                local_batch, mesh=mesh, in_specs=(specs,),
                out_specs=(P("scene"), P("scene"), P("scene")),
                check_vma=False)
            jitted[struct] = jax.jit(fn)
        return jitted[struct](problems)

    return call


