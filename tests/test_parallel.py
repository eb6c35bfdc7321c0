"""Batched + mesh-sharded planning tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.parallel.batch import (
    make_sharded_plan, pad_objects, plan_batch_jit, stack_problems)


def _cfg():
    return OMGConfig(optim_steps=4, extra_smooth_steps=2, timesteps=10,
                     goal_set_max_num=8, ik_seed_num=2, ik_max_iters=20,
                     learner_interp_steps=5, silent=True)


def _problems(cfg, n):
    import __graft_entry__ as ge
    model, base = ge._tiny_problem(cfg)
    return model, [base] * n


def test_plan_batch_vmap():
    cfg = _cfg()
    model, problems = _problems(cfg, 3)
    stacked = stack_problems(problems)
    res = plan_batch_jit(model, cfg, stacked)
    assert np.asarray(res.traj).shape == (3, cfg.timesteps, 9)
    assert np.isfinite(np.asarray(res.traj)).all()
    # identical problems must give identical plans
    t = np.asarray(res.traj)
    np.testing.assert_allclose(t[0], t[1], atol=1e-6)


def test_sharded_plan_matches_single_chip():
    """The goal-sharded plan is the SAME loop as plan_fast with a gathered
    cost vector — trajectories must agree to float tolerance (VERDICT r1
    item 3)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    from omg_planner_tpu.planner.plan import plan_fast

    cfg = _cfg()
    model, problems = _problems(cfg, 4)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("scene", "goal"))
    fn = make_sharded_plan(mesh, model, cfg)
    stacked = stack_problems(problems)
    res = fn(stacked)
    trajs = np.asarray(res.traj)
    assert trajs.shape == (4, cfg.timesteps, 9)
    assert np.isfinite(trajs).all()
    # all scene shards solved the identical problem -> identical outputs
    np.testing.assert_allclose(trajs[0], trajs[-1], atol=1e-5)

    ref = jax.jit(lambda p: plan_fast(model, cfg, p))(problems[0])
    np.testing.assert_allclose(trajs[0], np.asarray(ref.traj), atol=1e-5)
    assert int(res.goal_idx[0]) == int(ref.goal_idx)
    assert int(res.steps_used[0]) == int(ref.steps_used)
    assert bool(res.flag[0]) == bool(ref.flag)


@pytest.mark.parametrize("active_goals", [0, 4])
def test_sharded_blacklist_fires_and_matches_single_chip(active_goals):
    """VERDICT r3 items 1+2: the in-plan blacklist must RUN (and fire) on
    the goal-sharded path and produce the single-chip trajectory.  The old
    mesh test used optim_steps=4 < inplan_blacklist_step, so the blacklist
    could never trip and a statically-disabled sharded blacklist
    green-lit a divergent production config (MULTICHIP_r03 ok:false).

    ``allow_collision_point=-1`` makes every plan 'failing' at each check
    step, guaranteeing fires; a small radius keeps the set non-empty so
    several restarts happen within the budget.  Covers both learner
    modes: unrestricted (cv_fn collective sweep + dynamic mask at
    finalize) and active-lane restricted (replicated sweep)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    from omg_planner_tpu.planner.plan import plan_fast

    cfg = _cfg().replace(
        optim_steps=6, extra_smooth_steps=2,
        inplan_blacklist_step=2, inplan_blacklist_every=2,
        inplan_blacklist_radius=0.05, allow_collision_point=-1,
        learner_active_goals=active_goals)
    model, problems = _problems(cfg, 4)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("scene", "goal"))
    fn = make_sharded_plan(mesh, model, cfg)
    res = fn(stack_problems(problems))

    ref = jax.jit(plan_fast, static_argnums=(1,))(
        model, cfg.jit_key(), problems[0])
    # the blacklist actually fired (this is what the old test couldn't see)
    assert (np.asarray(ref.goal_mask).sum()
            < np.asarray(problems[0].goal_set.mask).sum())
    np.testing.assert_allclose(
        np.asarray(res.traj)[0], np.asarray(ref.traj), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(res.goal_mask)[0], np.asarray(ref.goal_mask))
    assert int(res.goal_idx[0]) == int(ref.goal_idx)
    assert int(res.steps_used[0]) == int(ref.steps_used)


def test_solve_goal_set_sharded_two_stage_matches_single():
    """Two-stage goal-set IK under the goal axis must reproduce the
    single-chip solve lane-for-lane: replicated prefilter/top-k picks the
    identical survivor set, the sharded chain syncs its convergence exit,
    and the gather restores original lane order (VERDICT r3 item 1 —
    previously the dryrun had to pin ik_two_stage=False)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import __graft_entry__ as ge
    from jax.sharding import Mesh, PartitionSpec as P
    from omg_planner_tpu.ops import ik as ik_ops

    cfg = _cfg().replace(ik_two_stage=True, ik_survivor_cap=18,
                         ik_prefilter_iters=6, ik_seed_num=3)
    model, env, problem, grasps_world = ge._tiny_problem(
        cfg, real_grasps=True)
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    seeds = jnp.asarray(
        np.tile(np.asarray(problem.start)[None, :7], (3, 1))
        + 0.2 * np.random.default_rng(1).normal(size=(3, 7)),
        jnp.float32)
    gv = jnp.ones(grasps_world.shape[0], bool)

    single = jax.jit(lambda g, s, v: ik_ops.solve_goal_set(
        model, cfg, g, s, lo[:7], hi[:7], grasp_valid=v))(
            grasps_world, seeds, gv)

    mesh = Mesh(np.array(jax.devices()[:4]), ("goal",))
    shard_fn = jax.jit(jax.shard_map(
        lambda g, s, v: ik_ops.solve_goal_set(
            model, cfg, g, s, lo[:7], hi[:7], grasp_valid=v, axis="goal"),
        mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False))
    sharded = shard_fn(grasps_world, seeds, gv)

    for a, b, name in zip(single, sharded,
                          ("reach", "standoff", "valid", "lane_idx")):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, name
        if a.dtype == bool or name == "lane_idx":
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
    assert np.asarray(single[2]).sum() > 0  # some lanes actually valid


def test_prebuilt_batched_goal_sets_match_streamed_pipeline():
    """plan_pipelined(build_batch=N) must yield the same plans as the
    per-scene-build pipeline: the vmapped wave build (the measured 1.58x
    device-time win, docs/probe_vmap_build_r04.json) is a staging
    optimization, not a semantics change."""
    from omg_planner_tpu.planner.runner import plan_pipelined
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True, optim_steps=8, extra_smooth_steps=3,
                    goal_set_max_num=10, ik_seed_num=2, ik_max_iters=25,
                    learner_interp_steps=8, sdf_analytic=True)

    def run(build_batch):
        scenes = [(sid, PlanningScene.synthetic(cfg, scene_id=sid,
                                                n_obstacles=2))
                  for sid in (0, 3, 5)]
        return [np.asarray(res.traj)
                for _sid, _sc, res, _dt in plan_pipelined(
                    scenes, cfg, depth=2, build_batch=build_batch)]

    plain = run(0)
    batched = run(2)  # wave of 2 + padded tail wave
    assert len(plain) == len(batched) == 3
    for a, b in zip(plain, batched):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_pad_objects_disables_dummies():
    cfg = _cfg()
    model, problems = _problems(cfg, 1)
    pr = problems[0]
    padded = pad_objects(pr, pr.cost_params.disables.shape[0] + 2)
    assert float(padded.cost_params.disables[-1]) == 1.0
    assert float(padded.cost_params.disables[-2]) == 1.0
    # plan result unchanged by disabled padding
    from omg_planner_tpu.planner.plan import plan_fast
    r1 = jax.jit(lambda p: plan_fast(model, cfg, p).traj)(pr)
    r2 = jax.jit(lambda p: plan_fast(model, cfg, p).traj)(padded)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_vmap_batch_equals_streamed_on_analytic_scenes():
    """vmapped scene-batch plans must equal independently streamed plans
    lane-for-lane (batched while_loop select-masks each lane's carry).
    The analytic backend has no hot-loop gathers, making the vmap batch a
    viable TPU throughput mode — this guards its semantics."""
    from omg_planner_tpu.parallel.batch import plan_batch_vmap
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True, optim_steps=8, extra_smooth_steps=3,
                    goal_set_max_num=10, ik_seed_num=2, ik_max_iters=25,
                    learner_interp_steps=8, sdf_analytic=True)
    model = panda.load_panda(collision_point_num=cfg.collision_point_num)
    probs = []
    for sid in (0, 3):
        s = PlanningScene.synthetic(cfg, scene_id=sid, n_obstacles=2)
        probs.append(s.build_problem())
    max_obj = max(p.cost_params.inv_poses.shape[0] for p in probs)
    probs = [pad_objects(p, max_obj) for p in probs]

    single = [jax.jit(plan_fast, static_argnums=(1,))(
        model, cfg.jit_key(), p) for p in probs]
    batched = jax.jit(plan_batch_vmap, static_argnums=(1,))(
        model, cfg.jit_key(), stack_problems(probs))
    for i, s in enumerate(single):
        np.testing.assert_allclose(np.asarray(batched.traj)[i],
                                   np.asarray(s.traj), atol=1e-5)
        assert int(np.asarray(batched.steps_used)[i]) == int(
            np.asarray(s.steps_used))
        assert bool(np.asarray(batched.flag)[i]) == bool(np.asarray(s.flag))
