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
