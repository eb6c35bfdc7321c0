"""World-potential learner scoring vs exact per-object evaluation."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.ops import learner as ol
from omg_planner_tpu.ops.sdf import bake_world_potential, world_potential_lookup
from omg_planner_tpu.planner.scene import PlanningScene


def test_world_potential_matches_exact_pointwise():
    cfg = OMGConfig(silent=True, world_potential_resolution=0.01)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=2)
    env = scene.env
    params = env.cost_params()
    sdf = env.scene_sdf()
    wp = jax.jit(lambda s, p: bake_world_potential(
        s, p.inv_poses, p.epsilons, p.padding_scales, p.clearances,
        p.disables, resolution=0.01))(sdf, params)

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform([0.1, -0.5, 0.2], [0.9, 0.5, 0.9],
                                  (400, 3)), jnp.float32)
    from omg_planner_tpu.ops.sdf import sdf_potentials
    exact, _, _ = sdf_potentials(
        sdf, params.inv_poses, pts, params.epsilons, params.padding_scales,
        params.clearances, params.disables)
    approx = world_potential_lookup(wp, pts)
    exact, approx = np.array(exact), np.array(approx)
    # interpolation of a baked field vs exact hinge: small absolute error
    # relative to the potential scale (eps/2 = 0.1)
    err = np.abs(exact - approx)
    assert np.quantile(err, 0.95) < 0.02, np.quantile(err, 0.95)
    # zero potential far from everything
    far = world_potential_lookup(wp, jnp.asarray([[0.0, 0.0, 1.2]]))
    assert float(far[0]) == 0.0


def test_learner_ranking_agrees_with_exact():
    cfg = OMGConfig(silent=True, goal_set_max_num=16, ik_seed_num=4,
                    ik_max_iters=30, optim_steps=10, extra_smooth_steps=2,
                    learner_interp_steps=10)
    scene = PlanningScene.synthetic(cfg, scene_id=1, n_obstacles=2)
    problem = scene.build_problem()
    hp = cfg.horizon()

    cv_world = ol.cost_vector(
        scene.model, problem.scene, problem.cost_params, cfg, hp,
        problem.traj_init, problem.goal_set, jnp.asarray(1.0),
        problem.world_potential)
    cfg_exact = cfg.replace(learner_world_potential=False)
    cv_exact = ol.cost_vector(
        scene.model, problem.scene, problem.cost_params, cfg_exact, hp,
        problem.traj_init, problem.goal_set, jnp.asarray(1.0), None)
    mask = np.array(problem.goal_set.mask)
    w = np.array(cv_world)[mask]
    e = np.array(cv_exact)[mask]
    # scores strongly correlated; the argmin goal agrees or is near-tied
    corr = np.corrcoef(w, e)[0, 1]
    assert corr > 0.95, corr
    top_w, top_e = np.argmin(w), np.argmin(e)
    assert top_w == top_e or w[top_e] < np.quantile(w, 0.25)
