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


def test_analytic_bake_matches_grid_bake():
    """bake_world_potential_analytic must reproduce the grid path's
    nearest-cell semantics exactly (f32 rounding aside), including inside
    penalty, disables, and padding fill."""
    import jax
    import jax.numpy as jnp
    from omg_planner_tpu.ops.sdf import (
        SignedDensityField, analytic_prim_arrays, bake_world_potential,
        bake_world_potential_analytic, combine_sdfs)

    fields = [
        SignedDensityField.from_analytic("box", [0.2, 0.3, 0.1],
                                         delta=0.01),
        SignedDensityField.from_analytic("cylinder", [0.04, 0.2],
                                         delta=0.0075),
        SignedDensityField.from_analytic("sphere", [0.06], delta=0.008),
    ]
    for f in fields:
        f.penalize_inside(5.0)
    rng = np.random.default_rng(3)
    poses = []
    for i in range(3):
        m = np.eye(4)
        a = rng.normal(size=3)
        th = np.linalg.norm(a)
        a = a / th
        k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        m[:3, :3] = np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * k @ k
        m[:3, 3] = [0.4 + 0.2 * i, 0.1 * i - 0.1, 0.3]
        poses.append(np.linalg.inv(m))
    inv = jnp.asarray(np.stack(poses), jnp.float32)
    eps = jnp.asarray([0.2, 0.1, 0.15])
    pad = jnp.asarray([1.0, 0.5, 1.0])
    clear = jnp.asarray([0.02, 0.0, 0.05])
    dis = jnp.asarray([0.0, 0.0, 1.0])

    scene = combine_sdfs(fields)
    res = 0.05  # coarse: keeps the CPU test fast
    wp_grid = jax.jit(lambda: bake_world_potential(
        scene, inv, eps, pad, clear, dis, resolution=res))()
    kinds, halfs, pens, _, _, dims_act, limits, _ = \
        analytic_prim_arrays(fields)
    wp_an = jax.jit(lambda: bake_world_potential_analytic(
        kinds, halfs, pens, jnp.asarray(limits), inv, eps, pad, dis,
        dims_act, resolution=res))()
    assert wp_grid.data.shape == wp_an.data.shape
    np.testing.assert_allclose(np.array(wp_an.data), np.array(wp_grid.data),
                               atol=3e-5)
