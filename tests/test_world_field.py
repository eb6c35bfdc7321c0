"""Fused world-field CHOMP collision backend vs the exact per-object query.

The 5-channel field (`ops/sdf.py::WorldField`) trades bake-time resolution
for an O× cut in hot-loop gathers (``cfg.sdf_fused``); these tests bound the
approximation against `sdf_potentials` (the kernel.cu:96-262 oracle path)
and check plan-level behavior is preserved.
"""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.ops.sdf import (
    bake_scene, bake_world_field, sdf_potentials, world_field_query)
from omg_planner_tpu.planner.scene import PlanningScene


def _field_and_params(resolution=0.01):
    # the fused field applies only to data-backed (grid) scenes — pin the
    # voxel backend so the bake path is exercised
    cfg = OMGConfig(silent=True, sdf_analytic=False)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=2)
    env = scene.env
    params = env.cost_params()
    sdf = env.scene_sdf()
    wf = jax.jit(lambda s, p: bake_world_field(
        bake_scene(s), p.inv_poses, p.epsilons, p.padding_scales,
        p.clearances, p.disables, resolution=resolution))(sdf, params)
    return wf, sdf, params


def test_world_field_matches_exact_pointwise():
    wf, sdf, params = _field_and_params()
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform([0.1, -0.5, 0.2], [0.9, 0.5, 0.9],
                                  (500, 3)), jnp.float32)
    pot_e, grad_e, col_e = sdf_potentials(
        sdf, params.inv_poses, pts, params.epsilons, params.padding_scales,
        params.clearances, params.disables)
    pot_f, grad_f, col_f = world_field_query(wf, pts)
    pot_e, pot_f = np.array(pot_e), np.array(pot_f)
    grad_e, grad_f = np.array(grad_e), np.array(grad_f)
    col_e, col_f = np.array(col_e), np.array(col_f)

    # potential: small absolute error vs the eps/2=0.1 scale
    assert np.quantile(np.abs(pot_e - pot_f), 0.95) < 0.02
    # gradient: direction agreement where the potential is active (the
    # optimizer only consumes grad where pot > 0)
    active = (pot_e > 1e-3) & (pot_f > 1e-3)
    if active.sum():
        ge, gf = grad_e[active], grad_f[active]
        ne = np.linalg.norm(ge, axis=-1)
        nf = np.linalg.norm(gf, axis=-1)
        ok = (ne > 1e-6) & (nf > 1e-6)
        cos = np.sum(ge[ok] * gf[ok], axis=-1) / (ne[ok] * nf[ok])
        assert np.quantile(cos, 0.05) > 0.9, np.quantile(cos, 0.05)
    # collide flag: disagreement only inside the one-cell boundary band
    dis = col_e != col_f
    assert dis.mean() < 0.05, dis.mean()
    # far free space is exactly zero
    pot0, grad0, col0 = world_field_query(
        wf, jnp.asarray([[0.0, 0.0, 1.2]]))
    assert float(pot0[0]) == 0.0 and float(col0[0]) == 0.0
    assert float(jnp.abs(grad0).max()) == 0.0


def test_plan_with_fused_field_succeeds():
    cfg = OMGConfig(silent=True, optim_steps=15, extra_smooth_steps=5,
                    goal_set_max_num=12, ik_seed_num=3, ik_max_iters=30,
                    learner_interp_steps=10, sdf_fused=True,
                    sdf_analytic=False)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)
    res = scene.step(fast=True)
    assert res is not None
    assert bool(res.flag)
    assert int(res.info.collide) <= 5

    # exact backend on the same scene: same verdict, close trajectory
    cfg_exact = cfg.replace(sdf_fused=False)
    scene_e = PlanningScene.synthetic(cfg_exact, scene_id=0, n_obstacles=1)
    res_e = scene_e.step(fast=True)
    assert bool(res_e.flag)
    d = float(jnp.abs(res.traj - res_e.traj).max())
    # identical goal sets; trajectories may differ where collision cost is
    # inactive, but the end states agree and deviation stays small
    assert d < 0.2, d


def test_analytic_field_bake_matches_grid_bake():
    """bake_world_field_analytic reproduces the grid path's nearest-cell
    4-channel read exactly (f32 rounding aside), including the baked
    stack's border/padding central-difference artifacts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from omg_planner_tpu.ops.sdf import (
        SignedDensityField, analytic_prim_arrays, bake_scene,
        bake_world_field, bake_world_field_analytic, combine_sdfs)

    fields = [
        SignedDensityField.from_analytic("box", [0.25, 0.2, 0.12],
                                         delta=0.012),
        SignedDensityField.from_analytic("cylinder", [0.05, 0.18],
                                         delta=0.009),
    ]
    for f in fields:
        f.penalize_inside(5.0)
    poses = []
    for i in range(2):
        m = np.eye(4)
        c, s = np.cos(0.4 + i), np.sin(0.4 + i)
        m[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        m[:3, 3] = [0.5, 0.15 * i - 0.05, 0.25]
        poses.append(np.linalg.inv(m))
    inv = jnp.asarray(np.stack(poses), jnp.float32)
    eps = jnp.asarray([0.15, 0.1])
    pad = jnp.asarray([1.0, 0.7])
    clear = jnp.asarray([0.03, 0.0])
    dis = jnp.asarray([0.0, 0.0])

    baked = jax.jit(bake_scene)(combine_sdfs(fields))
    res = 0.06  # coarse: keeps the CPU test fast
    wf_grid = jax.jit(lambda: bake_world_field(
        baked, inv, eps, pad, clear, dis, resolution=res,
        chunk=8192))()
    kinds, halfs, pens, _, _, dims_act, limits, _ = \
        analytic_prim_arrays(fields)
    wf_an = jax.jit(lambda: bake_world_field_analytic(
        kinds, halfs, pens, jnp.asarray(limits), inv, eps, pad, clear,
        dis, dims_act, resolution=res, chunk=8192))()
    assert wf_grid.data5.shape == wf_an.data5.shape
    np.testing.assert_allclose(
        np.array(wf_an.data5[..., 0]), np.array(wf_grid.data5[..., 0]),
        atol=3e-5)  # potential
    np.testing.assert_allclose(
        np.array(wf_an.data5[..., 1:4]), np.array(wf_grid.data5[..., 1:4]),
        atol=3e-3)  # gradients (divided by delta: looser f32 tolerance)
    np.testing.assert_allclose(
        np.array(wf_an.data5[..., 4]), np.array(wf_grid.data5[..., 4]),
        atol=3e-5)  # min-dist channel


def test_true_bake_beats_snapped_bake_against_continuous_truth():
    """snap=False evaluates the TRUE analytic SDF at world cell centers;
    its potential channel must track the continuous hinge potential at
    least as well as the parity (double-quantized) bake."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from omg_planner_tpu.ops.sdf import (
        SignedDensityField, _analytic_sdf_points, analytic_prim_arrays,
        bake_world_field_analytic, world_field_query)

    fields = [
        SignedDensityField.from_analytic("box", [0.22, 0.16, 0.1],
                                         delta=0.012),
        SignedDensityField.from_analytic("sphere", [0.07], delta=0.008),
    ]
    for f in fields:
        f.penalize_inside(5.0)
    poses = []
    for i in range(2):
        m = np.eye(4)
        c, s = np.cos(0.7 * i + 0.3), np.sin(0.7 * i + 0.3)
        m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        m[:3, 3] = [0.45 + 0.12 * i, -0.05, 0.28]
        poses.append(np.linalg.inv(m))
    inv = jnp.asarray(np.stack(poses), jnp.float32)
    eps = jnp.asarray([0.15, 0.12])
    pad = jnp.asarray([1.0, 1.0])
    clear = jnp.asarray([0.0, 0.0])
    dis = jnp.asarray([0.0, 0.0])
    kinds, halfs, pens, _, _, dims_act, limits, _ = \
        analytic_prim_arrays(fields)
    res = 0.02

    def bake(snap):
        return jax.jit(lambda: bake_world_field_analytic(
            kinds, halfs, pens, jnp.asarray(limits), inv, eps, pad, clear,
            dis, dims_act, resolution=res, chunk=8192, snap=snap))()

    wf_snap, wf_true = bake(True), bake(False)

    # probe points in the epsilon band around both objects
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.uniform([0.2, -0.3, 0.05], [0.75, 0.25, 0.55],
                                  size=(4000, 3)), jnp.float32)
    # continuous ground truth: analytic SDF + hinge, summed over objects
    p_obj = jnp.einsum("oab,pb->opa", inv[:, :3, :3], pts) \
        + inv[:, :3, 3][:, None, :]
    d = _analytic_sdf_points(kinds, jnp.asarray(halfs), jnp.asarray(pens),
                             p_obj)
    e = eps[:, None]
    pot = jnp.where(d <= 0, -d + 0.5 * e, 0.0)
    pot = jnp.where((d > 0) & (d <= e), (d - e) ** 2 / (2 * e)
                    * pad[:, None], pot)
    truth = np.array(pot.sum(0))

    err_snap = np.abs(np.array(world_field_query(wf_snap, pts)[0]) - truth)
    err_true = np.abs(np.array(world_field_query(wf_true, pts)[0]) - truth)
    active = truth > 1e-4
    assert active.sum() > 200
    # strictly better in aggregate, no worse at the tail
    assert err_true[active].mean() <= 0.7 * err_snap[active].mean(), (
        err_true[active].mean(), err_snap[active].mean())
    assert np.quantile(err_true[active], 0.95) <= \
        np.quantile(err_snap[active], 0.95) * 1.05
