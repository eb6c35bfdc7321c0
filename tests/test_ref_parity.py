"""Trajectory-level parity against the ACTUAL reference, in CI.

The reference (``/root/reference``) runs here on CPU through
``io/ref_shims.py`` (VERDICT r2 item 1).  One contested scene goes through
BOTH planners end-to-end — the reference's own ``omg/planner.py`` CHOMP +
MD-learner loop vs ours — and the trajectories must agree.

The full 8-scene report lives in ``docs/PARITY.md``
(``scripts/parity_run.py``); this test pins one scene so parity cannot
silently rot.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def parity_ws(tmp_path_factory):
    """One mild-contested scene (shelf over the target) with baked goals."""
    from omg_planner_tpu.io import ref_fixtures, ref_shims

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from parity_run import _ours_cfg, _parity_model

    root = str(tmp_path_factory.mktemp("parity_ws"))
    ref_shims.build_ref_workspace(root)
    mats = ref_fixtures.make_parity_tree(root, n_scenes=2)
    mat = mats[1]  # s%4==1: shelf at z=0.30, solvable in ~10 steps

    import scipy.io as sio

    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = _ours_cfg()
    model = _parity_model()
    env, _ = env_from_mat_scene(cfg, mat, root, model=model, penalize=False)
    ps = PlanningScene(cfg, env)
    gs = ps.build_goal_set()
    goals = np.asarray(gs.grasps)[np.asarray(gs.mask)]
    assert len(goals) >= 3
    d = sio.loadmat(mat)
    d["goals"] = goals.astype(np.float64)
    d["reach_grasps"] = np.zeros((len(goals), cfg.reach_tail_length, 9))
    sio.savemat(mat, d)
    return root, mat, cfg, model


def test_reference_runs_and_trajectories_match(parity_ws):
    root, mat, cfg, model = parity_ws
    name = os.path.splitext(os.path.basename(mat))[0]

    # --- the actual reference
    from omg_planner_tpu.io import ref_shims

    ref_shims.install(REFERENCE)
    ref_shims.configure_reference(root, scene_file=name, silent=True)
    from omg.core import PlanningScene as RefScene
    from omg import config as ref_config

    scene = RefScene(ref_config.cfg)
    scene.reset()
    info = scene.step()
    ref_traj = np.asarray(scene.planner.history_trajectories[-1])
    ref_flag = bool(info[-1]["terminate"])
    ref_goals = np.asarray(scene.planner.selected_goals)

    # --- ours, same precomputed goal set
    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.io.scene_io import load_mat_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    sd = load_mat_scene(mat)
    env, _ = env_from_mat_scene(cfg, mat, root, model=model, penalize=False)
    ps = PlanningScene(cfg, env)
    ps.set_precomputed_goals(sd["goals"], sd.get("reach_grasps"))
    res = ps.step(fast=False)

    assert res is not None
    assert bool(res.flag) == ref_flag
    # reference's len(info) includes its final info-only pass (planner.py:633)
    assert abs(int(res.steps_used) - len(info)) <= 1
    k = min(len(ref_goals), int(res.steps_used))
    our_goals = np.asarray(res.selected_goals)[:k]
    assert (our_goals == ref_goals[:k]).mean() >= 0.8
    if ref_flag:
        assert np.abs(np.asarray(res.traj) - ref_traj).max() < 0.05


@pytest.mark.parametrize("alg", ["FTL", "FTC", "Proj"])
def test_learner_algorithms_match_reference(parity_ws, alg):
    """The non-default online-learner algorithms agree with the actual
    reference end-to-end too (MD is covered by the main parity test;
    Exp's soft reset is covered at unit level in test_learner.py).
    Proj exercises the no-learner branch: the goal stays the
    closest-by-projection pick (``omg/planner.py:221-222``)."""
    root, mat, cfg, model = parity_ws
    name = os.path.splitext(os.path.basename(mat))[0]

    from omg_planner_tpu.io import ref_shims

    ref_shims.install(REFERENCE)
    ref_shims.configure_reference(root, scene_file=name, silent=True,
                                  ol_alg=alg)
    from omg.core import PlanningScene as RefScene
    from omg import config as ref_config

    scene = RefScene(ref_config.cfg)
    scene.reset()
    info = scene.step()
    ref_traj = np.asarray(scene.planner.history_trajectories[-1])
    ref_flag = bool(info[-1]["terminate"])
    ref_config.cfg.ol_alg = "MD"  # restore for other tests

    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.io.scene_io import load_mat_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    sd = load_mat_scene(mat)
    cfg2 = cfg.replace(ol_alg=alg)
    env, _ = env_from_mat_scene(cfg2, mat, root, model=model,
                                penalize=False)
    ps = PlanningScene(cfg2, env)
    ps.set_precomputed_goals(sd["goals"], sd.get("reach_grasps"))
    res = ps.step(fast=False)
    assert res is not None
    assert bool(res.flag) == ref_flag
    if ref_flag and np.asarray(res.traj).shape == ref_traj.shape:
        assert np.abs(np.asarray(res.traj) - ref_traj).max() < 0.05


def test_sdf_kernel_shim_matches_our_query(parity_ws):
    """The numpy CUDA-kernel port and our exact grid query agree on the
    same stacked scene (both reimplement kernel.cu:96-195)."""
    root, mat, cfg, model = parity_ws
    import jax.numpy as jnp

    from omg_planner_tpu.io import ref_shims
    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.ops.sdf import sdf_potentials

    env, _ = env_from_mat_scene(cfg, mat, root, model=model, penalize=False)
    scene_sdf = env.scene_sdf()
    params = env.cost_params()

    rng = np.random.default_rng(3)
    pts = rng.uniform([0.2, -0.4, 0.0], [0.8, 0.4, 0.5], (256, 3)) \
        .astype(np.float32)
    pot, grad, col = sdf_potentials(
        scene_sdf, params.inv_poses, jnp.asarray(pts), params.epsilons,
        params.padding_scales, params.clearances, params.disables)

    grids = np.asarray(scene_sdf.data)
    limits = np.asarray(scene_sdf.limits)
    pot2, grad2, col2 = ref_shims.sdf_loss_forward_np(
        np.asarray(params.inv_poses), grids, limits, pts,
        np.asarray(params.epsilons), np.asarray(params.padding_scales),
        np.asarray(params.clearances), np.asarray(params.disables))

    np.testing.assert_allclose(np.asarray(pot), pot2, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grad), grad2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(col), col2, atol=0)
