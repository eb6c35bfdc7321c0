"""Golden-trajectory regression: guards behavior across future rounds.

The snapshot is this framework's own output (created once, committed); any
numerical drift in FK / SDF / projection / learner changes it.  Regenerate
deliberately with:  python -m tests.test_golden
"""

import os

import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.scene import PlanningScene

# two snapshots: the voxel backend (round-1 numerics, sdf_analytic=False)
# and the grid-free analytic backend (the round-2 production default)
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_plan.npz")
GOLDEN_ANALYTIC = os.path.join(os.path.dirname(__file__),
                               "golden_plan_analytic.npz")
CFG = OMGConfig(optim_steps=10, extra_smooth_steps=3, goal_set_max_num=12,
                ik_seed_num=4, ik_max_iters=30, learner_interp_steps=10,
                silent=True)


def _run(cfg):
    scene = PlanningScene.synthetic(cfg, scene_id=5, n_obstacles=2)
    res = scene.step()
    assert res is not None
    return res


def _check(path, cfg):
    if not os.path.exists(path):
        import pytest
        pytest.skip("no golden snapshot (generate with python -m tests.test_golden)")
    res = _run(cfg)
    g = np.load(path)
    assert int(res.goal_idx) == int(g["goal_idx"])
    np.testing.assert_allclose(res.traj, g["traj"], atol=2e-3)
    assert bool(res.flag) == bool(g["flag"])


def test_golden_trajectory_voxel():
    _check(GOLDEN, CFG.replace(sdf_analytic=False))


def test_golden_trajectory_analytic():
    _check(GOLDEN_ANALYTIC, CFG)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    for path, cfg in [(GOLDEN, CFG.replace(sdf_analytic=False)),
                      (GOLDEN_ANALYTIC, CFG)]:
        res = _run(cfg)
        np.savez(path, traj=res.traj, goal_idx=int(res.goal_idx),
                 flag=bool(res.flag))
        print("wrote", path)
