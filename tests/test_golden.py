"""Golden-trajectory regression: guards behavior across future rounds.

The snapshot is this framework's own output (created once, committed); any
numerical drift in FK / SDF / projection / learner changes it.  Regenerate
deliberately with:  python -m tests.test_golden
"""

import os

import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.scene import PlanningScene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_plan.npz")
CFG = OMGConfig(optim_steps=10, extra_smooth_steps=3, goal_set_max_num=12,
                ik_seed_num=4, ik_max_iters=30, learner_interp_steps=10,
                silent=True)


def _run():
    scene = PlanningScene.synthetic(CFG, scene_id=5, n_obstacles=2)
    res = scene.step()
    assert res is not None
    return res


def test_golden_trajectory():
    if not os.path.exists(GOLDEN):
        import pytest
        pytest.skip("no golden snapshot (generate with python -m tests.test_golden)")
    res = _run()
    g = np.load(GOLDEN)
    assert int(res.goal_idx) == int(g["goal_idx"])
    np.testing.assert_allclose(res.traj, g["traj"], atol=2e-3)
    assert bool(res.flag) == bool(g["flag"])


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    res = _run()
    np.savez(GOLDEN, traj=res.traj, goal_idx=int(res.goal_idx),
             flag=bool(res.flag))
    print("wrote", GOLDEN)
