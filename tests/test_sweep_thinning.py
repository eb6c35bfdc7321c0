"""learner_sweep_every: thinned learner sweeps still plan correctly."""

import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.scene import PlanningScene

CFG = OMGConfig(optim_steps=8, extra_smooth_steps=3, goal_set_max_num=12,
                ik_seed_num=3, ik_max_iters=30, learner_interp_steps=8,
                silent=True)


def test_thinned_sweep_plans():
    scene = PlanningScene.synthetic(CFG.replace(learner_sweep_every=2),
                                    scene_id=0, n_obstacles=2)
    res = scene.step()
    assert res is not None and bool(res.flag)
    assert float(res.info.reach) < 0.01


def test_default_unchanged():
    # k=1 must replan bit-identically to the committed default (the
    # static branch traces identical HLO when the knob is off)
    a = PlanningScene.synthetic(CFG, scene_id=0, n_obstacles=2).step()
    b = PlanningScene.synthetic(CFG.replace(learner_sweep_every=1),
                                scene_id=0, n_obstacles=2).step()
    np.testing.assert_array_equal(np.asarray(a.traj), np.asarray(b.traj))
