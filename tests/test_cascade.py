"""Backend escalation cascade (planner/cascade.py)."""

import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.cascade import BACKENDS, plan_cascade
from omg_planner_tpu.planner.scene import PlanningScene

CFG = OMGConfig(optim_steps=8, extra_smooth_steps=3, goal_set_max_num=12,
                ik_seed_num=3, ik_max_iters=30, learner_interp_steps=8,
                silent=True)


def test_cascade_stops_at_first_success():
    scene = PlanningScene.synthetic(CFG, scene_id=0, n_obstacles=2)
    out = plan_cascade(scene)
    assert out is not None
    assert out.success and bool(np.asarray(out.result.flag))
    assert out.backend == "analytic" and out.attempts == 1
    # the session cfg is restored (analytic default untouched)
    assert scene.cfg == CFG


def test_cascade_escalates_and_returns_least_bad():
    # strangle the budget so every backend fails: the cascade must try
    # both and hand back the least-bad attempt by (collide, reach, cost)
    cfg = CFG.replace(optim_steps=1, extra_smooth_steps=0,
                      pre_terminate=False)
    scene = PlanningScene.synthetic(cfg, scene_id=1, n_obstacles=3)
    out = plan_cascade(scene, backends=("analytic", "exact"))
    assert out is not None
    assert not out.success
    # one primary + up to goal_retries blacklist retries per backend
    assert 2 <= out.attempts <= 2 * (1 + 3)
    assert out.backend in BACKENDS
    assert scene.cfg == cfg
    # a real trajectory came back (finite, fingers clamped)
    traj = np.asarray(out.result.traj)
    assert np.isfinite(traj).all()
    assert traj[:, -2:].min() >= -1e-6 and traj[:, -2:].max() <= 0.04 + 1e-6


def test_cascade_exact_backend_actually_runs():
    # force the fallback order to exact-first: the result must carry the
    # exact backend's label when it succeeds there
    scene = PlanningScene.synthetic(CFG, scene_id=0, n_obstacles=2)
    out = plan_cascade(scene, backends=("exact",))
    assert out is not None and out.attempts == 1
    assert out.backend == "exact"
