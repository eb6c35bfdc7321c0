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


def test_cascade_suite_wave_pipelined():
    """plan_cascade_suite: the wave-pipelined multi-scene form — succeeds
    on an easy scene, escalates (with goal-set reuse on the exact stage)
    on a budget-strangled one, and restores every session cfg."""
    from omg_planner_tpu.planner.cascade import plan_cascade_suite

    cfg_easy = CFG
    scenes = [(0, PlanningScene.synthetic(cfg_easy, scene_id=0,
                                          n_obstacles=2)),
              (1, PlanningScene.synthetic(cfg_easy, scene_id=1,
                                          n_obstacles=3))]
    outs = plan_cascade_suite(scenes, cfg_easy, goal_retries=1, chunk=2)
    assert set(outs) == {0, 1}
    for sid, out in outs.items():
        assert out.traj.shape[1] == 9
        assert np.isfinite(out.traj).all()
        assert out.backend in BACKENDS
        assert out.attempts >= 1
    assert any(o.flag for o in outs.values())
    for _sid, sc in scenes:
        assert sc.cfg == cfg_easy          # session cfg restored
        assert sc.env._scene_sdf is None   # device buffers dropped

    # budget-strangled: every backend fails -> results still returned,
    # attempts counts the waves, cfg restored
    cfg_tiny = CFG.replace(optim_steps=1, extra_smooth_steps=0,
                           pre_terminate=False)
    hard = [(7, PlanningScene.synthetic(cfg_tiny, scene_id=1,
                                        n_obstacles=3))]
    outs2 = plan_cascade_suite(hard, cfg_tiny, goal_retries=1, chunk=1)
    assert not outs2[7].flag
    assert outs2[7].attempts >= 2  # primary + at least one retry/backend
    assert hard[0][1].cfg == cfg_tiny


def test_cascade_budget_stops_further_attempts(monkeypatch):
    """budget_s (the reference cfg.timeout analog, omg/planner.py:629-630)
    must stop the cascade from launching more attempts once the wall is
    blown, returning the best-so-far instead of escalating."""
    import time
    import numpy as np
    from omg_planner_tpu.planner import cascade as cas

    calls = {"n": 0}

    class FakeInfo:
        collide = np.float32(3.0)
        reach = np.float32(0.0)
        cost = np.float32(1.0)

    class FakeRes:
        flag = np.bool_(False)
        info = FakeInfo()
        goal_idx = np.int32(0)
        goal_mask = None

    class FakeGoalSet:
        grasps = np.zeros((4, 9), np.float32)
        mask = np.ones(4, bool)

    class FakeScene:
        cfg = cas.OMGConfig(silent=True)
        goal_set = FakeGoalSet()

        def step(self, fast=True, goal_mask=None):
            calls["n"] += 1
            time.sleep(0.05)
            return FakeRes()

        def _sync_env_cfg(self):
            pass

    out = cas.plan_cascade(FakeScene(), backends=("analytic", "exact"),
                           goal_retries=10, budget_s=0.01)
    assert out is not None and not out.success
    # one attempt ran (the budget was already blown when retries began)
    assert calls["n"] == 1, calls
