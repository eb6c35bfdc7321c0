"""Execution-verified planning (``planner/exec_verify.py``): the
simulated lift drives goal-blacklist replans — the round-5 lever that
recovers the r4 execution failures (VERDICT r4 item 2)."""

import numpy as np
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.exec_verify import (ExecVerifiedOut,
                                                 plan_execute_verified)
from omg_planner_tpu.planner.scene import PlanningScene


@pytest.fixture(scope="module")
def scene():
    cfg = OMGConfig(silent=True, optim_steps=15, extra_smooth_steps=5,
                    goal_set_max_num=12, ik_seed_num=3, ik_max_iters=30,
                    learner_interp_steps=10)
    return PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)


def test_verified_on_first_attempt(scene):
    out = plan_execute_verified(scene, exec_retries=2)
    assert out is not None and out.verified
    assert out.exec_attempts == 1
    assert out.report.reward == 1


def test_failed_lift_triggers_goal_blacklist_replan(scene, monkeypatch):
    """First execution 'fails', the loop must blacklist + replan and the
    second execution 'succeeds' — exercised by stubbing the stepper."""
    import omg_planner_tpu.physics as phys

    calls = {"n": 0, "trajs": []}
    real_report = phys.PhysExecReport(
        reward=1, lifted_m=0.3, hand_dist_m=0.1, moved_in_playback_m=0.0,
        grasp_impulse=0.1, finger_stop_m=0.02, lift_height_m=0.3)
    fail_report = real_report._replace(reward=0, lifted_m=0.0,
                                       hand_dist_m=0.5)

    def fake_execute(sc, traj, **kw):
        calls["n"] += 1
        calls["trajs"].append(np.asarray(traj).copy())
        return fail_report if calls["n"] == 1 else real_report

    monkeypatch.setattr(phys, "execute_plan", fake_execute)
    out = plan_execute_verified(scene, exec_retries=2)
    assert out.verified and out.exec_attempts == 2
    # the retry executed a DIFFERENT trajectory (new goal)
    assert not np.allclose(calls["trajs"][0], calls["trajs"][1])


def test_exhaustion_returns_least_bad(scene, monkeypatch):
    import omg_planner_tpu.physics as phys

    calls = {"n": 0}
    reports = [
        phys.PhysExecReport(0, 0.0, 0.5, 0.0, 0.1, 0.02, 0.3),
        phys.PhysExecReport(0, 0.2, 0.25, 0.0, 0.1, 0.02, 0.3),  # best
        phys.PhysExecReport(0, 0.0, 0.6, 0.0, 0.1, 0.02, 0.3),
    ]

    def fake_execute(sc, traj, **kw):
        r = reports[min(calls["n"], len(reports) - 1)]
        calls["n"] += 1
        return r

    monkeypatch.setattr(phys, "execute_plan", fake_execute)
    out = plan_execute_verified(scene, exec_retries=2)
    assert isinstance(out, ExecVerifiedOut)
    assert not out.verified
    assert out.exec_attempts == calls["n"]
    # least-bad by (hand_dist, -lifted): the second report
    assert out.report.hand_dist_m == pytest.approx(0.25)


def test_no_mass_model_returns_unverified(scene, monkeypatch):
    import omg_planner_tpu.physics as phys

    def raise_nmm(sc, traj, **kw):
        raise phys.NoMassModelError("stub")

    monkeypatch.setattr(phys, "execute_plan", raise_nmm)
    out = plan_execute_verified(scene, exec_retries=2)
    assert out is not None and not out.verified
    assert out.report is None
    assert bool(np.asarray(out.result.flag))


def test_plan_failure_routes_through_cascade(monkeypatch):
    """cascade=True recovers plan-level failures via the escalation
    cascade before execution retries apply."""
    import numpy as np
    from omg_planner_tpu.planner import exec_verify as ev

    class FakeRes:
        flag = np.bool_(True)
        traj = np.zeros((4, 9), np.float32)
        goal_idx = np.int32(0)
        goal_mask = None

    class FakeCascadeResult:
        result = FakeRes()

    calls = {"cascade": 0}

    def fake_cascade(scene, fast=True):
        calls["cascade"] += 1
        return FakeCascadeResult()

    class FakeGoalSet:
        grasps = np.zeros((4, 9), np.float32)
        mask = np.ones(4, bool)

    class FakeScene:
        goal_set = FakeGoalSet()

        def step(self, fast=True, goal_mask=None):
            return None                     # IK-FAIL refusal

    monkeypatch.setattr(ev, "plan_cascade", fake_cascade)

    import omg_planner_tpu.physics as phys
    ok = phys.PhysExecReport(1, 0.3, 0.1, 0.0, 0.1, 0.02, 0.3)
    monkeypatch.setattr(phys, "execute_plan", lambda sc, traj, **kw: ok)

    out = ev.plan_execute_verified(FakeScene(), exec_retries=1,
                                   cascade=True)
    assert calls["cascade"] == 1
    assert out is not None and out.verified


def test_plan_failure_without_cascade_returns_none(monkeypatch):
    from omg_planner_tpu.planner import exec_verify as ev

    class FakeScene:
        def step(self, fast=True, goal_mask=None):
            return None

    assert ev.plan_execute_verified(FakeScene(), exec_retries=1) is None


def test_cascade_backend_pinned_for_retries_then_restored(monkeypatch):
    """When the cascade recovered the plan on a DIFFERENT backend, the
    retry loop must re-plan under THAT backend's cfg (goal indices/masks
    only align with the goal set they were built from) and restore the
    session cfg on exit."""
    import numpy as np
    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.planner import exec_verify as ev

    base = OMGConfig(silent=True)            # sdf_analytic=True default
    assert base.sdf_analytic

    class FakeRes:
        flag = np.bool_(True)
        traj = np.zeros((4, 9), np.float32)
        goal_idx = np.int32(0)
        goal_mask = None

    class FakeCR:
        result = FakeRes()
        backend = "exact"

    class FakeGoalSet:
        grasps = np.arange(36, dtype=np.float32).reshape(4, 9)
        mask = np.ones(4, bool)

    cfgs_seen = []

    class FakeScene:
        cfg = base
        goal_set = FakeGoalSet()

        def step(self, fast=True, goal_mask=None):
            if goal_mask is None:
                return None              # primary plan refuses -> cascade
            cfgs_seen.append(self.cfg)   # retry re-plans: record the cfg
            r = FakeRes()
            r.goal_idx = np.int32(
                int(np.nonzero(goal_mask)[0][0]))
            return r

        def _sync_env_cfg(self):
            pass

    monkeypatch.setattr(ev, "plan_cascade", lambda sc, fast=True: FakeCR())

    import omg_planner_tpu.physics as phys
    fail = phys.PhysExecReport(0, 0.0, 0.5, 0.0, 0.1, 0.02, 0.3)
    ok = phys.PhysExecReport(1, 0.3, 0.1, 0.0, 0.1, 0.02, 0.3)
    calls = {"n": 0}

    def fake_exec(sc, traj, **kw):
        calls["n"] += 1
        return fail if calls["n"] == 1 else ok

    monkeypatch.setattr(phys, "execute_plan", fake_exec)

    sc = FakeScene()
    out = ev.plan_execute_verified(sc, exec_retries=2, cascade=True)
    assert out is not None and out.verified
    # the retry re-plan ran under the EXACT backend's cfg...
    assert cfgs_seen and all(not c.sdf_analytic for c in cfgs_seen)
    # ...and the session cfg was restored afterwards
    assert sc.cfg is base
