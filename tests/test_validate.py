"""Execution validator (physics-harness stand-in): a successful plan on a
clean scene passes all three checks; corrupted trajectories are caught."""

import numpy as np
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.scene import PlanningScene
from omg_planner_tpu.planner.validate import validate_execution


@pytest.fixture(scope="module")
def planned():
    cfg = OMGConfig(silent=True, optim_steps=15, extra_smooth_steps=5,
                    goal_set_max_num=12, ik_seed_num=3, ik_max_iters=30,
                    learner_interp_steps=10)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)
    res = scene.step(fast=True)
    assert res is not None and bool(res.flag)
    return scene, np.asarray(res.traj)


def test_successful_plan_validates(planned):
    scene, traj = planned
    rep = validate_execution(scene, traj)
    assert rep.swept_collision_points == 0, rep
    assert rep.grasp_ok, rep
    # the lift may clip dense clutter in principle; on this clean scene it
    # must be free
    assert rep.lift_collision_points == 0, rep
    assert rep.valid


def test_corrupted_trajectory_is_caught(planned):
    scene, traj = planned
    bad = traj.copy()
    # drive a mid-trajectory waypoint into the table surface
    bad[len(bad) // 2, 1] = 1.6   # shoulder deep down
    bad[len(bad) // 2, 3] = -0.2
    rep = validate_execution(scene, bad)
    assert rep.swept_collision_points > 0
    assert not rep.valid


def test_endpoint_away_from_target_fails_grasp(planned):
    scene, traj = planned
    bad = traj.copy()
    bad[-1] = scene.start  # "grasp" at the home configuration
    rep = validate_execution(scene, bad)
    assert not rep.grasp_ok
    assert not rep.valid
