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


def test_antipodal_friction_cone():
    """Synthetic pinch geometry: pad-facing normals pass, glancing
    normals fail; analytic-box normals come out axis-aligned."""
    import numpy as np
    from omg_planner_tpu.planner.validate import (
        _grasp_antipodal, _target_surface_normals_obj)
    from omg_planner_tpu.io.assets import make_primitive, pose_at

    hand = np.eye(4)  # grasp center at local z=0.103
    # two contact points straddling y with normals facing the pads
    pts = np.array([[0.0, 0.02, 0.103], [0.0, -0.02, 0.103]])
    n_good = np.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    assert _grasp_antipodal(hand, pts, n_good, 0.08)
    # glancing contact: normals orthogonal to the pad travel -> slips
    n_bad = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    assert not _grasp_antipodal(hand, pts, n_bad, 0.08)
    # one-sided contact fails even in the cone
    n_one = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    assert not _grasp_antipodal(hand, pts, n_one, 0.08)

    box = make_primitive("b", "box", [0.06, 0.06, 0.1],
                         pose_at([0.0, 0.0, 0.0]), compute_grasp=False)
    pts_obj = np.array([[0.03, 0.0, 0.0], [-0.03, 0.0, 0.0],
                        [0.0, 0.03, 0.0], [0.0, 0.0, 0.05]])
    n = _target_surface_normals_obj(box, pts_obj)
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(n[1], [-1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(n[2], [0, 1, 0], atol=1e-3)
    np.testing.assert_allclose(n[3], [0, 0, 1], atol=1e-3)
