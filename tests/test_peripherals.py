"""Tests for point-cloud SDF, scene IO, task API, and visualization."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.io import scene_io
from omg_planner_tpu.io.assets import make_primitive, pose_at
from omg_planner_tpu.ops.pointsdf import sdf_from_points
from omg_planner_tpu.planner import tasks
from omg_planner_tpu.planner.scene import Env, PlanningScene, PointEnv


def test_point_sdf_distances():
    rng = np.random.default_rng(3)
    # points on a unit-ish sphere shell
    pts = rng.normal(size=(500, 3))
    pts = 0.2 * pts / np.linalg.norm(pts, axis=1, keepdims=True)
    f = sdf_from_points(pts, resolution=0.02, margin=0.1)
    # center of the shell is ~0.2 away from all points
    assert abs(f.get_distance(np.zeros(3)) - 0.2) < 0.05  # nearest-cell lookup
    # at a sample point the distance is ~0
    assert f.get_distance(pts[0]) < 0.03


def test_point_env_plan_smoke():
    cfg = OMGConfig(optim_steps=5, extra_smooth_steps=2, goal_set_max_num=4,
                    ik_seed_num=2, ik_max_iters=25, learner_interp_steps=6,
                    silent=True)
    env = PointEnv(cfg)
    rng = np.random.default_rng(4)
    cloud = rng.uniform([0.4, -0.2, 0.1], [0.7, 0.2, 0.3], (800, 3))
    env.compute_sdf_from_points(cloud.astype(np.float32))
    scene = PlanningScene(cfg, env)
    # external grasps: hand poses from known reachable configs
    from omg_planner_tpu.models import panda
    qs = np.array([
        [0.0, -0.8, 0.0, -2.0, 0.0, 1.6, 0.785, 0.04, 0.04],
        [0.2, -0.9, 0.1, -2.1, 0.0, 1.5, 0.6, 0.04, 0.04]])
    import jax
    hands = np.array(jax.vmap(
        lambda q: panda.hand_pose(scene.model, q))(jnp.asarray(qs, jnp.float32)))
    scene.external_grasps = hands
    res = scene.step()
    assert res is not None
    assert np.isfinite(res.traj).all()


def test_scene_io_roundtrip(tmp_path):
    objs, target = [
        make_primitive("mug", "cylinder", [0.04, 0.1], pose_at([0.5, 0, 0.3]),
                       target=True),
        make_primitive("tbl", "box", [1, 1, 0.3], pose_at([0.6, 0, 0]),
                       compute_grasp=False, delta=0.02),
    ], "mug"
    p = str(tmp_path / "scene.npz")
    scene_io.save_npz_scene(p, objs, target, goals=np.zeros((3, 9)))
    d = scene_io.load_npz_scene(p)
    assert d["target_name"] == "mug"
    assert d["poses"].shape == (2, 4, 4)
    assert d["goals"].shape == (3, 9)


def test_attached_collision_points():
    from omg_planner_tpu.models import panda
    model = panda.load_panda(collision_point_num=12)
    rng = np.random.default_rng(5)
    obj_points = rng.uniform(-0.03, 0.03, (500, 3))
    rel = np.eye(4)
    rel[:3, 3] = [0.0, 0.0, 0.1]  # object 10cm in front of the hand
    new_pts = tasks.attached_collision_points(model, rel, obj_points)
    assert new_pts.shape == np.asarray(model.collision_points).shape
    # finger links' points are now the object's (moved from the fingertips)
    assert not np.allclose(np.asarray(new_pts[-1]),
                           np.asarray(model.collision_points[-1]))


def test_place_target_pipeline():
    cfg = OMGConfig(optim_steps=4, extra_smooth_steps=2, goal_set_max_num=4,
                    ik_seed_num=2, ik_max_iters=25, learner_interp_steps=6,
                    silent=True)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=0)
    grasp_conf = np.array([0.0, -0.8, 0.0, -2.0, 0.0, 1.6, 0.785, 0.04, 0.04])
    target = scene.env.target
    place = target.pose_mat.copy()
    place[:3, 3] += [0.0, 0.15, 0.0]
    res, achieved = tasks.place_target(scene, grasp_conf, place)
    # attachment cleaned up regardless of plan outcome
    assert not scene.env.target.attached
    assert achieved.shape == (4, 4)


def test_place_target_rollback_on_failure():
    """A placement with NO reachable IK must roll the scene back
    (reference failure path, ``real_world/trial.py:123-131``;
    VERDICT r2 item 7)."""
    cfg = OMGConfig(optim_steps=4, extra_smooth_steps=2, goal_set_max_num=4,
                    ik_seed_num=2, ik_max_iters=25, learner_interp_steps=6,
                    silent=True)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=0)
    grasp_conf = np.array([0.0, -0.8, 0.0, -2.0, 0.0, 1.6, 0.785, 0.04, 0.04])
    target = scene.env.target
    old_pose = target.pose_mat.copy()
    base_points = scene.model.collision_points
    # 2 m away: outside the Panda workspace, every placement IK fails
    place = target.pose_mat.copy()
    place[:3, 3] = [2.0, 0.0, 0.1]
    res, achieved = tasks.place_target(scene, grasp_conf, place)
    assert res is None                       # the IK-FAIL refusal path
    # full rollback: pose restored, detached, cfg + hand points restored
    np.testing.assert_allclose(achieved, old_pose)
    np.testing.assert_allclose(scene.env.target.pose_mat, old_pose)
    assert not scene.env.target.attached
    assert scene.env.target.rel_hand_pose is None
    assert target.name not in scene.cfg.disable_collision_set
    assert not scene.cfg.use_standoff or cfg.use_standoff
    assert scene.model.collision_points is base_points
    # the session still plans after the rollback
    scene.start = np.asarray(
        [0.0, -1.285, 0, -2.356, 0.0, 1.571, 0.785, 0.04, 0.04])
    res2 = scene.step(fast=True)
    assert res2 is not None


def test_render_frame():
    pytest.importorskip("matplotlib")
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.viz.render import render_frame
    model = panda.load_panda()
    objs = [make_primitive("mug", "cylinder", [0.04, 0.1],
                           pose_at([0.5, 0, 0.3]))]
    img = render_frame(model, objs,
                       np.array([0, -1.2, 0, -2.3, 0, 1.5, 0.8, 0.04, 0.04]))
    assert img.shape == (480, 640, 3)
    assert img.std() > 1  # actually drew something


def test_render_execution_replay():
    """Physics-replay frames: the target follows the trace poses and its
    scene pose is restored afterwards."""
    pytest.importorskip("matplotlib")
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.viz.render import render_execution
    model = panda.load_panda()
    objs = [make_primitive("mug", "cylinder", [0.04, 0.1],
                           pose_at([0.5, 0, 0.3]))]
    old = objs[0].pose_mat.copy()
    q = np.array([0, -1.2, 0, -2.3, 0, 1.5, 0.8, 0.04, 0.04])
    configs = np.tile(q, (40, 1))
    xs = np.linspace([0.5, 0, 0.3], [0.5, 0, 0.6], 40)
    quats = np.tile([1.0, 0, 0, 0], (40, 1))
    frames = render_execution(model, objs, 0, configs, xs, quats, every=20)
    assert len(frames) == 2 and frames[0].shape == (480, 640, 3)
    np.testing.assert_allclose(objs[0].pose_mat, old)  # pose restored


def test_camera_observation():
    from omg_planner_tpu.viz.camera import (back_project,
                                            render_point_observation)
    objs = [
        make_primitive("mug", "cylinder", [0.032, 0.1],
                       pose_at([0.5, 0.0, 0.3]), compute_grasp=False),
        make_primitive("box", "box", [0.05, 0.05, 0.1],
                       pose_at([0.5, 0.2, 0.3]), compute_grasp=False),
    ]
    pts, labels, depth, seg = render_point_observation(objs)
    assert len(pts) > 50
    assert set(np.unique(labels)).issubset({0, 1})
    assert np.isfinite(depth).sum() > 50
    # back-projection lands near the observed points
    bp = back_project(depth, np.array([
        [-0.9351, 0.3518, 0.0428, 0.3037],
        [0.2065, 0.639, -0.741, 0.132],
        [-0.2881, -0.684, -0.6702, 1.8803],
        [0, 0, 0, 1.0]]), 131.25, 131.25)
    assert bp.shape[1] == 3
    center = bp.mean(0)
    assert np.linalg.norm(center - [0.5, 0.1, 0.3]) < 0.25


def test_precomputed_goal_scene():
    from omg_planner_tpu.planner.scene import PlanningScene
    cfg = OMGConfig(optim_steps=5, extra_smooth_steps=2, goal_set_max_num=8,
                    use_standoff=False, silent=True)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=0)
    goals = np.tile(np.array(
        [0.2, -0.9, 0.1, -2.1, 0.0, 1.5, 0.6, 0.04, 0.04]), (3, 1))
    goals += np.random.default_rng(0).normal(scale=0.05, size=goals.shape)
    goals[:, 7:] = 0.04
    scene.set_precomputed_goals(goals)
    res = scene.step()
    assert res is not None
    # the final configuration is one of the provided goals
    d = np.linalg.norm(res.traj[-1][None] - goals, axis=1)
    assert d.min() < 0.05


def test_reference_format_loaders(tmp_path):
    """Reference data-format compatibility: .sdf text, .pth, .mat."""
    from omg_planner_tpu.ops.sdf import SignedDensityField
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(4, 3, 2))
    # .sdf text: x-fastest value order (sdf_tools.py:168-184)
    lines = ["4 3 2", "-0.1 -0.2 -0.3", "0.05"]
    for k in range(2):
        for j in range(3):
            for i in range(4):
                lines.append(str(float(vals[i, j, k])))
    p = tmp_path / "vol.sdf"
    p.write_text("\n".join(lines) + "\n")
    f = SignedDensityField.from_sdf_file(str(p))
    np.testing.assert_allclose(f.data, vals, atol=1e-6)
    assert f.delta == 0.05

    # .pth: stored [1,1,X,Y,Z], loaded with the reference's (1,0,2) permute
    import torch
    vol = torch.from_numpy(rng.normal(size=(1, 1, 5, 4, 3)).astype(np.float32))
    torch.save({"sdf_torch": vol,
                "min_coords": torch.zeros(3),
                "max_coords": torch.ones(3),
                "delta": torch.tensor([0.01])}, tmp_path / "v.pth")
    g = SignedDensityField.from_pth(str(tmp_path / "v.pth"))
    np.testing.assert_allclose(
        g.data, vol[0, 0].permute(1, 0, 2).numpy(), atol=1e-6)

    # .mat scene files
    import scipy.io as sio
    from omg_planner_tpu.io.scene_io import load_mat_scene
    sio.savemat(tmp_path / "s.mat", {
        "pose": np.tile(np.eye(4), (2, 1, 1)),
        "path": ["data/objects/mug ", "data/objects/table "],
        "goals": np.zeros((3, 9)),
        "target_name": "mug"})
    d = load_mat_scene(str(tmp_path / "s.mat"))
    assert d["target_name"] == "mug"
    assert d["pose"].shape == (2, 4, 4)
    assert [pp.strip() for pp in d["path"]] == [
        "data/objects/mug", "data/objects/table"]
    assert d["goals"].shape == (3, 9)
