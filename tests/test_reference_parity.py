"""Reference-format round trip: fixture data in the EXACT download formats
(``io/ref_fixtures.py``) through the real-data loaders
(``io/reference_data.py``) into a full plan.

This is the committed half of the parity harness (VERDICT r1 item 5):
the loaders get a real-format consumer, and ``scripts/parity_run.py`` can
point the same code at the actual OMG-Planner download to diff
trajectories against the reference.
"""

import os

import numpy as np
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.io import ref_fixtures
from omg_planner_tpu.io.assets import synthetic_grasp_db
from omg_planner_tpu.io.reference_data import (
    env_from_mat_scene, load_grasp_db, load_reference_object)
from omg_planner_tpu.ops.sdf import SignedDensityField


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("refdata")
    ref_fixtures.make_fixture_tree(str(root))
    return str(root)


def test_grasp_db_round_trip(fixture_root):
    """The stored transforms survive the loader's rotZ(pi/2)
    post-multiply exactly (omg/planner.py:485)."""
    want = synthetic_grasp_db("box", [0.05, 0.05, 0.14])
    got = load_grasp_db(
        os.path.join(fixture_root, "data/grasps/simulated/fixture_box.npy"),
        "fixture_box")
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_chomp_pth_round_trip(fixture_root):
    """.pth writer + loader (with its axis permute) reproduce the
    analytic SDF bit-for-bit."""
    sdf = SignedDensityField.from_analytic(
        "box", [0.05, 0.05, 0.14], delta=0.0075)
    loaded = SignedDensityField.from_pth(os.path.join(
        fixture_root, "data/objects/fixture_box",
        "model_normalized_chomp.pth"))
    np.testing.assert_allclose(loaded.data, sdf.data, atol=1e-7)
    np.testing.assert_allclose(loaded.origin, sdf.origin, atol=1e-12)
    assert loaded.delta == pytest.approx(sdf.delta)


def test_reference_object_loader(fixture_root):
    obj = load_reference_object(
        fixture_root, "data/objects/fixture_box", np.eye(4), target=True,
        cfg=OMGConfig(silent=True))
    assert obj.grasps_poses.shape[0] > 10
    assert obj.points is not None and obj.points.shape[1] == 3
    assert obj.extents is not None
    # inside penalty applied at load, like core.py:111
    assert obj.sdf.data.min() < -0.01


def test_mat_scene_to_plan(fixture_root):
    """Full pipeline on reference-format data: .mat scene -> Env ->
    goal set -> plan, with a success verdict."""
    cfg = OMGConfig(silent=True, optim_steps=25, extra_smooth_steps=8,
                    goal_set_max_num=20, ik_seed_num=3, ik_max_iters=35,
                    learner_interp_steps=10)
    mat = os.path.join(fixture_root, "data/scenes/fixture_scene.mat")
    env, scene_dict = env_from_mat_scene(cfg, mat, fixture_root)
    assert [o.name for o in env.objects] == ["fixture_box", "fixture_cyl"]
    assert env.target.name == "fixture_box"

    from omg_planner_tpu.planner.scene import PlanningScene

    ps = PlanningScene(cfg, env)
    res = ps.step(fast=True)
    assert res is not None
    assert bool(res.flag), (int(res.info.collide), float(res.info.smooth))
