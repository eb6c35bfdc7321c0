"""Application-layer tests: kitchen scripts, demo generation, suite runner."""

import numpy as np
import pytest

from omg_planner_tpu.config import OMGConfig

SMALL = OMGConfig(optim_steps=4, extra_smooth_steps=2, goal_set_max_num=6,
                  ik_seed_num=2, ik_max_iters=20, learner_interp_steps=5,
                  silent=True)


def test_kitchen_script_parse(tmp_path):
    from omg_planner_tpu.apps.kitchen import parse_script
    p = tmp_path / "s.txt"
    p.write_text("# demo\nONCE\nT mug\nP 0.0,0.25,0.0,1\nE 2\n")
    steps = parse_script(str(p))
    assert steps == [("ONCE",), ("T", "mug"), ("P", [0.0, 0.25, 0.0, 1.0]),
                     ("E", 2)]


def test_kitchen_pick_runs():
    from omg_planner_tpu.apps.kitchen import kitchen_scene, run_script
    scene = kitchen_scene(SMALL)
    results = run_script(scene, [("T", "mug")])
    kind, what, res = results[0]
    assert kind == "pick"
    assert res is not None and np.isfinite(res.traj).all()


def test_gen_demos(tmp_path):
    from omg_planner_tpu.apps.gen_demos import generate
    kept = generate(2, str(tmp_path), cfg=SMALL, n_obstacles=1)
    assert kept >= 1
    import glob
    files = glob.glob(str(tmp_path / "demo_*.npz"))
    assert len(files) == kept
    d = dict(np.load(files[0], allow_pickle=True))
    assert d["traj"].shape[1] == 9
    assert len(d["goals"]) >= 1


def test_suite_runner_resumes(tmp_path):
    from omg_planner_tpu.planner.runner import SuiteRunner
    r = SuiteRunner(str(tmp_path), SMALL, n_obstacles=1)
    out = r.run(range(2))
    assert out["total"] == 2
    # resume: nothing pending, fast no-op
    r2 = SuiteRunner(str(tmp_path), SMALL, n_obstacles=1)
    assert r2.pending(range(2)) == []
    out2 = r2.run(range(2))
    assert out2["total"] == 2
    # result shards exist
    d = dict(np.load(tmp_path / "scene_0.npz"))
    assert "traj" in d and "success" in d
    assert "valid" in d  # execution-validation grade rides along
