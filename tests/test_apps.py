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
    # kept demos are PHYSICS-verified (the reference's rew > 0 filter,
    # gen_data.py:153): the simulated lift reward rides along
    assert int(d["scene_sim_reward"]) == 1
    assert float(d["scene_sim_lifted_m"]) > 0.05


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


def test_process_shape_and_sdf_inspect_clis(tmp_path, capsys):
    """CLI parity: process_shape orchestration (reference
    process_shape.py:86-179) + sdf inspector (sdf_tools.py:201-246)."""
    import numpy as np
    from omg_planner_tpu.io.meshsdf import save_compound_obj
    from omg_planner_tpu.apps import process_shape, sdf_inspect

    obj = tmp_path / "block.obj"
    save_compound_obj(str(obj), np.array([[0.0, 0.0, 0.0, 0.03, 0.02, 0.04]]))
    process_shape.main(["-f", str(obj), "-a", "--target-dim", "16",
                        "--padding", "4"])
    out = capsys.readouterr().out
    assert "surface points" in out
    assert (tmp_path / "block_chomp.pkl").exists()
    assert (tmp_path / "block.xyz").exists()
    assert (tmp_path / "block.extent.txt").exists()
    assert (tmp_path / "block_convex.obj").exists()

    png = tmp_path / "m.png"
    exp = tmp_path / "re.pkl"
    sdf_inspect.main(["-f", str(tmp_path / "block_chomp.pkl"),
                      "-v", str(png), "-e", str(exp)])
    out = capsys.readouterr().out
    assert "sdf info:" in out
    assert png.exists() and exp.exists()
    sdf_inspect.main(["-f", str(exp)])  # round-trip loads


def test_kitchen_script_grammar_end_to_end(tmp_path):
    """Kitchen T/P/E/ONCE script drives pick -> place -> move through the
    synthetic cabinet (reference panda_kitchen_scene.py:440-607 grammar)."""
    from omg_planner_tpu.apps import kitchen
    from omg_planner_tpu.config import OMGConfig

    cfg = OMGConfig(silent=True, optim_steps=12, extra_smooth_steps=4,
                    goal_set_max_num=10, ik_seed_num=2, ik_max_iters=25,
                    learner_interp_steps=8)
    scene = kitchen.kitchen_scene(cfg)
    script = tmp_path / "script.txt"
    script.write_text("# demo\nONCE\nT mug\nP 0.0,0.25,0.0\nE 3\n")
    steps = kitchen.parse_script(str(script))
    assert [s[0] for s in steps] == ["ONCE", "T", "P", "E"]
    results = kitchen.run_script(scene, steps, fast=True)
    kinds = [r[0] for r in results]
    assert kinds == ["pick", "place", "move"]
    pick = results[0][2]
    assert pick is not None and bool(pick.flag)
    place_achieved, place_res = results[1][1], results[1][2]
    assert place_res is not None
    import numpy as np
    # the object landed near the commanded displacement
    assert np.linalg.norm(np.asarray(place_achieved)[:2, 3]
                          - np.array([0.52, -0.18 + 0.25])) < 0.15
    move = results[2][2]
    assert move is not None and np.isfinite(np.asarray(move.traj)).all()


def test_kitchen_exec_scores_steps():
    """``run_script(execute=True)`` attaches physics scorecards to pick
    and place steps (the reference executes every kitchen step in its
    PyBullet world)."""
    from omg_planner_tpu.apps import kitchen
    from omg_planner_tpu.config import OMGConfig

    cfg = OMGConfig(silent=True, optim_steps=12, extra_smooth_steps=4,
                    goal_set_max_num=10, ik_seed_num=2, ik_max_iters=25,
                    learner_interp_steps=8)
    scene = kitchen.kitchen_scene(cfg)
    results, reports = kitchen.run_script(
        scene, [("T", "mug"), ("P", [0.0, 0.25, 0.0])], fast=True,
        execute=True)
    assert [r[0] for r in results] == ["pick", "place"]
    assert 0 in reports and "lifted_m" in reports[0]
    assert reports[0]["reward"] == 1, reports[0]      # the pick lifts
    assert 1 in reports and "place_err_xy_m" in reports[1]
    assert reports[1]["carried"] == 1, reports[1]     # transported in-grip
