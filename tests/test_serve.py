"""Headless planning service: request round-trip, errors, warm reuse."""

import json
import threading
import urllib.request

import numpy as np

from omg_planner_tpu.apps.serve import make_server
from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.io.assets import pose_at

PORT = 8811


def _small_cfg():
    return OMGConfig(silent=True, optim_steps=12, extra_smooth_steps=4,
                     goal_set_max_num=10, ik_seed_num=2, ik_max_iters=25,
                     learner_interp_steps=8)


def _post(path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", method="POST",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _scene_body():
    return {
        "objects": [
            {"name": "table", "kind": "box", "extents": [0.9, 1.2, 0.04],
             "pose": np.asarray(pose_at([0.55, 0.0, 0.16])).ravel().tolist()},
            {"name": "mug", "kind": "cylinder", "extents": [0.045, 0.1],
             "pose": np.asarray(pose_at([0.55, 0.1, 0.23])).ravel().tolist(),
             "target": True},
        ],
    }


def test_serve_plan_roundtrip():
    srv = make_server(PORT, _small_cfg())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/health") as r:
            h = json.loads(r.read())
        assert h["ok"]

        code, out = _post("/plan", _scene_body())
        assert code == 200, out
        traj = np.asarray(out["traj"])
        assert traj.shape[1] == 9 and np.isfinite(traj).all()
        assert out["n_goals"] > 0
        assert out["timings"]["plan_s"] > 0

        # warm second request: staging only, no recompile (much faster)
        code2, out2 = _post("/plan", _scene_body())
        assert code2 == 200
        assert out2["timings"]["stage_s"] < out["timings"]["stage_s"]

        # malformed: unknown cfg field
        bad = _scene_body()
        bad["cfg"] = {"not_a_field": 1}
        code3, out3 = _post("/plan", bad)
        assert code3 == 400 and "unknown cfg" in out3["error"]

        # no target object
        nt = _scene_body()
        nt["objects"][1]["target"] = False
        code4, out4 = _post("/plan", nt)
        assert code4 == 400

        # pipelined batch endpoint (the plan_pipelined production path)
        body = _scene_body()
        b2 = _scene_body()
        b2["objects"][1]["pose"] = np.asarray(
            pose_at([0.5, -0.12, 0.23])).ravel().tolist()
        code5, out5 = _post("/plan_batch",
                            {"scenes": [body, b2], "pipeline_depth": 2})
        assert code5 == 200, out5
        assert len(out5["results"]) == 2
        for r5 in out5["results"]:
            assert "traj" in r5 and np.isfinite(
                np.asarray(r5["traj"])).all()
        assert out5["plans_per_s"] > 0

        # batch errors surface as 400s
        code6, out6 = _post("/plan_batch", {"scenes": []})
        assert code6 == 400

        # physics-gated endpoint: plan + simulated lift scorecard
        code7, out7 = _post("/execute", _scene_body())
        assert code7 == 200, out7
        assert "execution" in out7 and "reward" in out7["execution"]
        if out7["flag"]:
            assert out7["execution"]["reward"] in (0, 1)
            assert out7["timings"]["exec_s"] > 0

        # execution-verified mode: failed lifts trigger goal-blacklist
        # replans; the response reports the attempt count + verdict and
        # carries the (possibly re-planned) verified trajectory
        body8 = _scene_body()
        body8["exec_retries"] = 2
        code8, out8 = _post("/execute", body8)
        assert code8 == 200, out8
        if out8["flag"] and "skipped" not in out8["execution"]:
            assert out8["execution"]["exec_attempts"] >= 1
            assert out8["execution"]["verified"] in (True, False)
            assert np.isfinite(np.asarray(out8["traj"])).all()
    finally:
        srv.shutdown()


def test_plan_fresh_matches_two_dispatch():
    """The fused fresh-request program (scene.plan_fresh: goal-set build
    + init + plan in ONE dispatch) must reproduce the staged
    build-then-plan path bit-comparably, and fill the staged cache so
    the next request takes the repeat path."""
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = _small_cfg()
    s1 = PlanningScene.synthetic(cfg, scene_id=2, n_obstacles=1)
    fused = s1.plan_fresh()
    assert fused is not None
    r_f, mask = fused
    assert s1.has_staged()
    s2 = PlanningScene.synthetic(cfg, scene_id=2, n_obstacles=1)
    r_s = s2.step(fast=True)
    assert bool(np.asarray(r_f.flag)) == bool(np.asarray(r_s.flag))
    np.testing.assert_allclose(np.asarray(r_f.traj),
                               np.asarray(r_s.traj), atol=2e-3)
    # unsupported modes fall back to the general path
    s3 = PlanningScene.synthetic(cfg.replace(dynamic_timestep=True),
                                 scene_id=2, n_obstacles=1)
    assert s3.plan_fresh() is None
