"""Inspector server: /state rendering data + click-to-pick/place driving
the task layer (VERDICT r1 item 10)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.apps.inspector import InspectorApp, make_server
from omg_planner_tpu.planner.scene import PlanningScene


@pytest.fixture(scope="module")
def server():
    cfg = OMGConfig(silent=True, optim_steps=15, extra_smooth_steps=5,
                    goal_set_max_num=12, ik_seed_num=3, ik_max_iters=30,
                    learner_interp_steps=10)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)
    app = InspectorApp(scene)
    srv = make_server(app, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", app
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=600) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def test_page_and_state(server):
    base, app = server
    status, page = _get(base + "/")
    assert status == 200 and b"scene inspector" in page
    status, raw = _get(base + "/state")
    state = json.loads(raw)
    assert status == 200
    names = [o["name"] for o in state["objects"]]
    assert any(o["target"] for o in state["objects"])
    assert len(state["robot_points"]) > 10
    assert state["message"] == "ready"


def test_click_pick_then_place(server):
    base, app = server
    target = app.scene.env.target
    x, y = float(target.pose_mat[0, 3]), float(target.pose_mat[1, 3])
    status, res = _post(base + "/plan", {"action": "pick", "x": x, "y": y})
    assert status == 200
    assert res["ok"], res["message"]
    traj = np.asarray(res["traj"])
    assert traj.ndim == 2 and np.isfinite(traj).all()

    # the ee path for the plan shows up in /state
    _, raw = _get(base + "/state")
    assert len(json.loads(raw)["ee_path"]) > 3

    status, res2 = _post(base + "/plan",
                         {"action": "place", "x": x + 0.08, "y": y - 0.1})
    assert status == 200
    # placement may legitimately fail on a cluttered draw, but the request
    # must round-trip with a coherent message
    assert "message" in res2
    if res2["ok"]:
        assert np.isfinite(np.asarray(res2["achieved"])).all()


def test_click_far_from_objects(server):
    base, _ = server
    _, res = _post(base + "/plan", {"action": "pick", "x": -5.0, "y": 5.0})
    assert not res["ok"]
    assert "no object" in res["message"]


def test_render_png_endpoint(server):
    url, _app = server
    with urllib.request.urlopen(f"{url}/render.png") as r:
        data = r.read()
        ctype = r.headers["Content-Type"]
    assert ctype == "image/png"
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 500
