"""The optional PyBullet execution harness (``apps/bullet_exec.py``).

pybullet cannot be installed in this image, so the harness's WIRING is
exercised against a recording test double implementing exactly the API
surface the module uses — shape selection per primitive kind,
static/dynamic mass split, position-control command stream, substep
count, and the lift-reward read.  On an image WITH pybullet the same
module runs unchanged against the real engine."""

import importlib
import sys
import types

import numpy as np
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.scene import PlanningScene


class FakeBullet(types.ModuleType):
    GUI, DIRECT = 1, 2
    GEOM_PLANE, GEOM_SPHERE, GEOM_CYLINDER, GEOM_BOX = 10, 11, 12, 13
    POSITION_CONTROL = 20

    def __init__(self):
        super().__init__("pybullet")
        self.shapes = []          # (geom, kwargs)
        self.bodies = []          # dicts
        self.commands = []        # (body, joint, mode, value)
        self.steps = 0
        self.connected = None

    def connect(self, mode):
        self.connected = mode
        return 7

    def setGravity(self, *a):
        self.gravity = a

    def setTimeStep(self, dt):
        self.dt = dt

    def createCollisionShape(self, geom, **kw):
        self.shapes.append((geom, kw))
        return len(self.shapes) - 1

    def createMultiBody(self, mass, shape, basePosition=(0, 0, 0),
                        baseOrientation=(0, 0, 0, 1)):
        self.bodies.append({"mass": mass, "shape": shape,
                            "pos": list(basePosition),
                            "quat": list(baseOrientation)})
        return len(self.bodies) - 1

    def loadURDF(self, path, useFixedBase=False):
        self.urdf = path
        self.bodies.append({"mass": 0, "shape": None, "urdf": path,
                            "pos": [0, 0, 0]})
        return len(self.bodies) - 1

    def setJointMotorControl2(self, body, joint, mode, target):
        self.commands.append((body, joint, mode, float(target)))

    def stepSimulation(self):
        self.steps += 1

    def getBasePositionAndOrientation(self, body):
        return tuple(self.bodies[body]["pos"]), (0, 0, 0, 1)

    def disconnect(self, cid):
        self.disconnected = cid


@pytest.fixture()
def bullet_exec(monkeypatch):
    fake = FakeBullet()
    monkeypatch.setitem(sys.modules, "pybullet", fake)
    import omg_planner_tpu.apps.bullet_exec as mod
    importlib.reload(mod)
    yield mod, fake
    sys.modules.pop("pybullet", None)
    importlib.reload(mod)          # restore the gated (no-pybullet) state


def test_env_builds_and_executes(bullet_exec):
    mod, fake = bullet_exec
    assert mod.HAVE_PYBULLET
    cfg = OMGConfig(silent=True)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=2)
    env = mod.BulletExecutionEnv(scene, urdf_path="panda.urdf")
    # every scene object became a body (+ plane + robot)
    assert len(env.bodies) == len(scene.env.objects)
    assert fake.urdf == "panda.urdf"
    # statics got mass 0, manipulands mass > 0
    for o in scene.env.objects:
        body = fake.bodies[env.bodies[o.name]]
        if o.name.startswith(("table", "shelf", "wall", "floor")):
            assert body["mass"] == 0.0
        else:
            assert body["mass"] > 0.0
        np.testing.assert_allclose(body["pos"], o.pose_mat[:3, 3],
                                   atol=1e-12)

    traj = np.tile(np.linspace(0, 1, 4)[:, None], (1, 9))
    env.execute_plan(traj)
    # position-control command per (waypoint x joint), SUBSTEPS per wp
    assert fake.steps == 4 * env.SUBSTEPS
    assert len(fake.commands) == 4 * 7
    assert all(m == fake.POSITION_CONTROL for _, _, m, _ in fake.commands)
    # last waypoint's commands reached the controller verbatim
    assert [c[3] for c in fake.commands[-7:]] == [1.0] * 7

    # lift reward thresholds on the target's height
    tname = scene.env.target.name
    fake.bodies[env.bodies[tname]]["pos"][2] = 0.5
    assert env.lift_reward(tname) == 1.0
    fake.bodies[env.bodies[tname]]["pos"][2] = 0.05
    assert env.lift_reward(tname) == 0.0
    env.close()
    assert fake.disconnected == env.cid


def test_shape_kinds_map_to_geoms(bullet_exec):
    mod, fake = bullet_exec
    from omg_planner_tpu.io.assets import make_primitive, pose_at

    cfg = OMGConfig(silent=True)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)
    env = mod.BulletExecutionEnv(scene)
    n0 = len(fake.shapes)
    sph = make_primitive("ball", "sphere", [0.03], pose_at([0, 0, 0.1]),
                         compute_grasp=False)
    cyl = make_primitive("can", "cylinder", [0.04, 0.1],
                         pose_at([0, 0.2, 0.1]), compute_grasp=False)
    box = make_primitive("block", "box", [0.04, 0.05, 0.06],
                         pose_at([0.2, 0, 0.1]), compute_grasp=False)
    for o, geom in ((sph, fake.GEOM_SPHERE), (cyl, fake.GEOM_CYLINDER),
                    (box, fake.GEOM_BOX)):
        env._add_primitive(o, 0.2)
        assert fake.shapes[-1][0] == geom, o.name
    # box half-extents are HALF the extents
    np.testing.assert_allclose(fake.shapes[-1][1]["halfExtents"],
                               np.asarray([0.04, 0.05, 0.06]) / 2)
    assert len(fake.shapes) == n0 + 3


def test_quaternion_convention_matches_pose_utils(bullet_exec):
    mod, fake = bullet_exec
    import jax.numpy as jnp

    from omg_planner_tpu.utils.pose import mat_to_quat, rot_y, rot_z

    r = np.asarray(rot_z(0.7) @ rot_y(-0.4))[:3, :3]
    xyzw = np.asarray(mod._mat_to_xyzw(r))
    wxyz = np.asarray(mat_to_quat(jnp.asarray(r, jnp.float32)))
    got = np.r_[xyzw[3], xyzw[:3]]
    if np.sign(got[0]) != np.sign(wxyz[0]):
        got = -got                     # q and -q are the same rotation
    np.testing.assert_allclose(got, wxyz, atol=1e-5)


def test_gated_without_pybullet():
    import omg_planner_tpu.apps.bullet_exec as mod
    if mod.HAVE_PYBULLET:              # real pybullet present: nothing to gate
        pytest.skip("pybullet installed")
    with pytest.raises(ImportError, match="pybullet is not installed"):
        mod._require()
