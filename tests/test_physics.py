"""Native physics execution harness (the role of the reference's PyBullet
integration test, ``bullet/panda_scene.py:424-504``): a planned grasp
actually lifts the target in the rigid-body stepper and scores the lift
reward; bad grasps fail honestly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.scene import PlanningScene
from omg_planner_tpu.physics import (BodyState, execute_plan, execute_place,
                                     rollout, body_spec_from_primitive)
from omg_planner_tpu.physics import rigid


def _cube_spec(half=0.03, density=300.0):
    s = np.asarray([half] * 3, np.float32)
    pts = np.random.RandomState(0).uniform(-half, half, (200, 3))
    pts = pts / np.maximum(np.abs(pts).max(-1, keepdims=True) / half, 1e-9)
    return body_spec_from_primitive(0, s, pts.astype(np.float32),
                                    density=density)


def _table_world(z=0.0):
    """A thick slab whose top surface is at ``z``."""
    return rigid.StaticWorld(
        kinds=jnp.asarray([0], jnp.int32),
        halfs=jnp.asarray([[1.0, 1.0, 0.5]], jnp.float32),
        rounds=jnp.asarray([0.0], jnp.float32),
        inv_poses=jnp.asarray(
            [np.linalg.inv(np.diag([1.0, 1.0, 1.0, 1.0])
                           + np.array([[0, 0, 0, 0], [0, 0, 0, 0],
                                       [0, 0, 0, z - 0.5], [0, 0, 0, 0]]))],
            jnp.float32),
        mask=jnp.asarray([1.0], jnp.float32))


def _free_track(n, k=4):
    """A robot track far away from everything (no robot contacts)."""
    return jnp.full((n + 1, k, 3), 50.0, jnp.float32)


def test_free_fall_matches_gravity():
    spec = _cube_spec()
    world = rigid.StaticWorld(            # inactive dummy collider
        kinds=jnp.asarray([0], jnp.int32),
        halfs=jnp.ones((1, 3), jnp.float32),
        rounds=jnp.zeros((1,), jnp.float32),
        inv_poses=jnp.eye(4, dtype=jnp.float32)[None],
        mask=jnp.zeros((1,), jnp.float32))
    pp = rigid.default_params()._replace(
        damp_lin=jnp.asarray(0.0, jnp.float32))
    st0 = BodyState(x=jnp.asarray([0.0, 0.0, 1.0]),
                    q=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
                    v=jnp.zeros(3), w=jnp.zeros(3))
    n = 120                                # 0.5 s
    final, _ = rollout(spec, world, pp, st0, _free_track(n))
    t = n * float(pp.dt)
    # symplectic Euler: z = z0 - g*dt*(1+2+..+n)*dt
    expect = 1.0 - 9.81 * float(pp.dt) ** 2 * n * (n + 1) / 2.0
    assert abs(float(final.x[2]) - expect) < 1e-3, (float(final.x[2]), expect)
    assert abs(float(final.v[2]) + 9.81 * t) < 1e-2


def test_resting_contact_is_stable():
    """A cube dropped 1 mm above the table settles and stays put."""
    spec = _cube_spec()
    world = _table_world(0.0)
    pp = rigid.default_params()
    st0 = BodyState(x=jnp.asarray([0.0, 0.0, 0.031]),
                    q=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
                    v=jnp.zeros(3), w=jnp.zeros(3))
    final, trace = rollout(spec, world, pp, st0, _free_track(240))
    # settled on the surface (within slop), not sunk, not launched
    assert abs(float(final.x[2]) - 0.030) < 2e-3, float(final.x[2])
    assert float(jnp.linalg.norm(final.v)) < 0.02
    assert float(jnp.abs(trace["x"][120:, :2]).max()) < 1e-3  # no drift


@pytest.fixture(scope="module")
def planned():
    cfg = OMGConfig(silent=True, optim_steps=15, extra_smooth_steps=5,
                    goal_set_max_num=12, ik_seed_num=3, ik_max_iters=30,
                    learner_interp_steps=10)
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)
    res = scene.step(fast=True)
    assert res is not None and bool(res.flag)
    return scene, np.asarray(res.traj)


def test_planned_grasp_lifts(planned):
    scene, traj = planned
    rep = execute_plan(scene, traj)
    assert rep.reward == 1, rep.to_dict()
    assert rep.lifted_m > 0.25, rep.to_dict()          # full 0.3 m retract
    assert rep.moved_in_playback_m < 0.02, rep.to_dict()  # no pre-grasp shove
    assert rep.grasp_impulse > 0.05, rep.to_dict()     # sustained pinch


def test_air_grasp_fails(planned):
    """Closing the gripper away from the object must score 0 with zero
    grasp force (the fingers honestly close on air)."""
    scene, traj = planned
    bad = traj.copy()
    bad[-1] = np.asarray(scene.start)
    rep = execute_plan(scene, bad)
    assert rep.reward == 0, rep.to_dict()
    assert rep.grasp_impulse == 0.0, rep.to_dict()


def test_rollout_vmaps_over_plans():
    """The whole rollout is one scan over fixed shapes, so it vmaps over
    a batch of plans (rigid.py module doc); batched results must match
    the streamed ones."""
    spec = _cube_spec()
    world = _table_world(0.0)
    pp = rigid.default_params()
    st0 = BodyState(x=jnp.asarray([[0.0, 0.0, 0.035], [0.1, 0.0, 0.2]]),
                    q=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (2, 1)),
                    v=jnp.zeros((2, 3)), w=jnp.zeros((2, 3)))
    tracks = jnp.stack([_free_track(60), _free_track(60) + 1.0])
    batched = jax.vmap(
        lambda s, t: rollout(spec, world, pp, s, t)[0])(st0, tracks)
    for i in range(2):
        one, _ = rollout(spec, world, pp,
                         jax.tree.map(lambda a: a[i], st0), tracks[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(one.x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched.v[i]),
                                   np.asarray(one.v), atol=1e-5)


def test_place_plan_executes(planned):
    """A planned placement carries the held object through the playback,
    releases it, and it comes to rest at the commanded pose (the role of
    the reference's kitchen place execution, ``real_world/trial.py:
    68-185``)."""
    from omg_planner_tpu.planner.tasks import place_target

    scene, traj = planned
    grasp_conf = traj[-1]
    t = scene.env.target
    orig_pose = t.pose_mat.copy()
    place_pose = orig_pose.copy()
    place_pose[:3, 3] += np.asarray([0.10, 0.06, 0.0])
    scene.attach_target(grasp_conf)
    rel = t.rel_hand_pose.copy()
    try:
        res, _ = place_target(scene, grasp_conf, place_pose)
        # the reference returns placements best-effort WITHOUT checking
        # the verdict (trial.py:123-131 — the held object touches its
        # support, so some collision points always count); the physics
        # outcome below is the real judge
        assert res is not None
        rep = execute_place(scene, np.asarray(res.traj), place_pose, rel)
        assert rep.carried == 1, rep.to_dict()
        assert rep.reward == 1, rep.to_dict()
    finally:
        # restore the module-scoped fixture's scene for later tests
        t.update_pose(orig_pose)
        scene.detach_target()
        scene.env._scene_sdf = None


def test_too_heavy_object_slips(planned):
    """40x the design mass exceeds the motor+friction budget: the object
    must slip out instead of being magically carried."""
    scene, traj = planned
    rep = execute_plan(scene, traj, density=12000.0)
    assert rep.reward == 0, rep.to_dict()
    assert rep.lifted_m < 0.05, rep.to_dict()


def test_grid_body_mass_matches_analytic():
    """Voxel-integrated mass/inertia of a voxelized box matches the
    closed-form primitive within discretization error."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from omg_planner_tpu.io.meshsdf import mesh_to_sdf, surface_points
    from omg_planner_tpu.viz.raster import primitive_mesh

    half = np.asarray([0.03, 0.04, 0.08])
    v, f = primitive_mesh("box", 2.0 * half)   # full extents
    sdf = mesh_to_sdf(v.astype(np.float32), f.astype(np.int32),
                      delta=0.0075, padding=8)
    sdf.penalize_inside(5.0)
    pts = surface_points(v.astype(np.float32), f.astype(np.int32),
                         max_points=500)
    gspec = rigid.body_spec_from_grid(sdf, pts, density=300.0)
    aspec = rigid.body_spec_from_primitive(0, half, density=300.0)
    m_g = 1.0 / float(gspec.inv_mass)
    m_a = 1.0 / float(aspec.inv_mass)
    assert abs(m_g - m_a) / m_a < 0.15, (m_g, m_a)
    ia = np.linalg.inv(np.asarray(aspec.inv_inertia))
    ig = np.linalg.inv(np.asarray(gspec.inv_inertia))
    assert np.allclose(np.diag(ig), np.diag(ia), rtol=0.25), (ig, ia)
    assert np.linalg.norm(np.asarray(gspec.com)) < 0.01   # centered mesh


def test_mesh_static_collider_supports_body():
    """A data-backed (voxelized) obstacle is a real collider: a cube
    dropped onto a MESH slab rests on it instead of falling through
    (before grid statics, data-backed obstacles were silently skipped)."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from omg_planner_tpu.io.meshsdf import mesh_to_sdf
    from omg_planner_tpu.viz.raster import primitive_mesh

    v, f = primitive_mesh("box", [0.5, 0.5, 0.08])       # full extents
    sdf = mesh_to_sdf(v.astype(np.float32), f.astype(np.int32),
                      delta=0.01, padding=6)
    sdf.penalize_inside(5.0)
    _, grid4, lim = rigid.bake_grid_sdf(sdf, 5.0)
    slab_pose = np.eye(4); slab_pose[2, 3] = -0.04       # top face at z=0
    world = rigid.StaticWorld(
        kinds=jnp.asarray([0], jnp.int32),               # inactive dummy
        halfs=jnp.ones((1, 3), jnp.float32),
        rounds=jnp.zeros((1,), jnp.float32),
        inv_poses=jnp.eye(4, dtype=jnp.float32)[None],
        mask=jnp.zeros((1,), jnp.float32),
        grid4=jnp.asarray(grid4[None], jnp.float32),
        grid_limits=jnp.asarray(lim[None], jnp.float32),
        grid_inv_poses=jnp.asarray(
            np.linalg.inv(slab_pose)[None], jnp.float32))
    spec = _cube_spec()
    pp = rigid.default_params()
    st0 = BodyState(x=jnp.asarray([0.0, 0.0, 0.035]),
                    q=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
                    v=jnp.zeros(3), w=jnp.zeros(3))
    final, trace = rollout(spec, world, pp, st0, _free_track(240))
    assert abs(float(final.x[2]) - 0.030) < 4e-3, float(final.x[2])
    assert float(jnp.linalg.norm(final.v)) < 0.02


def test_mesh_target_lifts():
    """A MESH-pipeline object (voxelized SDF, no analytic primitive)
    plans and then lifts in the physics harness through the baked-grid
    contact path — the reference executes exactly these YCB meshes in
    PyBullet."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from test_mesh_object_plan import mesh_scene_object, tall_box_mesh
    from omg_planner_tpu.io.assets import make_primitive, pose_at
    from omg_planner_tpu.planner.scene import Env

    cfg = OMGConfig(silent=True, optim_steps=20, extra_smooth_steps=6,
                    goal_set_max_num=15, ik_seed_num=3, ik_max_iters=35,
                    learner_interp_steps=10)
    v, f = tall_box_mesh()
    env = Env(cfg)
    env.add_object(make_primitive(
        "table", "box", [0.9, 1.2, 0.04], pose_at([0.5, 0.0, -0.02]),
        compute_grasp=False))
    env.add_object(mesh_scene_object(
        "meshbox", v, f, pose_at([0.55, 0.05, 0.08]), target=True))
    env.set_target("meshbox")
    scene = PlanningScene(cfg, env)
    res = scene.step(fast=True)
    assert res is not None and bool(res.flag)
    rep = execute_plan(scene, np.asarray(res.traj))
    assert rep.reward == 1, rep.to_dict()
    assert rep.lifted_m > 0.2, rep.to_dict()


def test_no_mass_model_error_is_typed():
    """Drivers catch exactly NoMassModelError (ADVICE r4 #2: a bare
    ``except ValueError`` also swallowed real shape bugs): the
    points-free data-backed target raises it, and it subclasses
    ValueError for back-compat."""
    from omg_planner_tpu.physics import NoMassModelError
    from omg_planner_tpu.physics.executor import _body_spec_for

    class FakeField:
        analytic = None

    class FakeTarget:
        sdf = FakeField()
        points = None

    assert issubclass(NoMassModelError, ValueError)
    with pytest.raises(NoMassModelError):
        _body_spec_for(FakeTarget(), density=300.0)


def test_finger_command_clipped_to_joint_range():
    """A plan whose finger columns exceed 0.04 must not command an
    opening past the Panda finger limit (ADVICE r4 #4) — jv_cmd stays
    in [0, 0.04] like jv_ref."""
    from omg_planner_tpu.physics.executor import _config_track

    traj = np.zeros((4, 9), np.float32)
    traj[:, -2:] = 0.1                      # out-of-range plan fingers
    lift_qs = np.zeros((2, 9), np.float32)
    jv_ref = np.clip(traj[0, -2:], 0.0, 0.04)
    configs, jv_cmd, playback_end = _config_track(
        traj, lift_qs, jv_ref, sub_plan=2, sub_close=3, sub_lift=2,
        settle=2)
    assert float(jv_cmd.max()) <= 0.04
    assert float(jv_cmd.min()) >= 0.0
    assert (jv_cmd[playback_end:] == 0.0).all()


def test_phys_rollout_places_on_cpu_backend():
    """The execution harness runs host-side whenever a CPU backend
    exists (ADVICE r4 #1): under the test env (CPU platform) the
    context must resolve to a CPU default device, and the ambient
    opt-out must disable it."""
    import os
    from omg_planner_tpu.physics.executor import _phys_ctx

    with _phys_ctx():
        y = jax.jit(lambda x: x + 1)(jnp.zeros(3))
        assert "cpu" in str(list(y.devices())[0]).lower()
    os.environ["OMG_PHYS_DEVICE"] = "ambient"
    try:
        import contextlib
        assert isinstance(_phys_ctx(), contextlib.nullcontext)
    finally:
        del os.environ["OMG_PHYS_DEVICE"]


def _incline_world(theta_rad: float):
    """A thick slab rotated about +y by ``theta`` whose TOP face passes
    through the origin (surface normal = R @ z)."""
    c, s = np.cos(theta_rad), np.sin(theta_rad)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
    pose = np.eye(4)
    pose[:3, :3] = rot
    pose[:3, 3] = rot @ np.array([0.0, 0.0, -0.5])   # top face at origin
    return rigid.StaticWorld(
        kinds=jnp.asarray([0], jnp.int32),
        halfs=jnp.asarray([[1.0, 1.0, 0.5]], jnp.float32),
        rounds=jnp.asarray([0.0], jnp.float32),
        inv_poses=jnp.asarray([np.linalg.inv(pose)], jnp.float32),
        mask=jnp.asarray([1.0], jnp.float32)), rot


def _incline_slide(theta_deg: float, mu: float = 0.8) -> float:
    """Downhill travel of a cube resting on a theta incline, after 0.5 s."""
    theta = np.radians(theta_deg)
    world, rot = _incline_world(theta)
    spec = _cube_spec()
    x0 = rot @ np.array([0.0, 0.0, 0.0305])        # resting, slight gap
    st0 = BodyState(x=jnp.asarray(x0, jnp.float32),
                    q=jnp.asarray(np.r_[np.cos(theta / 2), 0.0,
                                        np.sin(theta / 2), 0.0],
                                  jnp.float32),
                    v=jnp.zeros(3), w=jnp.zeros(3))
    pp = rigid.default_params()._replace(
        mu=jnp.asarray(mu, jnp.float32),
        damp_lin=jnp.asarray(0.0, jnp.float32),
        damp_ang=jnp.asarray(0.0, jnp.float32))
    final, _ = rigid.rollout(spec, world, pp, st0, _free_track(120))
    downhill = rot @ np.array([1.0, 0.0, 0.0])     # +x along the surface
    return float(np.asarray(final.x - jnp.asarray(x0)) @ downhill)


def test_friction_cone_stick_slip_threshold():
    """Closed-form contact oracle (VERDICT r4 item 5): a block on an
    incline sticks for tan(theta) < mu and slides for tan(theta) > mu.
    mu = 0.8 -> critical angle 38.7 deg; 25 deg must hold still, 55 deg
    must slide macroscopically."""
    stick = _incline_slide(25.0)
    slip = _incline_slide(55.0)
    assert abs(stick) < 5e-3, stick
    assert slip > 0.05, slip
    assert slip > 10 * max(abs(stick), 1e-4)


def test_damping_energy_decay_matches_exponential():
    """Free flight with linear damping: v(t) = v0 exp(-c t) (+ gravity
    on the vertical axis); the stepper's velocity decay must match the
    closed form."""
    spec = _cube_spec()
    world = rigid.StaticWorld(                       # inactive collider
        kinds=jnp.asarray([0], jnp.int32),
        halfs=jnp.ones((1, 3), jnp.float32),
        rounds=jnp.zeros((1,), jnp.float32),
        inv_poses=jnp.eye(4, dtype=jnp.float32)[None],
        mask=jnp.zeros((1,), jnp.float32))
    c = 2.0
    pp = rigid.default_params()._replace(
        damp_lin=jnp.asarray(c, jnp.float32),
        gravity=jnp.zeros(3, jnp.float32))
    v0 = np.array([0.4, -0.2, 0.3], np.float32)
    st0 = BodyState(x=jnp.asarray([0.0, 0.0, 5.0]),
                    q=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
                    v=jnp.asarray(v0), w=jnp.zeros(3))
    n = 240                                          # 1 s
    final, _ = rigid.rollout(spec, world, pp, st0, _free_track(n))
    t = n * float(pp.dt)
    got = np.asarray(final.v)
    # the stepper damps with exp(-c dt) per substep (rigid.py:843), so
    # the n-step decay IS the continuous closed form exp(-c t)
    expect = v0 * np.exp(-c * t)
    np.testing.assert_allclose(got, expect, rtol=5e-3, atol=1e-5)
    assert np.linalg.norm(got) < np.linalg.norm(v0) * 0.2  # real decay
