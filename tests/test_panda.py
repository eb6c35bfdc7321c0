"""Panda FK / Jacobian tests.

The FK oracle is an independent numpy evaluation of the chain convention
documented in ``ycb_render/robotPose/robot_pykdl.py:148-215`` using the same
public URDF-derived tables; Jacobians are validated against finite
differences of the FK itself (self-consistency, the property CHOMP needs).
"""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.models import panda


def numpy_fk_oracle(tables, q):
    pose_0 = tables["pose_0"]
    offsets = tables["dh_offsets"]

    def rotz(a):
        m = np.eye(4)
        m[0, 0] = np.cos(a); m[0, 1] = -np.sin(a)
        m[1, 0] = np.sin(a); m[1, 1] = np.cos(a)
        return m

    def rotx(a):
        m = np.eye(4)
        m[1, 1] = np.cos(a); m[1, 2] = -np.sin(a)
        m[2, 1] = np.sin(a); m[2, 2] = np.cos(a)
        return m

    cur = np.eye(4)
    out = np.zeros((10, 4, 4))
    for i in range(7):
        b = pose_0[i] @ rotz(q[i]) @ rotx(offsets[i])
        if i > 0:
            b[:, [1, 2]] *= -1
        cur = cur @ b
        out[i] = cur
    lf = pose_0[8].copy(); lf[1, 3] += q[7]
    rf = pose_0[9].copy(); rf[1, 3] -= q[8]
    out[7] = out[6] @ pose_0[7]
    out[8] = out[7] @ lf
    out[9] = out[7] @ rf
    return out @ tables["center_offset"]


def test_fk_matches_chain_convention():
    model = panda.load_panda()
    tables = dict(np.load(panda._ASSET))
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.uniform(-1.5, 1.5, 9)
        q[7:] = np.abs(q[7:]) * 0.02
        mine = np.array(panda.forward_kinematics(model, jnp.asarray(q, jnp.float32)))
        ref = numpy_fk_oracle(tables, q)
        np.testing.assert_allclose(mine, ref, atol=2e-6)


def test_fk_batch_consistency():
    model = panda.load_panda()
    rng = np.random.default_rng(4)
    qs = jnp.asarray(rng.uniform(-1, 1, (7, 9)), jnp.float32)
    batch = panda.forward_kinematics_batch(model, qs)
    for i in range(7):
        single = panda.forward_kinematics(model, qs[i])
        np.testing.assert_allclose(np.array(batch[i]), np.array(single), atol=1e-6)


def test_point_jacobian_finite_difference():
    """J must equal d(point position)/dq for every link/point/dof."""
    model = panda.load_panda(collision_point_num=3)
    rng = np.random.default_rng(5)
    q = jnp.asarray(
        np.concatenate([rng.uniform(-1.2, 1.2, 7), [0.03, 0.02]]), jnp.float32)

    def points_of(qq):
        poses = panda.forward_kinematics(model, qq)
        return panda.collision_point_positions(model, poses)

    poses, origins, axes = panda.forward_kinematics(
        model, q, return_joint_info=True)
    x = panda.collision_point_positions(model, poses)
    jac = panda.point_jacobians(
        model, origins[None], axes[None], x[None])[0]  # [10, P, 9, 3]

    jac_fd = jax.jacfwd(points_of)(q)  # [10, P, 3, 9]
    jac_fd = jnp.moveaxis(jac_fd, -1, -2)  # [10, P, 9, 3]
    np.testing.assert_allclose(np.array(jac), np.array(jac_fd),
                               atol=2e-4, rtol=1e-3)


def test_hand_pose_and_limits():
    model = panda.load_panda()
    lo, hi = model.soft_limits(0.2)
    assert abs(float(lo[0]) - (-2.8973 + 0.2)) < 1e-5
    assert abs(float(hi[3]) - (-0.0698 - 0.2)) < 1e-5
    assert float(lo[7]) == 0.0  # fingers unpadded
    hp = panda.hand_pose(model, jnp.zeros(9))
    assert np.array(hp).shape == (4, 4)
    assert abs(np.linalg.det(np.array(hp)[:3, :3]) - 1) < 1e-5
