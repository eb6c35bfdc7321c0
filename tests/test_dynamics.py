"""Arm dynamics (physics/dynamics.py) and the native Panda control
surface (physics/panda_ctrl.py) — the reference's Bullet robot model
(``bullet/panda_gripper.py``) re-implemented natively.

Oracles are independent of the implementation path where possible:
link Jacobians against ``jacfwd`` of the raw FK positions, kinetic
energy against finite differences of the FK chain, inverse dynamics
against a finite-difference Euler-Lagrange evaluation, and energy
conservation of the free (undamped) rollout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_planner_tpu.models import panda
from omg_planner_tpu.physics import dynamics as dyn
from omg_planner_tpu.physics.panda_ctrl import HOME_POSE, NativePanda
from omg_planner_tpu.utils.pose import so3_log


@pytest.fixture(scope="module")
def model():
    return panda.load_panda()


def _rand_q(rng):
    return jnp.asarray(np.concatenate(
        [rng.uniform(-1.2, 1.2, 7), rng.uniform(0.0, 0.04, 2)]),
        jnp.float32)


def test_mass_matrix_symmetric_pd(model):
    rng = np.random.default_rng(3)
    for _ in range(3):
        m = dyn.mass_matrix(model, _rand_q(rng))
        assert float(jnp.abs(m - m.T).max()) < 1e-5
        assert float(jnp.linalg.eigvalsh(m).min()) > 0.0


def test_link_jacobians_match_fk_jacfwd(model):
    """J_v rows against autodiff of the FK COM positions directly —
    catches chain-mask / lever-arm mistakes in the analytic assembly."""
    rng = np.random.default_rng(5)
    q = _rand_q(rng)
    j_v, j_w, p = dyn.link_jacobians(model, q)

    def coms(qq):
        return panda.forward_kinematics(
            model, qq, apply_offset=False)[:, :3, 3]

    j_auto = jax.jacfwd(coms)(q)  # [10, 3, 9]
    np.testing.assert_allclose(np.asarray(j_v), np.asarray(j_auto),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p), np.asarray(coms(q)),
                               atol=1e-6)


def test_kinetic_energy_matches_fk_finite_difference(model):
    """T = 1/2 qd^T M qd against energies from finite-difference link
    velocities of the raw FK chain (f32 FD: loose tolerance)."""
    rng = np.random.default_rng(7)
    q = _rand_q(rng)
    qd = jnp.asarray(rng.normal(size=9) * 0.3, jnp.float32)
    eps = 1e-4

    def frames(qq):
        poses = panda.forward_kinematics(model, qq, apply_offset=False)
        return poses[:, :3, 3], poses[:, :3, :3]

    p1, r1 = frames(q - eps * qd)
    p2, r2 = frames(q + eps * qd)
    v = (p2 - p1) / (2 * eps)
    w = jax.vmap(so3_log)(
        jnp.einsum("lij,lkj->lik", r2, r1)) / (2 * eps)
    t_fd = 0.5 * float(
        jnp.sum(jnp.asarray(dyn.LINK_MASSES) * (v ** 2).sum(-1))
        + jnp.sum(jnp.asarray(dyn.LINK_INERTIAS) * (w ** 2).sum(-1)))
    t = float(dyn.kinetic_energy(model, q, qd))
    assert abs(t - t_fd) / max(t, 1e-6) < 0.05


def test_inverse_dynamics_euler_lagrange_fd(model):
    """tau against d/dt(dT/dqd) - dT/dq + dV/dq with the time derivative
    taken by finite differences along (q + h qd, qd + h qdd)."""
    rng = np.random.default_rng(11)
    q = _rand_q(rng)
    qd = jnp.asarray(rng.normal(size=9) * 0.4, jnp.float32)
    qdd = jnp.asarray(rng.normal(size=9), jnp.float32)
    tau = dyn.inverse_dynamics(model, q, qd, qdd)

    h = 1e-4
    d_dqd = lambda qq, qqd: jax.grad(
        lambda u: dyn.kinetic_energy(model, qq, u))(qqd)
    ddt = (d_dqd(q + h * qd, qd + h * qdd)
           - d_dqd(q - h * qd, qd - h * qdd)) / (2 * h)
    dtdq = jax.grad(lambda qq: dyn.kinetic_energy(model, qq, qd))(q)
    dvdq = jax.grad(lambda qq: dyn.potential_energy(model, qq))(q)
    tau_el = ddt - dtdq + dvdq
    scale = float(jnp.abs(tau).max())
    assert float(jnp.abs(tau - tau_el).max()) < 0.02 * scale


def test_forward_inverse_round_trip(model):
    rng = np.random.default_rng(13)
    q = _rand_q(rng)
    qd = jnp.asarray(rng.normal(size=9) * 0.3, jnp.float32)
    qdd = jnp.asarray(rng.normal(size=9), jnp.float32)
    tau = dyn.inverse_dynamics(model, q, qd, qdd)
    qdd2 = dyn.forward_dynamics(model, q, qd, tau)
    np.testing.assert_allclose(np.asarray(qdd2), np.asarray(qdd),
                               atol=2e-4)


def test_free_rollout_conserves_energy(model):
    """Zero torque, zero damping (the reference zeroes Bullet's link
    damping, panda_gripper.py:99): E = T + V drifts only by the
    integrator over a short window."""
    q = jnp.asarray(HOME_POSE, jnp.float32)
    qd = jnp.zeros(9, jnp.float32)
    dt = 1e-3
    e0 = float(dyn.kinetic_energy(model, q, qd)
               + dyn.potential_energy(model, q))

    def substep(_, state):
        q, qd = state
        qdd = dyn.forward_dynamics(model, q, qd, jnp.zeros(9))
        qd = qd + dt * qdd
        return q + dt * qd, qd

    q, qd = jax.lax.fori_loop(0, 150, substep, (q, qd))
    e1 = float(dyn.kinetic_energy(model, q, qd)
               + dyn.potential_energy(model, q))
    # the arm falls: kinetic grows, potential drops; the SUM stays put
    assert float(dyn.kinetic_energy(model, q, qd)) > 0.05
    assert abs(e1 - e0) < 0.05 * abs(e0)


# -- NativePanda surface --------------------------------------------------


@pytest.fixture(scope="module")
def robot():
    return NativePanda()


def test_reset_holds_home_pose(robot):
    robot.reset()
    robot.step(200)
    q, _ = robot.getJointStates()
    np.testing.assert_allclose(q, HOME_POSE, atol=1e-3)


def test_gravity_compensation_holds(robot):
    robot.reset()
    robot.setTargetTorques(robot.gravityTorques())
    robot.step(200)
    q, qd = robot.getJointStates()
    np.testing.assert_allclose(q, HOME_POSE, atol=1e-3)
    assert np.abs(qd).max() < 1e-2


def test_free_controller_falls(robot):
    robot.reset()
    robot.resetController()
    robot.step(300)
    q, _ = robot.getJointStates()
    assert np.abs(np.asarray(q) - HOME_POSE).max() > 0.1


def test_position_mode_tracks_target(robot):
    robot.reset()
    tgt = HOME_POSE.copy()
    tgt[1] += 0.4
    tgt[3] += 0.3
    robot.setTargetPositions(tgt)
    robot.step(800)
    q, _ = robot.getJointStates()
    np.testing.assert_allclose(q, tgt, atol=5e-3)


def test_fingers_stay_mirrored(robot):
    """Gear constraint (reference panda_gripper.py:79-89)."""
    robot.reset()
    tgt = HOME_POSE.copy()
    tgt[7], tgt[8] = 0.0, 0.04  # contradictory finger targets
    robot.setTargetPositions(tgt)
    robot.step(300)
    q, _ = robot.getJointStates()
    assert abs(q[7] - q[8]) < 1e-6


def test_ten_slot_bullet_layout_accepted(robot):
    """Reference layout inserts a zero at index 7 for the fixed
    panda_joint8 (panda_gripper.py:154-162)."""
    ten = list(HOME_POSE[:7]) + [0.0] + list(HOME_POSE[7:])
    robot.reset(ten)
    q, _ = robot.getJointStates()
    np.testing.assert_allclose(q, HOME_POSE, atol=1e-7)


def test_inverse_dynamics_surface_at_rest_is_gravity(robot):
    robot.reset()
    tau = robot.solveInverseDynamics(list(HOME_POSE), [0.0] * 9, [0.0] * 9)
    np.testing.assert_allclose(tau, robot.gravityTorques(list(HOME_POSE)),
                               atol=1e-5)


def test_inverse_kinematics_surface_round_trip(robot):
    robot.reset()
    hand = panda.forward_kinematics(
        robot.model, jnp.asarray(HOME_POSE, jnp.float32),
        apply_offset=False)[7]
    from omg_planner_tpu.utils.pose import mat_to_quat

    qw = np.asarray(mat_to_quat(hand[:3, :3]))
    sol = robot.solveInverseKinematics(
        np.asarray(hand[:3, 3]), [qw[1], qw[2], qw[3], qw[0]])
    hand2 = panda.forward_kinematics(
        robot.model, jnp.asarray(sol, jnp.float32), apply_offset=False)[7]
    assert float(jnp.abs(hand2[:3, 3] - hand[:3, 3]).max()) < 1e-3


def test_torque_clamp(robot):
    """Commands beyond max_torque saturate: a huge torque accelerates no
    faster than the 250 N m clamp."""
    robot.reset()
    robot.setTargetTorques([1e6] + [0.0] * 8)
    robot.step(50)
    _, qd_huge = robot.getJointStates()
    robot.reset()
    robot.setTargetTorques([250.0] + [0.0] * 8)
    robot.step(50)
    _, qd_ref = robot.getJointStates()
    np.testing.assert_allclose(qd_huge, qd_ref, atol=1e-6)
