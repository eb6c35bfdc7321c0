"""Native Panda robot-model surface: the reference's Bullet ``Panda``
class (``bullet/panda_gripper.py``) re-implemented over the package's own
dynamics instead of PyBullet.

Mirrors the observable API one-for-one — ``reset`` / ``step`` /
``setControlMode`` / ``setTargetPositions`` / ``setTargetTorques`` /
``resetController`` / ``getJointStates`` / ``solveInverseDynamics`` /
``solveInverseKinematics`` — with the same conventions:

* torque is the primary mode (``panda_gripper.py:17``); position motors
  and torque motors replace each other per the last ``setTarget*`` call
  (Bullet's last-motor-wins semantics), and ``resetController`` frees the
  joints (VELOCITY_CONTROL with zero force, ``:136-142``);
* joint vectors accept the 9-DOF layout used across this package or the
  reference's 10-slot Bullet layout with a zero at index 7 for the fixed
  ``panda_joint8`` (``:154-162`` ``append``);
* the finger gear constraint (``:79-89``) keeps the two prismatic
  fingers mirrored;
* joint damping is zero (``:99``) so free/torque dynamics conserve
  energy up to the integrator; limits clamp with velocity kill.

Deviation (documented): Bullet's POSITION_CONTROL is a constraint-row
stable PD whose ``positionGain``/``velocityGain`` numbers are solver
internals; the native position motor is a computed-torque servo
``tau = M(q)(kp e - kd qd) + c + g`` clamped at ``max_torque`` —
critically damped (``kd = 2 sqrt(kp)``), matching the observable
behavior (smooth force-limited convergence to the target) rather than
the gain values.  The stepper integrates semi-implicit Euler at
``stepsize`` like Bullet's default.

The arm-only dynamics here complement :mod:`physics.executor`, which
owns object interaction (contacts, grasping, lift scoring); this surface
exists for the robot-model API itself — gravity compensation, inverse
dynamics, torque rollouts.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import panda
from ..ops import ik as ik_ops
from ..utils.pose import quat_to_mat
from . import dynamics
from .executor import _phys_ctx

# reference class constants (panda_gripper.py:43-55, 116)
MAX_TORQUE = 250.0
HOME_POSE = np.asarray(
    [0.0, -1.285, 0.0, -2.356, 0.0, 1.571, 0.785, 0.04, 0.04])
# native position-servo gains (see module docstring): ~0.2 s settle
_KP = 400.0
_KD = 2.0 * np.sqrt(_KP)

_FREE, _POSITION, _TORQUE = 0, 1, 2


@functools.lru_cache(maxsize=4)
def _stepper(stepsize: float):
    """Jitted multi-substep integrator, cached per stepsize."""
    model = panda.load_panda()
    lo = jnp.asarray(model.joint_lower)
    hi = jnp.asarray(model.joint_upper)

    def motor_tau(motor, q, qd, target_pos, target_tau):
        def free(_):
            return jnp.zeros(9, q.dtype)

        def position(_):
            acc = _KP * (target_pos - q) - _KD * qd
            tau = (dynamics.mass_matrix(model, q) @ acc
                   + dynamics.bias_torque(model, q, qd))
            return jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)

        def torque(_):
            return jnp.clip(target_tau, -MAX_TORQUE, MAX_TORQUE)

        return jax.lax.switch(motor, (free, position, torque), None)

    @jax.jit
    def run(q, qd, motor, target_pos, target_tau, n):
        def substep(_, state):
            q, qd = state
            tau = motor_tau(motor, q, qd, target_pos, target_tau)
            qdd = dynamics.forward_dynamics(model, q, qd, tau)
            qd = qd + stepsize * qdd
            q = q + stepsize * qd
            # limits clamp with velocity kill (Bullet enforces limits as
            # unilateral constraints)
            q_cl = jnp.clip(q, lo, hi)
            qd = jnp.where(q == q_cl, qd, 0.0)
            q = q_cl
            # finger gear constraint: mirror the prismatic pair
            fm = 0.5 * (q[7] + q[8])
            fv = 0.5 * (qd[7] + qd[8])
            q = q.at[7:].set(fm)
            qd = qd.at[7:].set(fv)
            return q, qd

        return jax.lax.fori_loop(0, n, substep, (q, qd))

    return model, run


def _as9(joints: Sequence[float] | np.ndarray) -> np.ndarray:
    """Accept 9-DOF or the reference's 10-slot layout (zero at index 7
    for the fixed panda_joint8, ``panda_gripper.py:154-162``)."""
    j = np.asarray(joints, np.float32).reshape(-1)
    if j.shape[0] == 10:
        j = np.delete(j, 7)
    if j.shape[0] != 9:
        raise ValueError(f"expected 9 or 10 joint values, got {j.shape[0]}")
    return j


class NativePanda:
    """Drop-in native analog of the reference's ``Panda`` class."""

    def __init__(self, stepsize: float = 1e-3, realtime: int = 0,
                 init_joints=None, base_shift=(0.0, 0.0, 0.0)):
        del realtime  # reference passes it to Bullet's RT clock; n/a
        self.stepsize = float(stepsize)
        self.t = 0.0
        self.base_position = (-0.05 - base_shift[0], -base_shift[1],
                              -0.65 - base_shift[2])
        self.max_torque = [MAX_TORQUE] * 9
        with _phys_ctx():
            self.model, self._run = _stepper(self.stepsize)
        self.reset(init_joints)

    # -- reference surface ------------------------------------------------

    def reset(self, joints=None):
        self.t = 0.0
        self.control_mode = "torque"
        self.q = _as9(HOME_POSE if joints is None else joints)
        self.qd = np.zeros(9, np.float32)
        self.target_torque = np.zeros(9, np.float32)
        self.resetController()
        # reference reset ends by arming the position motors at the reset
        # pose (panda_gripper.py:130): the robot holds position until the
        # first setTargetTorques call
        self.setTargetPositions(self.q)

    def resetController(self):
        """Free the joints (VELOCITY_CONTROL, zero force — ``:136-142``)."""
        self._motor = _FREE

    def setControlMode(self, mode: str):
        if mode == "position":
            self.control_mode = "position"
        elif mode == "torque":
            if self.control_mode != "torque":
                self.resetController()
            self.control_mode = "torque"
        else:
            raise Exception("wrong control mode")

    def setTargetPositions(self, target_pos):
        self.target_pos = _as9(target_pos)
        self._motor = _POSITION

    def setTargetTorques(self, target_torque):
        self.target_torque = _as9(target_torque)
        self._motor = _TORQUE

    def step(self, n: int = 1):
        with _phys_ctx():
            q, qd = self._run(
                jnp.asarray(self.q), jnp.asarray(self.qd),
                jnp.asarray(self._motor),
                jnp.asarray(getattr(self, "target_pos", self.q)),
                jnp.asarray(self.target_torque), jnp.asarray(int(n)))
        self.q = np.asarray(q)
        self.qd = np.asarray(qd)
        self.t += n * self.stepsize

    def getJointStates(self):
        return list(self.q.astype(float)), list(self.qd.astype(float))

    def solveInverseDynamics(self, pos, vel, acc):
        with _phys_ctx():
            tau = dynamics.inverse_dynamics(
                self.model, jnp.asarray(_as9(pos)), jnp.asarray(_as9(vel)),
                jnp.asarray(_as9(acc)))
        return list(np.asarray(tau).astype(float))

    def solveInverseKinematics(self, pos, orn):
        """Hand-frame IK (reference ``:194-195``; Bullet quaternion order
        x, y, z, w).  ``pos`` is in the robot-base frame (the native model
        plants the base at the origin; the reference's Bullet world shifts
        it by ``base_position`` — subtract that shift for world inputs).
        Returns the 9-DOF configuration with the current finger opening."""
        target = np.eye(4, dtype=np.float32)
        target[:3, :3] = np.asarray(quat_to_mat(
            jnp.asarray([orn[3], orn[0], orn[1], orn[2]])))
        target[:3, 3] = np.asarray(pos, np.float32)
        from ..config import OMGConfig

        cfg = OMGConfig()
        lo, hi = self.model.soft_limits(0.0)
        with _phys_ctx():
            res = ik_ops.ik_single(
                self.model, jnp.asarray(target), jnp.asarray(self.q[:7]),
                cfg, lo[:7], hi[:7])
        return list(np.asarray(res.q).astype(float)) + list(
            self.q[7:].astype(float))

    # -- convenience ------------------------------------------------------

    def gravityTorques(self, pos=None):
        """Static-hold torques ``g(q)`` (beyond-reference helper)."""
        q = self.q if pos is None else _as9(pos)
        with _phys_ctx():
            g = dynamics.gravity_torque(self.model, jnp.asarray(q))
        return list(np.asarray(g).astype(float))
