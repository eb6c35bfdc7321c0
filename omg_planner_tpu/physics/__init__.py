"""Rigid-body execution physics (JAX, jitted end-to-end).

The reference validates plans by EXECUTING them in PyBullet and scoring a
lift reward (``bullet/panda_scene.py:424-504``).  PyBullet cannot be
installed in this image, so this package provides a TPU-native dynamics
stepper with the same role: a single dynamic rigid body (the grasp
target), SDF-based contact generation against the analytic scene and the
kinematically-replayed robot, and a projected-impulse contact solver —
the whole rollout is ONE ``lax.scan`` program (jit-compatible, vmappable
over plans).

Modules:
  * :mod:`.rigid` — body/world types, contact generation, impulse solver,
    scan rollout.
  * :mod:`.executor` — plan playback + gripper close + IK lift retract,
    mirroring ``bullet_execute_plan`` / ``PandaYCBEnv.retract``.
"""

from .rigid import (BodyState, NoMassModelError, PhysParams, RigidBodySpec,
                    StaticWorld, body_spec_from_grid,
                    body_spec_from_primitive, rollout)
from .executor import (PhysExecReport, PlaceExecReport, ensure_cpu_backend,
                       execute_plan, execute_place)

__all__ = [
    "BodyState", "NoMassModelError", "PhysParams", "RigidBodySpec",
    "StaticWorld", "body_spec_from_grid", "body_spec_from_primitive",
    "rollout", "PhysExecReport", "PlaceExecReport", "ensure_cpu_backend",
    "execute_plan", "execute_place",
]
