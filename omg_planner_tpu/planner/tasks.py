"""Task-level planning API: pick, place, move-to-configuration.

Re-implements the reference's kitchen/real-world task layer
(``real_world/trial.py:23-185``) on top of the jitted planner:

  * :func:`plan_to_target` — grasp an object (goal-set OMG plan).
  * :func:`plan_to_conf` — fixed-endpoint CHOMP between two configurations
    with a collision-disable list (reference ``:37-66``; the reference
    implements the mode flips by temporarily mutating the global cfg — here
    they are explicit immutable config overrides).
  * :func:`place_target` — attach the object to the hand, swap end-effector
    collision points for object surface points, plan to a z-upsampled
    placement goal, detach (reference ``:68-185``,
    ``omg/core.py:192-234``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import OMGConfig
from ..models import panda
from .scene import PlanningScene


def attached_collision_points(
    model: panda.PandaModel,
    rel_hand_pose: np.ndarray,   # [4, 4] object pose in panda_hand frame
    obj_points: np.ndarray,      # [>=500, 3] object surface points
) -> jnp.ndarray:
    """New [10, P, 3] collision point set with the grasped object's points
    attached to the hand/finger links (reference
    ``Robot.resample_attached_object_collision_points``,
    ``omg/core.py:192-234``)."""
    pts = np.asarray(model.collision_points)
    p = pts.shape[1]
    off = np.asarray(model.center_offset)
    hand_pose = np.linalg.inv(off[-3]) @ rel_hand_pose
    lf_pose = np.linalg.inv(off[-2]) @ hand_pose
    rf_pose = np.linalg.inv(off[-1]) @ hand_pose

    hand_keep = max(p // 4, 1)
    obj = np.asarray(obj_points)

    def take(seg, n):
        stride = max(len(seg) // n, 1)
        return seg[::stride][:n]

    def xform(mat, q):
        return q @ mat[:3, :3].T + mat[:3, 3]

    new = pts.copy()
    hand_obj = xform(hand_pose, take(obj[:200], p - hand_keep)[:, :3])
    new[-3] = np.concatenate([pts[-3][:hand_keep], hand_obj], axis=0)[:p]
    new[-2] = xform(lf_pose, take(obj[200:350], p)[:, :3])[:p]
    new[-1] = xform(rf_pose, take(obj[350:500], p)[:, :3])[:p]
    return jnp.asarray(new, jnp.float32)


def plan_to_target(scene: PlanningScene, start_conf: np.ndarray,
                   target_name: str, fast: bool = False):
    """Plan a grasp of ``target_name`` from ``start_conf``
    (reference ``trial.py:23-35``)."""
    scene.env.set_target(target_name)
    scene.start = np.asarray(start_conf)
    return scene.step(fast=fast)


def plan_to_conf(scene: PlanningScene, start_conf: np.ndarray,
                 end_conf: np.ndarray, disable_list=(), fast: bool = False):
    """Fixed-endpoint CHOMP between two configurations
    (reference ``trial.py:37-66``)."""
    sub = PlanningScene(
        scene.cfg.replace(goal_set_proj=False, use_standoff=False,
                          disable_collision_set=tuple(disable_list)),
        scene.env)
    sub.model = scene.model
    sub.start = np.asarray(start_conf)
    sub.end = np.asarray(end_conf)
    return sub.step(fast=fast)


def place_target(scene: PlanningScene, grasp_conf: np.ndarray,
                 place_pose: np.ndarray, target_name: str | None = None,
                 apply_standoff: bool = False, fast: bool = False):
    """Plan a placement with the target attached to the hand
    (reference ``trial.py:68-185``).

    ``grasp_conf``: configuration at which the object is held.
    ``place_pose``: desired world pose [4, 4] of the object after placing.
    Returns (result, achieved_obj_pose) and leaves the scene detached with
    the target at its achieved pose.

    As in the reference (``trial.py:83``): the held object's own collision
    is disabled (its points ride the hand as attached collision points
    instead), and the standoff tail is off unless ``apply_standoff``.
    """
    if target_name is not None:
        scene.env.set_target(target_name)
    t = scene.env.target
    base_cfg = scene.cfg
    scene.cfg = base_cfg.replace(
        disable_collision_set=tuple(base_cfg.disable_collision_set)
        + (t.name,),
        use_standoff=apply_standoff)

    # attach: record pose relative to the hand at the grasp configuration
    scene.attach_target(np.asarray(grasp_conf))
    base_points = scene.model.collision_points
    if t.points is not None:
        scene.model = scene.model._replace(
            collision_points=attached_collision_points(
                scene.model, t.rel_hand_pose, t.points))

    # move the (attached) target to the placement pose; goal set = inverse
    # relative hand pose, z-upsampled (planner.py:496-498)
    old_pose = t.pose_mat.copy()
    t.update_pose(np.asarray(place_pose))
    scene.env._scene_sdf = None
    scene.start = np.asarray(grasp_conf)

    try:
        result = scene.step(fast=fast)
    finally:
        # restore hand points, detach, restore config
        scene.model = scene.model._replace(collision_points=base_points)
        scene.cfg = base_cfg

    if result is None:
        # no placement IK found: roll the object back (trial.py:123-131 —
        # the reference's ONLY failure path; it returns best-effort
        # trajectories without checking the verdict, because the start
        # configuration holds the object in contact with its support and
        # therefore always counts some collision points)
        t.update_pose(old_pose)
        scene.detach_target()
        scene.env._scene_sdf = None
        return result, old_pose

    # achieved object pose from the final hand pose
    from .scene import _hand_pose_jit
    final_conf = result.traj[-1]
    hand = np.array(_hand_pose_jit(
        scene.model, jnp.asarray(final_conf, jnp.float32)))
    achieved = hand @ t.rel_hand_pose
    scene.detach_target()
    t.update_pose(achieved)
    scene.env._scene_sdf = None
    return result, achieved
