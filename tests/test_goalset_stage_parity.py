"""Goal-set CONSTRUCTION stage parity against the actual reference
(VERDICT r3 item 7).

The reference's augment / filter / prune stages are pure numpy + the
(shimmed) collision layer and run in-image; its IK does not (PyKDL is a
constructible no-op fake), so each stage is cross-checked in isolation on
the same inputs — IK-solved configs come from OUR solver, then both
pipelines' stage outputs are compared element-wise:

  * grasp-DB world transform (rotZ(pi/2) offset + object-frame compose,
    ``omg/planner.py:485,320-322``)
  * wrist-flip augmentation + limit mask (``omg/planner.py:226-237``)
  * z/y upsampling poses (``omg/planner.py:324-347``)
  * task-space rotation/downward filter (``omg/planner.py:260-293``) —
    uses the REFERENCE's own FK (robot_pykdl) for its side
  * collision prune mask (``omg/planner.py:508-539`` via the shimmed
    kernel) vs ours
  * diversity dedupe kept-set (``omg/planner.py:547-562``) — compared
    against the reference's ``unique_grasps`` list; its ``indexes``
    bookkeeping has an off-by-one (enumerate over ``goal_set[1:]``
    records j for element j+1 and never records element 0), documented
    in DESIGN §7.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def stage_ws(tmp_path_factory):
    """Fixture scene + a live reference Planner (precomputed goals keep
    its init off the stubbed-IK path) + OUR env/model on the same data."""
    import scipy.io as sio

    from omg_planner_tpu.io import ref_fixtures, ref_shims

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from parity_run import _ours_cfg, _parity_model

    root = str(tmp_path_factory.mktemp("stage_ws"))
    ref_shims.build_ref_workspace(root)
    mats = ref_fixtures.make_parity_tree(root, n_scenes=2)
    mat = mats[1]

    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = _ours_cfg()
    model = _parity_model()
    env, _ = env_from_mat_scene(cfg, mat, root, model=model, penalize=False)
    ps = PlanningScene(cfg, env)
    gs = ps.build_goal_set()
    mask = np.asarray(gs.mask)
    goals = np.asarray(gs.grasps)[mask]
    reach = np.asarray(gs.reach_grasps)[mask]
    assert len(goals) >= 3
    d = sio.loadmat(mat)
    d["goals"] = goals.astype(np.float64)
    d["reach_grasps"] = reach.astype(np.float64)
    sio.savemat(mat, d)

    ref_shims.install(REFERENCE)
    name = os.path.splitext(os.path.basename(mat))[0]
    ref_shims.configure_reference(root, scene_file=name, silent=True)
    from omg.core import PlanningScene as RefScene
    from omg import config as ref_config

    scene = RefScene(ref_config.cfg)
    scene.reset()
    return dict(root=root, cfg=cfg, model=model, env=env, ps=ps,
                ref_scene=scene, goals=goals, reach=reach)


def test_grasp_world_transform_matches(stage_ws):
    """Grasp-DB load semantics (rotZ(pi/2) offset + ycb_special_case,
    ``omg/planner.py:478-489``) + object-frame composition — the
    reference skips load_grasp_set under precomputed goals, so its load
    lines run here verbatim with ITS util functions on the same .npy."""
    env = stage_ws["env"]
    t = env.target
    ours = env.grasp_poses_world()
    ref_obj = [o for o in stage_ws["ref_scene"].planner.env.objects
               if o.name == t.name][0]
    from omg.util import rotZ, unpack_pose, ycb_special_case

    db = os.path.join(stage_ws["root"], "data", "grasps", "simulated",
                      f"{t.name}.npy")
    pose_grasp = np.load(db, allow_pickle=True).item()["transforms"]
    pose_grasp = np.matmul(pose_grasp, np.array(rotZ(np.pi / 2)))
    pose_grasp = ycb_special_case(pose_grasp, t.name)
    ref_world = np.matmul(unpack_pose(ref_obj.pose), pose_grasp)
    assert ours.shape == ref_world.shape
    np.testing.assert_allclose(ours, ref_world, atol=1e-5)


def test_wrist_flip_matches(stage_ws):
    from omg_planner_tpu.planner.goal_set import flip_wrist

    goals = stage_ws["goals"]
    import jax.numpy as jnp

    ref_flip, ref_ok = stage_ws["ref_scene"].planner.flip_grasp(goals)
    our_flip, our_ok = flip_wrist(jnp.asarray(goals, jnp.float32),
                                  stage_ws["cfg"])
    np.testing.assert_allclose(np.asarray(our_flip), ref_flip, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(our_ok), ref_ok.astype(bool))


def test_z_and_y_upsample_match(stage_ws):
    """Transcription of the reference's inline upsampling
    (``omg/planner.py:324-347``) vs our batched pose programs."""
    from omg.util import rotZ, rotY

    from omg_planner_tpu.planner.goal_set import (y_upsample_poses,
                                                  z_upsample_poses)

    env = stage_ws["env"]
    poses = env.grasp_poses_world()[:6].astype(np.float64)
    obj_pos = env.target.pose_mat[:3, 3]

    # --- z (reference lines 326-334)
    bins = 50
    gz = np.stack([rotZ(a) for a in np.linspace(-np.pi, np.pi, bins)])
    pg = poses.copy()
    tr = obj_pos.copy()
    pg[:, :3, 3] -= tr
    ref_z = np.matmul(gz[:, None], pg)  # [bins, n, 4, 4]
    ref_z[:, :, :3, 3] += tr
    ref_z = ref_z.transpose(1, 0, 2, 3).reshape(-1, 4, 4)
    import jax.numpy as jnp

    ours_z = np.asarray(z_upsample_poses(
        jnp.asarray(poses, jnp.float32), jnp.asarray(obj_pos, jnp.float32),
        bins=bins))
    np.testing.assert_allclose(ours_z, ref_z, atol=1e-5)

    # --- y (reference lines 336-347)
    bins = 10
    gy = np.stack([rotY(a) for a in np.linspace(-np.pi / 4, np.pi / 4,
                                                bins)])
    finger = np.array([0, 0, 0.13])
    ft = poses[:, :3, :3].dot(finger) + poses[:, :3, 3]
    local_rot = np.matmul(poses[:, :3, :3], gy[:, None, :3, :3])
    dt = local_rot.dot(finger)
    ref_y = np.tile(poses[:, None], (1, bins, 1, 1))
    ref_y[:, :, :3, 3] = (ft[None] - dt).transpose(1, 0, 2)
    ref_y[:, :, :3, :3] = local_rot.transpose(1, 0, 2, 3)
    ref_y = ref_y.reshape(-1, 4, 4)
    ours_y = np.asarray(y_upsample_poses(jnp.asarray(poses, jnp.float32),
                                         bins=bins))
    np.testing.assert_allclose(ours_y, ref_y, atol=1e-5)


def test_task_space_filter_matches(stage_ws):
    """Rotation-angle + downward filter (``omg/planner.py:260-293``),
    reference side computed with ITS OWN FK (robot_pykdl through the
    shims) and interpolation."""
    from omg.util import multi_interpolate_waypoints, wrap_value, \
        wrap_values

    from omg_planner_tpu.planner.goal_set import task_space_filter

    cfg = stage_ws["cfg"]
    model = stage_ws["model"]
    ref_scene = stage_ws["ref_scene"]
    reach = stage_ws["reach"]
    start = np.asarray(ref_scene.traj.start)
    kin = ref_scene.planner.env.robot.robot_kinematics

    start_hand = kin.forward_kinematics_parallel(
        wrap_value(start)[None])[0][7]
    if cfg.use_standoff:
        n = 5
        interp = multi_interpolate_waypoints(
            start, np.array(reach[:, -1]), n, 9, "linear")
        hand = kin.forward_kinematics_parallel(
            wrap_values(interp))[:, 7].reshape(-1, n, 4, 4)
    else:
        hand = kin.forward_kinematics_parallel(
            wrap_values(np.array(reach[:, -1])))[:, 7][:, None]
    r_diff = np.matmul(hand[..., :3, :3],
                       start_hand[:3, :3].transpose(1, 0))
    angle = np.abs(np.arccos(np.clip(
        (np.trace(r_diff, axis1=2, axis2=3) - 1) / 2, -1, 1)))
    rot_masks = angle * 180 / np.pi > cfg.target_hand_filter_angle
    z = hand[..., :3, 0] / np.linalg.norm(hand[..., :3, 0], axis=-1,
                                          keepdims=True)
    down = z[:, :, -1] < -0.3
    ref_keep = ~((rot_masks + down).sum(-1) > 0)

    import jax.numpy as jnp

    ours_keep = np.asarray(task_space_filter(
        model, cfg, jnp.asarray(start, jnp.float32),
        jnp.asarray(reach, jnp.float32),
        jnp.ones(len(reach), bool)))
    np.testing.assert_array_equal(ours_keep, ref_keep)


def test_collision_prune_mask_matches(stage_ws):
    """Prune mask via the reference's batch_obstacle_cost (shimmed CUDA
    kernel) vs our collision_prune (``omg/planner.py:508-539``)."""
    import jax
    import jax.numpy as jnp

    from omg_planner_tpu.planner.goal_set import collision_prune

    cfg = stage_ws["cfg"]
    env = stage_ws["env"]
    model = stage_ws["model"]
    goals = stage_ws["goals"]
    ref_scene = stage_ws["ref_scene"]
    planner = ref_scene.planner

    _, _, _, collide = planner.cost.batch_obstacle_cost(
        list(goals), special_check_id=planner.env.target_idx,
        uncheck_finger_collision=-1)
    ref_collide = collide.sum(-1).sum(-1).detach().cpu().numpy()
    ref_keep = ref_collide <= cfg.allow_collision_point

    ours_keep, _ = jax.jit(lambda g, v: collision_prune(
        model, env.scene_sdf(), env.cost_params(), cfg, g, v))(
            jnp.asarray(goals, jnp.float32), jnp.ones(len(goals), bool))
    np.testing.assert_array_equal(np.asarray(ours_keep), ref_keep)


def test_diversity_dedupe_matches_reference_kept_set(stage_ws):
    """Greedy 0.5-rad dedupe (``omg/planner.py:547-562``): our kept SET
    equals the reference's ``unique_grasps``.  (Its ``indexes`` list is
    off by one — records j for element j+1, drops element 0 — so the
    kept CONFIGS, not its indices, are the semantic output.)"""
    from omg_planner_tpu.planner.goal_set import diversity_dedupe

    goals = stage_ws["goals"]
    # duplicate some rows so the dedupe actually fires
    test_set = np.concatenate([goals, goals[:3] + 1e-4, goals[1:2]])
    unique = [test_set[0]]
    for joint in test_set[1:]:
        if np.amin(np.linalg.norm(np.array(unique) - joint, axis=-1)) < 0.5:
            continue
        unique.append(joint)
    ref_kept = np.array(unique)

    import jax.numpy as jnp

    kept_mask = np.asarray(diversity_dedupe(
        jnp.asarray(test_set, jnp.float32), jnp.ones(len(test_set), bool)))
    ours_kept = test_set[kept_mask]
    assert ours_kept.shape == ref_kept.shape
    np.testing.assert_allclose(ours_kept, ref_kept, atol=1e-6)
    assert kept_mask.sum() < len(test_set)  # dedupe fired
