"""Goal-set machinery unit tests: augmentation, filters, dedupe, sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner import goal_set as gs


def test_flip_wrist():
    cfg = OMGConfig()
    q = jnp.zeros((4, 9)).at[:, 6].set(jnp.asarray([0.5, -0.5, 2.0, -2.8]))
    flipped, ok = gs.flip_wrist(q, cfg)
    f = np.array(flipped[:, 6])
    np.testing.assert_allclose(f, [0.5 - np.pi, -0.5 + np.pi,
                                   2.0 - np.pi, -2.8 + np.pi], atol=1e-6)
    # all flipped values are inside the soft limit here
    assert np.array(ok).all()
    # a wrist near +pi flips to ~0 (inside); one at 0.01 flips to ~-3.13
    q2 = jnp.zeros((1, 9)).at[0, 6].set(0.01)
    _, ok2 = gs.flip_wrist(q2, cfg)
    assert not bool(ok2[0])  # -3.13 is outside the padded limit


def test_diversity_dedupe():
    configs = jnp.asarray(np.array([
        [0.0] * 9,
        [0.01] * 9,           # within 0.5 of the first -> dropped
        [1.0] * 9,            # far -> kept
        [1.01] * 9,           # near the third -> dropped
        [5.0] * 9,            # far -> kept
    ]), jnp.float32)
    valid = jnp.asarray([True, True, True, True, False])
    kept = np.array(gs.diversity_dedupe(configs, valid))
    assert list(kept) == [True, False, True, False, False]
    kept_r = np.array(gs.diversity_dedupe(configs, valid, mode="rounds"))
    assert list(kept_r) == list(kept)


def test_diversity_dedupe_rounds_matches_scan():
    """The parallel MIS fixed point keeps the EXACT greedy set — on
    clustered configs (grasp families), an invalid-heavy mask, and the
    worst case for round count: a chain where lane i conflicts only with
    its neighbors (each round resolves one link of the chain prefix)."""
    rng = np.random.default_rng(0)
    c = 96
    for trial in range(20):
        centers = rng.normal(size=(8, 9))
        cfgs = (centers[rng.integers(0, 8, c)]
                + rng.normal(size=(c, 9)) * rng.choice([0.05, 0.3, 0.6]))
        valid = rng.random(c) > 0.3
        a = np.asarray(gs.diversity_dedupe(
            jnp.asarray(cfgs, jnp.float32), jnp.asarray(valid)))
        b = np.asarray(gs.diversity_dedupe(
            jnp.asarray(cfgs, jnp.float32), jnp.asarray(valid),
            mode="rounds"))
        assert (a == b).all(), f"trial {trial}"
    chain = np.arange(c)[:, None] * 0.45 / 3.0 * np.ones((1, 9))
    a = np.asarray(gs.diversity_dedupe(
        jnp.asarray(chain, jnp.float32), jnp.ones(c, bool)))
    b = np.asarray(gs.diversity_dedupe(
        jnp.asarray(chain, jnp.float32), jnp.ones(c, bool), mode="rounds"))
    assert (a == b).all()


def test_sample_goals_respects_mask_and_capacity():
    key = jax.random.PRNGKey(0)
    valid = jnp.asarray([True] * 5 + [False] * 15)
    idx, mask = gs.sample_goals(key, valid, 8)
    assert int(mask.sum()) == 5  # only 5 valid candidates exist
    chosen = np.array(idx)[np.array(mask)]
    assert set(chosen).issubset(set(range(5)))

    valid2 = jnp.asarray([True] * 20)
    idx2, mask2 = gs.sample_goals(key, valid2, 8)
    assert int(mask2.sum()) == 8
    assert len(set(np.array(idx2).tolist())) == 8  # without replacement


def test_z_upsample_rotates_about_object_origin():
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.5, 0.0, 0.3]))
    obj_pos = jnp.asarray([0.4, 0.0, 0.3])
    out = gs.z_upsample_poses(pose[None], obj_pos, bins=8)
    assert out.shape == (8, 4, 4)
    # distance from object origin preserved under each rotation
    d0 = np.linalg.norm(np.array(pose)[:3, 3] - np.array(obj_pos))
    d = np.linalg.norm(np.array(out)[:, :3, 3] - np.array(obj_pos), axis=1)
    np.testing.assert_allclose(d, d0, atol=1e-5)


def test_y_upsample_preserves_finger_contact():
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.5, 0.1, 0.3]))
    out = gs.y_upsample_poses(pose[None], bins=5)
    assert out.shape == (5, 4, 4)
    finger = np.array([0, 0, 0.13])
    contacts = np.array([
        np.array(p)[:3, :3] @ finger + np.array(p)[:3, 3] for p in out])
    np.testing.assert_allclose(contacts, np.tile(contacts[0], (5, 1)), atol=1e-5)


def test_ycb_special_case_bowl():
    from omg_planner_tpu.io.reference_data import ycb_special_case
    rng = np.random.default_rng(0)
    # mostly-sideways grasps (large y euler) should survive the bowl filter
    poses = np.tile(np.eye(4), (10, 1, 1))
    for i in range(10):
        ang = rng.uniform(-np.pi / 2, np.pi / 2)
        poses[i, :3, :3] = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)]])
        poses[i, :3, 3] = rng.normal(scale=0.05, size=3)
    out = ycb_special_case(poses.copy(), "024_bowl")
    angles = np.abs(np.arcsin(-np.clip(poses[:, 2, 0], -1, 1)))
    expected = (angles > 50 * np.pi / 180).sum()
    assert len(out) == expected


def test_grasp_optimize_prefers_top_down():
    """With grasp_optimize on, goal potentials include a lift-stability
    term favoring top-down approaches (beyond-reference feature; the
    reference declares but never implements its grasp cost)."""
    from omg_planner_tpu.planner.scene import PlanningScene
    cfg = OMGConfig(optim_steps=3, extra_smooth_steps=1, goal_set_max_num=12,
                    ik_seed_num=3, ik_max_iters=25, learner_interp_steps=5,
                    silent=True)
    s1 = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=0)
    g1 = s1.build_goal_set()
    s2 = PlanningScene.synthetic(cfg.replace(grasp_optimize=True),
                                 scene_id=0, n_obstacles=0)
    g2 = s2.build_goal_set()
    m1 = np.array(g1.mask); m2 = np.array(g2.mask)
    assert m1.sum() > 0 and m2.sum() > 0
    # the quality term strictly increases potentials (quality >= 0)
    assert float(np.array(g2.potentials)[m2].mean()) >= \
        float(np.array(g1.potentials)[m1].mean()) - 1e-6


def test_grip_quality_weight_shifts_potentials():
    """cfg.grip_quality_weight folds the pinch-center-to-COM distance
    into the goal potentials (VERDICT r4 item 2); selection and masks
    are unchanged, potentials shift by weight * distance."""
    import numpy as np
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.planner.goal_set import pinch_centers

    base = OMGConfig(silent=True, optim_steps=5, extra_smooth_steps=2,
                     goal_set_max_num=10, ik_seed_num=3, ik_max_iters=25,
                     learner_interp_steps=8)
    outs = {}
    for w in (0.0, 5.0):
        sc = PlanningScene.synthetic(base.replace(grip_quality_weight=w),
                                     scene_id=0, n_obstacles=1)
        outs[w] = (sc, sc.build_goal_set())
    sc0, gs0 = outs[0.0]
    sc5, gs5 = outs[5.0]
    assert np.array_equal(np.asarray(gs0.mask), np.asarray(gs5.mask))
    assert np.allclose(np.asarray(gs0.grasps), np.asarray(gs5.grasps))
    com = np.asarray(sc0.env.target.pose_mat[:3, 3])
    pc = np.asarray(pinch_centers(sc0.model, gs0.grasps))
    dist = np.linalg.norm(pc - com[None], axis=-1)
    mask = np.asarray(gs0.mask)
    got = np.asarray(gs5.potentials) - np.asarray(gs0.potentials)
    assert np.allclose(got[mask], 5.0 * dist[mask], atol=1e-4)
