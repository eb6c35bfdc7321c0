"""IK round-trip and standoff-chain tests."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.ops import ik


def test_ik_roundtrip():
    model = panda.load_panda()
    cfg = OMGConfig()
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    rng = np.random.default_rng(11)
    n_ok = 0
    for _ in range(8):
        q7 = rng.uniform(np.array(lo[:7]) + 0.1, np.array(hi[:7]) - 0.1)
        q9 = jnp.asarray(np.concatenate([q7, [0.04, 0.04]]), jnp.float32)
        target = panda.hand_pose(model, q9)
        seed = jnp.asarray(q7 + rng.normal(scale=0.2, size=7), jnp.float32)
        res = ik.ik_single(model, target, seed, cfg, lo[:7], hi[:7])
        if bool(res.success):
            n_ok += 1
            hand = panda.hand_pose(
                model,
                jnp.concatenate([res.q, jnp.asarray([0.04, 0.04])]))
            np.testing.assert_allclose(
                np.array(hand)[:3, 3], np.array(target)[:3, 3], atol=5e-3)
    assert n_ok >= 6  # most perturbed seeds should converge


def test_standoff_chain_valid_and_smooth():
    model = panda.load_panda()
    cfg = OMGConfig()
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    # a reachable hand pose in front of the robot
    q9 = jnp.asarray([0.0, -0.8, 0.0, -2.0, 0.0, 1.6, 0.785, 0.04, 0.04],
                     jnp.float32)
    grasp = panda.hand_pose(model, q9)
    tail = cfg.reach_tail_length
    offs = np.tile(np.eye(4), (tail, 1, 1))
    offs[:, 2, 3] = -cfg.standoff_dist * np.arange(tail) / tail
    standoffs = jnp.asarray(np.array(grasp) @ offs, jnp.float32)
    seed = q9[:7]
    reach, standoff, valid = ik.solve_standoff_chain(
        model, grasp, standoffs, seed, cfg, lo[:7], hi[:7])
    assert bool(valid)
    assert reach.shape == (tail, 9)
    # last tail waypoint is at the grasp, first is the farthest standoff
    hand_last = panda.hand_pose(model, reach[-1])
    np.testing.assert_allclose(np.array(hand_last)[:3, 3],
                               np.array(grasp)[:3, 3], atol=5e-3)
    hand_first = panda.hand_pose(model, reach[0])
    d = np.linalg.norm(np.array(hand_first)[:3, 3] - np.array(grasp)[:3, 3])
    assert 0.04 < d < 0.09  # approx standoff_dist * (tail-1)/tail = 0.064


def test_solve_goal_set_batch():
    model = panda.load_panda()
    cfg = OMGConfig()
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    qs = jnp.asarray([
        [0.0, -0.8, 0.0, -2.0, 0.0, 1.6, 0.785, 0.04, 0.04],
        [0.3, -1.0, 0.2, -2.2, 0.1, 1.5, 0.5, 0.04, 0.04],
    ], jnp.float32)
    grasps = jax.vmap(lambda q: panda.hand_pose(model, q))(qs)
    seeds = jnp.stack([qs[0, :7], qs[1, :7]])
    reach, standoff, valid, lane_idx = ik.solve_goal_set(
        model, cfg, grasps, seeds, lo[:7], hi[:7])
    assert reach.shape == (4, cfg.reach_tail_length, 9)
    assert standoff.shape == (4, 9)
    assert np.array(valid).sum() >= 2
    # lane indices map back to the original (grasp-major) layout
    assert set(np.array(lane_idx).tolist()) == {0, 1, 2, 3}


def test_two_stage_matches_single_stage_validity():
    """The compacted two-stage solve must find the same valid goals as the
    exhaustive solve (quality guard for VERDICT r1 item 2)."""
    model = panda.load_panda()
    lo, hi = model.soft_limits(OMGConfig().soft_joint_limit_padding)
    rng = np.random.default_rng(3)
    qs = []
    for _ in range(6):
        q7 = rng.uniform(np.array(lo[:7]) * 0.5, np.array(hi[:7]) * 0.5)
        qs.append(np.concatenate([q7, [0.04, 0.04]]))
    qs = jnp.asarray(np.stack(qs), jnp.float32)
    grasps = jax.vmap(lambda q: panda.hand_pose(model, q))(qs)
    seeds = qs[:3, :7]

    cfg1 = OMGConfig(ik_two_stage=False)
    cfg2 = OMGConfig(ik_two_stage=True)
    r1 = ik.solve_goal_set(model, cfg1, grasps, seeds, lo[:7], hi[:7])
    r2 = ik.solve_goal_set(model, cfg2, grasps, seeds, lo[:7], hi[:7])
    # same lane count here (cap > B), so compare per-lane validity after
    # un-permuting the compacted layout
    v1 = np.array(r1[2])
    v2 = np.zeros_like(v1)
    v2[np.array(r2[3])] = np.array(r2[2])
    # two-stage may legitimately drop a lane whose prefilter stalls, but on
    # these easy reachable targets the sets must agree
    np.testing.assert_array_equal(v1, v2)


def test_fused_chain_matches_scanned_chain():
    """cfg.ik_chain_fused: same valid set and sub-tolerance-equal
    solutions on reachable targets (per-lane stage advancement stops each
    lane at its own convergence instant, so exact bit-equality is not
    expected — ops/ik.py::_solve_chain_fused docstring)."""
    model = panda.load_panda()
    lo, hi = model.soft_limits(OMGConfig().soft_joint_limit_padding)
    rng = np.random.default_rng(17)
    base = np.array([[0.0, -0.8, 0.0, -2.0, 0.0, 1.6, 0.785, 0.04, 0.04],
                     [0.3, -1.0, 0.2, -2.2, 0.1, 1.5, 0.5, 0.04, 0.04]])
    qs = np.concatenate([
        base, base + rng.normal(size=(2, 9)) * 0.15,
        base + rng.normal(size=(2, 9)) * 0.15])
    qs[:, 7:] = 0.04
    qs = jnp.asarray(qs, jnp.float32)
    grasps = jax.vmap(lambda q: panda.hand_pose(model, q))(qs)
    seeds = qs[:3, :7]

    r_scan = ik.solve_goal_set(
        model, OMGConfig(), grasps, seeds, lo[:7], hi[:7])
    r_fused = ik.solve_goal_set(
        model, OMGConfig(ik_chain_fused=True), grasps, seeds,
        lo[:7], hi[:7])
    v_scan, v_fused = np.array(r_scan[2]), np.array(r_fused[2])
    np.testing.assert_array_equal(v_scan, v_fused)
    both = v_scan & v_fused
    for a, b in ((r_scan[0], r_fused[0]), (r_scan[1], r_fused[1])):
        d = np.abs(np.array(a) - np.array(b)).reshape(len(both), -1).max(1)
        assert d[both].max() < 5e-3, d[both].max()
