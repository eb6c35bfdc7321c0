"""CHOMP cost/optimizer unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.ops import chomp
from omg_planner_tpu.ops.sdf import SignedDensityField, combine_sdfs
from omg_planner_tpu.utils.spline import cubic_interpolate


def _scene_one_sphere():
    f = SignedDensityField.from_analytic("sphere", [0.08], delta=0.01)
    f.penalize_inside(5.0)
    scene = combine_sdfs([f])
    pose = np.eye(4)
    pose[:3, 3] = [0.24, 0.0, 0.79]  # on the test sweep's hand path
    params = chomp.CostParams(
        inv_poses=jnp.asarray(np.linalg.inv(pose)[None], jnp.float32),
        epsilons=jnp.asarray([0.2]), padding_scales=jnp.asarray([1.0]),
        clearances=jnp.asarray([0.01]), disables=jnp.asarray([0.0]),
        target_idx=jnp.asarray(0))
    return scene, params


def test_smooth_loss_gradient_is_exact():
    """smoothness grad must equal the autodiff gradient of the loss."""
    cfg = OMGConfig()
    hp = cfg.horizon()
    rng = np.random.default_rng(11)
    xi = jnp.asarray(rng.normal(size=(30, 9)), jnp.float32)
    start = jnp.asarray(rng.normal(size=9), jnp.float32)
    end = jnp.asarray(rng.normal(size=9), jnp.float32)

    def loss_sum(x):
        # same quantity as smooth_loss but written without norm() (whose AD
        # is NaN on the exactly-zero final row)
        d1 = jnp.asarray(hp.diff_matrices[0])
        ed = jnp.zeros((x.shape[0] + 1, x.shape[1])).at[0].set(
            -start / hp.time_interval)
        return 0.5 * jnp.sum((d1 @ x + ed) ** 2)

    _, grad = chomp.smooth_loss(hp, cfg, xi, start, end)
    grad_ad = jax.grad(loss_sum)(xi)
    np.testing.assert_allclose(np.array(grad), np.array(grad_ad),
                               rtol=1e-3, atol=1e-2)


def test_projection_pins_tail_to_goal():
    """After one projected step with zero gradient, the trajectory tail
    must land exactly on the chosen goal tail (the -M b term)."""
    cfg = OMGConfig()
    hp = cfg.horizon()
    rng = np.random.default_rng(12)
    xi = jnp.asarray(rng.normal(size=(30, 9)), jnp.float32)
    tail = jnp.asarray(rng.normal(size=(5, 9)), jnp.float32)
    upd = chomp.goal_set_projection_update(
        hp, cfg, xi, jnp.zeros((30, 9)), tail, 0.1)
    new = xi + upd
    np.testing.assert_allclose(np.array(new[-5:]), np.array(tail), atol=1e-3)


def test_projection_preserves_tail_under_gradient():
    """The projected gradient component must not move the constrained
    rows: C @ (P_k @ g) = 0."""
    cfg = OMGConfig()
    hp = cfg.horizon()
    rng = np.random.default_rng(13)
    g = rng.normal(size=(30, 9)).astype(np.float32)
    for k in (1, 5):
        _, p_k = hp.proj[k]
        np.testing.assert_allclose((p_k @ g)[-k:], 0.0, atol=1e-4)


def test_joint_limit_projection():
    cfg = OMGConfig()
    hp = cfg.horizon()
    model = panda.load_panda()
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    start = jnp.zeros(9)
    end = jnp.zeros(9)
    xi = cubic_interpolate(start, end, 30) + 0.0
    # push some joints far over the limit
    xi = xi.at[10:15, 1].set(float(hi[1]) + 0.6)
    out = chomp.handle_joint_limit(hp, cfg, xi, lo, hi)
    viol = np.maximum(np.array(out) - np.array(hi), 0) + \
        np.maximum(np.array(lo) - np.array(out), 0)
    assert np.linalg.norm(viol) < 0.15  # smoothed projection reduces it
    assert np.linalg.norm(viol) < 0.6   # strictly better than before


def test_obstacle_gradient_pushes_away():
    """A trajectory passing through a sphere must get a gradient that
    decreases the obstacle cost when followed."""
    cfg = OMGConfig(top_k_collision=0)  # dense gradient branch
    hp = cfg.horizon()
    model = panda.load_panda()
    scene, params = _scene_one_sphere()
    # trajectory that sweeps the arm near/through the sphere
    start = jnp.asarray([0.0, -1.285, 0.0, -2.356, 0.0, 1.571, 0.785,
                         0.04, 0.04], jnp.float32)
    end = jnp.asarray([0.0, -0.4, 0.0, -1.4, 0.0, 1.2, 0.785, 0.04, 0.04],
                      jnp.float32)
    xi = cubic_interpolate(start, end, 30)
    o_cost, o_grad, collide = chomp.compute_collision_loss(
        model, scene, params, cfg, hp, xi, start, end)
    c0 = float(o_cost.sum())
    assert c0 > 0  # the sweep is near the obstacle
    # take a small step along the negative gradient (plain, unmetric)
    xi2 = xi - 0.05 * o_grad
    o_cost2, _, _ = chomp.compute_collision_loss(
        model, scene, params, cfg, hp, xi2, start, end)
    assert float(o_cost2.sum()) < c0


def test_topk_matches_dense_when_k_large():
    cfg_dense = OMGConfig(top_k_collision=0, consider_finger=True)
    cfg_topk = OMGConfig(top_k_collision=10**6, consider_finger=True)
    hp = cfg_dense.horizon()
    model = panda.load_panda()
    scene, params = _scene_one_sphere()
    start = jnp.asarray([0.0, -1.285, 0.0, -2.356, 0.0, 1.571, 0.785,
                         0.04, 0.04], jnp.float32)
    end = jnp.asarray([0.0, -0.4, 0.0, -1.4, 0.0, 1.2, 0.785, 0.04, 0.04],
                      jnp.float32)
    xi = cubic_interpolate(start, end, 30)
    c1, g1, _ = chomp.compute_collision_loss(
        model, scene, params, cfg_dense, hp, xi, start, end)
    c2, g2, _ = chomp.compute_collision_loss(
        model, scene, params, cfg_topk, hp, xi, start, end)
    np.testing.assert_allclose(np.array(c1), np.array(c2), rtol=1e-5)
    np.testing.assert_allclose(np.array(g1), np.array(g2), rtol=1e-5)


def test_termination_flags():
    cfg = OMGConfig()
    hp = cfg.horizon()
    model = panda.load_panda()
    scene, params = _scene_one_sphere()
    # move the sphere far from the workspace so the path is collision-free
    far = np.eye(4); far[:3, 3] = [1.5, 1.5, 0.2]
    params = params._replace(
        inv_poses=jnp.asarray(np.linalg.inv(far)[None], jnp.float32))
    start = jnp.asarray([0.0, -1.285, 0.0, -2.356, 0.0, 1.571, 0.785,
                         0.04, 0.04], jnp.float32)
    goal = jnp.asarray([0.3, -1.0, 0.2, -2.0, 0.1, 1.4, 0.5, 0.04, 0.04],
                       jnp.float32)
    xi = cubic_interpolate(start, goal, 30)
    xi = xi.at[-1].set(goal)  # end exactly at goal
    _, _, info = chomp.compute_total_loss(
        model, scene, params, cfg, hp, xi, start, goal, goal, 1.0, 0.1)
    assert float(info.reach) < 1e-5
    assert bool(info.terminate)  # smooth spline, away from sphere
    assert not bool(info.failure_terminate)
