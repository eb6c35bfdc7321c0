"""A non-Panda robot plans end-to-end through the SAME plan loop
(VERDICT r1 item 6): a 6-DOF UR-like chain from URDF, planned with
``goal_set_proj=False`` (fixed goal configuration — grasp-DB goal sets
are panda_hand machinery by design; see ``models/api.py``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import api as model_api
from omg_planner_tpu.models.chain import (
    chain_fk, load_urdf_chain, with_collision_points)
from omg_planner_tpu.ops.chomp import CostParams, GoalSet
from omg_planner_tpu.ops.sdf import SignedDensityField, combine_sdfs
from omg_planner_tpu.planner.plan import (
    PlanProblem, PlanResult, init_trajectory, plan, plan_fast)
from omg_planner_tpu.ops.sdf import WorldPotential


def _ur_urdf():
    """A UR5-ish 6-DOF serial arm (lengths approximate; structure real)."""
    def joint(name, parent, child, xyz, rpy, axis, lo=-3.1, hi=3.1,
              jtype="revolute"):
        return f"""
  <joint name="{name}" type="{jtype}">
    <parent link="{parent}"/><child link="{child}"/>
    <origin xyz="{xyz}" rpy="{rpy}"/><axis xyz="{axis}"/>
    <limit lower="{lo}" upper="{hi}"/>
  </joint>
  <link name="{child}"/>"""

    return ("""<robot name="ur_like">
  <link name="base_link"/>"""
            + joint("shoulder_pan", "base_link", "shoulder", "0 0 0.089",
                    "0 0 0", "0 0 1")
            + joint("shoulder_lift", "shoulder", "upper_arm", "0 0.135 0",
                    "0 1.570796 0", "0 1 0")
            + joint("elbow", "upper_arm", "forearm", "0 -0.119 0.425",
                    "0 0 0", "0 1 0")
            + joint("wrist_1", "forearm", "wrist1", "0 0 0.392",
                    "0 1.570796 0", "0 1 0")
            + joint("wrist_2", "wrist1", "wrist2", "0 0.093 0",
                    "0 0 0", "0 0 1")
            + joint("wrist_3", "wrist2", "tool0", "0 0 0.094",
                    "0 0 0", "0 1 0")
            + "\n</robot>")


@pytest.fixture(scope="module")
def ur_model():
    m = load_urdf_chain(_ur_urdf(), "base_link", "tool0",
                        collision_points_per_link=8)
    # modest capsule clouds along each link's +z
    rng = np.random.default_rng(3)
    pts = rng.normal(scale=0.02, size=(m.num_joints, 8, 3))
    pts[..., 2] += np.linspace(0, 0.15, 8)[None, :]
    return with_collision_points(m, pts)


def _one_box_scene():
    sdf = SignedDensityField.from_analytic("box", [0.2, 0.2, 0.4],
                                           delta=0.02)
    sdf.penalize_inside(5.0)
    scene = combine_sdfs([sdf])
    pose = np.eye(4)
    pose[:3, 3] = [0.7, 0.0, 0.3]  # a pillar off to the robot's side
    params = CostParams(
        inv_poses=jnp.asarray(np.linalg.inv(pose)[None], jnp.float32),
        epsilons=jnp.asarray([0.2], jnp.float32),
        padding_scales=jnp.asarray([1.0], jnp.float32),
        clearances=jnp.asarray([0.0], jnp.float32),
        disables=jnp.asarray([0.0], jnp.float32),
        target_idx=jnp.asarray(0, jnp.int32))
    return scene, params


def _chain_problem(model, cfg, start, end):
    scene, params = _one_box_scene()
    d = model.num_dof
    g = GoalSet(grasps=jnp.tile(end[None], (4, 1)),
                reach_grasps=jnp.tile(end[None, None],
                                      (4, cfg.reach_tail_length, 1)),
                mask=jnp.ones(4, bool), potentials=jnp.zeros(4))
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    return PlanProblem(
        start=start, end=end,
        traj_init=init_trajectory(cfg, start, end),
        goal_set=g, scene=scene, cost_params=params,
        joint_lower=lo, joint_upper=hi,
        world_potential=WorldPotential(
            data=jnp.zeros((2, 2, 2)), origin=jnp.zeros(3),
            delta=jnp.asarray(1.0)))


def test_chain_jacobian_matches_jacfwd(ur_model):
    """The generic point_jacobians (api._chain_tables route) equal
    autodiff of the chain FK."""
    q = jnp.asarray([0.3, -0.7, 1.1, -0.4, 0.8, 0.2])

    def points_of(qq):
        poses = chain_fk(ur_model, qq)
        return model_api.point_positions(ur_model, poses)

    auto = jax.jacfwd(points_of)(q)  # [L, P, 3, D]
    poses, og, ax = chain_fk(ur_model, q, return_joint_info=True)
    x = model_api.point_positions(ur_model, poses)
    ours = model_api.point_jacobians(
        ur_model, og[None], ax[None], x[None])[0]  # [L, P, D, 3]
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(np.asarray(auto), -1, -2), atol=1e-5)


def test_chain_model_is_jit_argument_safe(ur_model):
    """Static jtype metadata: FK traces with the model as a jit ARG."""
    f = jax.jit(lambda m, q: chain_fk(m, q))
    out = f(ur_model, jnp.zeros(6))
    assert out.shape == (ur_model.num_joints, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_chain_plans_end_to_end(ur_model):
    cfg = OMGConfig(silent=True, goal_set_proj=False, use_standoff=False,
                    optim_steps=25, extra_smooth_steps=10)
    start = jnp.asarray([0.0, -1.2, 1.6, -0.5, 0.0, 0.0])
    end = jnp.asarray([1.2, -0.9, 1.2, -0.8, 0.6, 0.3])
    problem = _chain_problem(ur_model, cfg, start, end)

    res: PlanResult = jax.jit(
        plan_fast, static_argnums=(1,))(ur_model, cfg.jit_key(), problem)
    traj = np.asarray(res.traj)
    assert traj.shape == (cfg.timesteps, 6)
    assert np.isfinite(traj).all()
    # endpoint is pulled to the fixed goal by the boundary conditions
    assert np.abs(traj[-1] - np.asarray(end)).max() < 0.15, traj[-1]
    assert float(res.info.collide) <= cfg.allow_collision_point

    # the history-mode loop runs the same problem
    res_h = jax.jit(plan, static_argnums=(1,))(
        ur_model, cfg.jit_key(), problem)
    np.testing.assert_allclose(np.asarray(res_h.traj), traj, atol=1e-5)
