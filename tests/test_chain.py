"""General chain model: URDF parsing, FK correctness, Jacobians."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.models import chain

TWO_LINK = """
<robot name="rr">
  <link name="base"/><link name="l1"/><link name="l2"/><link name="tip"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.1" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0.5 0 0" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3"/>
  </joint>
  <joint name="jt" type="fixed">
    <parent link="l2"/><child link="tip"/>
    <origin xyz="0.4 0 0" rpy="0 0 0"/>
  </joint>
</robot>
"""


def test_two_link_planar_fk():
    m = chain.load_urdf_chain(TWO_LINK, "base", "tip")
    assert m.num_joints == 3 and m.num_dof == 2
    q = jnp.asarray([np.pi / 2, -np.pi / 2], jnp.float32)
    poses = chain.chain_fk(m, q)
    # classic RR arm: link1 0.5 along +y (after 90deg), tip back to +x dir
    np.testing.assert_allclose(np.array(poses[1][:3, 3]),
                               [0.0, 0.5, 0.1], atol=1e-6)
    np.testing.assert_allclose(np.array(poses[2][:3, 3]),
                               [0.4, 0.5, 0.1], atol=1e-6)


def test_chain_fk_matches_autodiff_jacobian():
    m = chain.load_urdf_chain(TWO_LINK, "base", "tip",
                              collision_points_per_link=4)
    q = jnp.asarray([0.3, -0.7], jnp.float32)
    jac, x = chain.chain_point_jacobians(m, q)

    def pts(qq):
        poses = chain.chain_fk(m, qq)
        return jnp.einsum("jab,jpb->jpa", poses[:, :3, :3],
                          m.collision_points) + poses[:, None, :3, 3]

    jac_fd = jnp.moveaxis(jax.jacfwd(pts)(q), -1, -2)  # [J,P,dof,3]
    np.testing.assert_allclose(np.array(jac), np.array(jac_fd), atol=1e-5)


def test_prismatic_joint():
    urdf = TWO_LINK.replace(
        '<joint name="j2" type="revolute">',
        '<joint name="j2" type="prismatic">')
    m = chain.load_urdf_chain(urdf, "base", "tip")
    q = jnp.asarray([0.0, 0.25], jnp.float32)
    poses = chain.chain_fk(m, q)
    # slide 0.25 along +z axis of joint 2
    np.testing.assert_allclose(np.array(poses[1][:3, 3]),
                               [0.5, 0.0, 0.35], atol=1e-6)


def test_batched_chain_fk():
    m = chain.load_urdf_chain(TWO_LINK, "base", "tip")
    qs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (5, 2)),
                     jnp.float32)
    batch = chain.chain_fk_batch(m, qs)
    assert batch.shape == (5, 3, 4, 4)
    one = chain.chain_fk(m, qs[2])
    np.testing.assert_allclose(np.array(batch[2]), np.array(one), atol=1e-6)
