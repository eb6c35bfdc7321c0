"""General serial-chain kinematics from URDF (multi-robot support).

The Panda model (``models/panda.py``) ships as baked tables in the
reference's chain convention.  This module generalizes the framework to any
fixed-base serial manipulator: a :class:`ChainModel` holds per-joint fixed
origin transforms + axes + types parsed from a URDF (stdlib
``xml.etree``, no ROS deps), with the same batched-FK / joint-info /
collision-point interface the planner consumes.

The reference vendors a full ROS ``urdf_parser_py`` + KDL tree builder for
this job (``ycb_render/robotPose/kdl_parser.py``, ``urdf_parser_py/``);
here the chain is data, and FK is 20 lines of composed transforms.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

REVOLUTE = 0
PRISMATIC = 1
FIXED = 2


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["origin", "axis", "lower", "upper", "collision_points"],
    meta_fields=["jtype"])
@dataclasses.dataclass(frozen=True)
class ChainModel:
    """A fixed-base serial chain.

    ``origin[j]`` is the constant transform from link j-1's frame to the
    joint-j frame; joint motion applies about/along ``axis[j]`` in that
    frame.  ``jtype`` is STATIC metadata (a tuple, not an array) so the
    chain structure stays concrete when the model is a jit argument —
    FK unrolls over it at trace time, exactly like the Panda tables.
    """

    origin: jnp.ndarray       # [J, 4, 4]
    axis: jnp.ndarray         # [J, 3]
    lower: jnp.ndarray        # [J] (0 for fixed)
    upper: jnp.ndarray        # [J]
    collision_points: jnp.ndarray  # [J, P, 3] body points per link
    jtype: tuple              # [J] ints (REVOLUTE/PRISMATIC/FIXED), static

    def _replace(self, **kw) -> "ChainModel":
        return dataclasses.replace(self, **kw)

    @property
    def num_joints(self) -> int:
        return self.origin.shape[0]

    @property
    def num_dof(self) -> int:
        return int(np.sum(np.asarray(self.jtype) != FIXED))

    @property
    def num_collision_points(self) -> int:
        return self.collision_points.shape[1]

    def soft_limits(self, padding: float):
        """Soft joint limits: pad every moving joint (the Panda pads only
        its arm joints; a generic chain has no gripper convention)."""
        moving = jnp.asarray(
            np.array(self.jtype) != FIXED, self.lower.dtype)
        dof_idx = np.where(np.asarray(self.jtype) != FIXED)[0]
        lo = (self.lower + padding * moving)[dof_idx]
        hi = (self.upper - padding * moving)[dof_idx]
        return lo, hi


def _axis_angle_mat(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Rodrigues rotation as a 4x4."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y, z = axis[0], axis[1], axis[2]
    k = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    r = jnp.eye(3) + s * k + (1 - c) * (k @ k)
    m = jnp.eye(4)
    return m.at[:3, :3].set(r)


def chain_fk(model: ChainModel, q: jnp.ndarray,
             return_joint_info: bool = False):
    """FK for one configuration ``q [num_dof]`` -> link poses [J, 4, 4].

    Fixed joints consume no q entry.  vmap over a leading axis for batches.
    """
    jtypes = np.asarray(model.jtype)
    qi = 0
    cur = jnp.eye(4)
    poses, origins, axes = [], [], []
    for j in range(model.num_joints):
        pre = cur @ model.origin[j]
        axis_w = pre[:3, :3] @ model.axis[j]
        origins.append(pre[:3, 3])
        axes.append(axis_w)
        if jtypes[j] == REVOLUTE:
            cur = pre @ _axis_angle_mat(model.axis[j], q[qi])
            qi += 1
        elif jtypes[j] == PRISMATIC:
            t = jnp.eye(4).at[:3, 3].set(model.axis[j] * q[qi])
            cur = pre @ t
            qi += 1
        else:
            cur = pre
        poses.append(cur)
    out = jnp.stack(poses)
    if return_joint_info:
        return out, jnp.stack(origins), jnp.stack(axes)
    return out


chain_fk_batch = jax.vmap(chain_fk, in_axes=(None, 0))


def chain_fk_with_joint_info_batch(model: ChainModel, q: jnp.ndarray):
    """Batched FK with world joint origins/axes:
    q [n, dof] -> ([n, J, 4, 4], [n, J, 3], [n, J, 3])."""
    return jax.vmap(
        lambda qq: chain_fk(model, qq, return_joint_info=True))(q)


def chain_point_jacobians(model: ChainModel, q: jnp.ndarray):
    """Linear Jacobians of every collision point: [J_links, P, dof, 3]."""
    jtypes = np.asarray(model.jtype)
    moving = [j for j in range(model.num_joints) if jtypes[j] != FIXED]
    poses, origins, axes = chain_fk(model, q, return_joint_info=True)
    x = jnp.einsum("jab,jpb->jpa", poses[:, :3, :3],
                   model.collision_points) + poses[:, None, :3, 3]
    jac = []
    for d, j in enumerate(moving):
        rel = x - origins[j][None, None, :]
        if jtypes[j] == REVOLUTE:
            col = jnp.cross(jnp.broadcast_to(axes[j], rel.shape), rel)
        else:
            col = jnp.broadcast_to(axes[j], rel.shape)
        # joint j moves its child link and everything after it
        mask = (jnp.arange(model.num_joints) >= j).astype(col.dtype)
        jac.append(col * mask[:, None, None])
    return jnp.stack(jac, axis=2), x  # [J, P, dof, 3], [J, P, 3]


def _rpy_mat(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr]])


def load_urdf_chain(path_or_xml: str, base_link: str, tip_link: str,
                    collision_points_per_link: int = 15,
                    point_extent: float = 0.05) -> ChainModel:
    """Parse a URDF and extract the base->tip chain.

    Collision points default to a small synthetic capsule per link; pass
    real per-link clouds via :func:`with_collision_points`.
    """
    import xml.etree.ElementTree as ET

    root = (ET.fromstring(path_or_xml) if path_or_xml.lstrip().startswith("<")
            else ET.parse(path_or_xml).getroot())

    joints = {}
    child_of = {}
    for j in root.findall("joint"):
        name = j.get("name")
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        origin_el = j.find("origin")
        xyz = [float(v) for v in (origin_el.get("xyz", "0 0 0").split()
                                  if origin_el is not None else "0 0 0".split())]
        rpy = [float(v) for v in (origin_el.get("rpy", "0 0 0").split()
                                  if origin_el is not None else "0 0 0".split())]
        axis_el = j.find("axis")
        axis = [float(v) for v in (axis_el.get("xyz").split()
                                   if axis_el is not None else "1 0 0".split())]
        jt = j.get("type", "fixed")
        limit_el = j.find("limit")
        lo = float(limit_el.get("lower", 0.0)) if limit_el is not None else 0.0
        hi = float(limit_el.get("upper", 0.0)) if limit_el is not None else 0.0
        joints[child] = dict(name=name, parent=parent, xyz=xyz, rpy=rpy,
                             axis=axis, type=jt, lower=lo, upper=hi)
        child_of.setdefault(parent, []).append(child)

    # walk tip -> base
    chain = []
    link = tip_link
    while link != base_link:
        if link not in joints:
            raise ValueError(f"no joint chain from {base_link} to {tip_link}")
        chain.append(joints[link])
        link = joints[link]["parent"]
    chain.reverse()

    n = len(chain)
    origin = np.tile(np.eye(4), (n, 1, 1))
    axis = np.zeros((n, 3))
    jtype = np.full(n, FIXED)
    lower = np.zeros(n)
    upper = np.zeros(n)
    for i, j in enumerate(chain):
        origin[i, :3, :3] = _rpy_mat(*j["rpy"])
        origin[i, :3, 3] = j["xyz"]
        a = np.asarray(j["axis"], float)
        axis[i] = a / (np.linalg.norm(a) + 1e-12)
        if j["type"] in ("revolute", "continuous"):
            jtype[i] = REVOLUTE
        elif j["type"] == "prismatic":
            jtype[i] = PRISMATIC
        lower[i], upper[i] = j["lower"], j["upper"]

    # synthetic per-link capsule points
    rng = np.random.default_rng(0)
    pts = rng.normal(scale=point_extent / 2, size=(n, collision_points_per_link, 3))
    return ChainModel(
        origin=jnp.asarray(origin, jnp.float32),
        axis=jnp.asarray(axis, jnp.float32),
        jtype=tuple(int(t) for t in jtype),
        lower=jnp.asarray(lower, jnp.float32),
        upper=jnp.asarray(upper, jnp.float32),
        collision_points=jnp.asarray(pts, jnp.float32))


def with_collision_points(model: ChainModel, points: np.ndarray) -> ChainModel:
    return model._replace(collision_points=jnp.asarray(points, jnp.float32))
