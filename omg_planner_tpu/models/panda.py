"""Franka Panda kinematics as pure, batched JAX.

Replaces the reference's PyKDL + pickled-table stack
(``ycb_render/robotPose/robot_pykdl.py:88-215``) with a closed-form chain:

    b_i = pose_0[i] @ Rz(q_i) @ Rx(offset_i)            (i = 0..6)
    b_i[:, cols 1,2] *= -1                              (i > 0)
    link_i = link_{i-1} @ b_i

followed by the hand (fixed) and the two prismatic finger links.  The chain
semantics — rest poses, DH offsets, the column sign-flip convention, the
finger y-offsets, and the joint-frame tables used for Jacobians — reproduce
``forward_kinematics_parallel`` exactly, but the interface is TPU-native:
**radians**, a 9-vector ``[q1..q7, f_left, f_right]`` (the reference wraps
through degrees and a dummy hand joint, ``omg/util.py:185-202``), and every
function is jit/vmap-friendly.

Note on joint origins: the reference assigns
``self._joint_origin = robot_info["_joint_axis"]`` (robot_pykdl.py:104) and
builds Jacobian origins from the *axis* table, which puts its CHOMP lever
arms off by a few cm for joints 4/5/7.  We instead take exact joint frames
from the chain (validated against ``jax.jacfwd`` of the FK itself).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                      "panda_kinematics.npz")
_COLLISION_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                                "panda_collision_points.npz")

NUM_LINKS = 10  # link1..link7, hand, leftfinger, rightfinger
DOF = 9

# dof -> joint-axis-table index (table has 10 rows; index 7 is the fixed hand
# joint, 8/9 the prismatic fingers).
_DOF_TO_AXIS = np.array([0, 1, 2, 3, 4, 5, 6, 8, 9])

# affect[j, d]: does dof d move link j?  Arm links move with joints <= their
# index; hand/fingers move with all arm joints; each finger adds its own
# prismatic dof.  (Encodes the reference's ``wrap_index``/``wrap_joint``
# maps, ``omg/util.py:205-220``.)
_AFFECT = np.zeros((NUM_LINKS, DOF), dtype=np.float32)
for _j in range(NUM_LINKS):
    for _d in range(7):
        _AFFECT[_j, _d] = 1.0 if (_j >= 7 or _d <= _j) else 0.0
_AFFECT[8, 7] = 1.0  # left finger prismatic
_AFFECT[9, 8] = 1.0  # right finger prismatic
_PRISMATIC = np.zeros(DOF, dtype=np.float32)
_PRISMATIC[7:] = 1.0


# (id(lower), id(upper), padding) -> (lower, upper, lo, hi); see
# PandaModel.soft_limits
_SOFT_LIMITS_CACHE: dict = {}


class PandaModel(NamedTuple):
    """Constant kinematic tables (a pytree of arrays; safe to close over)."""

    pose_0: jnp.ndarray        # [10, 4, 4] rest poses
    chain_post: jnp.ndarray    # [7, 4, 4]  Rx(offset_i) (+ column flip, i>0)
    tip2joint: jnp.ndarray     # [10, 4, 4]
    center_offset: jnp.ndarray  # [10, 4, 4] link frame -> mesh-center frame
    joint_axis: jnp.ndarray    # [10, 3] local joint axes
    joint_lower: jnp.ndarray   # [9] hard limits
    joint_upper: jnp.ndarray   # [9]
    collision_points: jnp.ndarray  # [10, P, 3] body points (mesh-center frame)

    @property
    def num_collision_points(self) -> int:
        return self.collision_points.shape[1]

    def soft_limits(self, padding: float):
        # cached: called per scene dispatch on the hot staging path, and
        # each eager .at[].add is a device round trip on the remote tunnel
        # (4 ms/scene measured in the pipelined-pass profile).  Keyed on
        # the limits array's id; the stored strong ref keeps the id valid.
        key = (id(self.joint_lower), id(self.joint_upper), float(padding))
        hit = _SOFT_LIMITS_CACHE.get(key)
        if hit is None:
            lo = self.joint_lower.at[:7].add(padding)
            hi = self.joint_upper.at[:7].add(-padding)
            if isinstance(lo, jax.core.Tracer):
                # under omnistaging EVERY op inside a trace stages, even on
                # concrete operands — caching a trace-local tracer under a
                # concrete-id key leaks it into the next transform
                # (UnexpectedTracerError in the second jit to call this)
                return lo, hi
            hit = (self.joint_lower, self.joint_upper, lo, hi)
            _SOFT_LIMITS_CACHE[key] = hit
        return hit[2], hit[3]


def _rot_x_mat(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])


@functools.lru_cache(maxsize=4)
def _load_tables(path: str = _ASSET):
    return dict(np.load(path, allow_pickle=True))


@functools.lru_cache(maxsize=8)
def load_panda(
    collision_point_num: int = 15,
    asset_path: str = _ASSET,
    collision_asset_path: str = _COLLISION_ASSET,
    dtype=jnp.float32,
) -> PandaModel:
    """Build the model from the npz assets.

    ``collision_point_num`` points per link are taken deterministically
    (evenly strided) from the stored per-link point sets — the reference
    random-samples mesh vertices instead (``omg/core.py:166-190``).

    Memoized: the model is an immutable NamedTuple of device constants,
    and a 100-scene suite otherwise constructs (and uploads) 100 copies —
    per-scene Envs each call this (``planner/scene.py:36``).
    """
    t = _load_tables(asset_path)
    offsets = t["dh_offsets"]
    post = []
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    for i in range(7):
        m = _rot_x_mat(float(offsets[i]))
        if i > 0:
            m = m @ flip
        post.append(m)
    pts = np.load(collision_asset_path)["points"]  # [10, P, 3]
    stride = max(pts.shape[1] // collision_point_num, 1)
    pts = pts[:, ::stride, :][:, :collision_point_num, :]
    return PandaModel(
        pose_0=jnp.asarray(t["pose_0"], dtype),
        chain_post=jnp.asarray(np.stack(post), dtype),
        tip2joint=jnp.asarray(t["tip2joint"], dtype),
        center_offset=jnp.asarray(t["center_offset"], dtype),
        joint_axis=jnp.asarray(t["joint_axis"], dtype),
        joint_lower=jnp.asarray(t["joint_lower"], dtype),
        joint_upper=jnp.asarray(t["joint_upper"], dtype),
        collision_points=jnp.asarray(pts, dtype),
    )


def _rotz_mat(q):
    c, s = jnp.cos(q), jnp.sin(q)
    z, o = jnp.zeros_like(q), jnp.ones_like(q)
    return jnp.stack([
        jnp.stack([c, -s, z, z], -1),
        jnp.stack([s, c, z, z], -1),
        jnp.stack([z, z, o, z], -1),
        jnp.stack([z, z, z, o], -1),
    ], -2)


def forward_kinematics(
    model: PandaModel,
    q: jnp.ndarray,
    base_pose: jnp.ndarray | None = None,
    apply_offset: bool = True,
    return_joint_info: bool = False,
):
    """FK for one configuration ``q [9]`` (radians).

    Returns link poses ``[10, 4, 4]`` (in the mesh-center frame when
    ``apply_offset``), plus world joint origins/axes ``[10, 3]`` when
    ``return_joint_info``.  vmap over the leading axis for batches.
    Semantics match ``robot_pykdl.py:148-215``.
    """
    cur = jnp.eye(4, dtype=q.dtype) if base_pose is None else base_pose
    links = []
    origins = []
    axes = []
    for i in range(7):
        pre = cur @ model.pose_0[i]  # frame in which rotz(q_i) acts
        origins.append(pre[:3, 3])
        axes.append(pre[:3, 2])
        cur = pre @ _rotz_mat(q[i]) @ model.chain_post[i]
        links.append(cur)
    hand = links[6] @ model.pose_0[7]
    lf = model.pose_0[8].at[1, 3].add(q[7])
    rf = model.pose_0[9].at[1, 3].add(-q[8])
    links.append(hand)
    links.append(hand @ lf)
    links.append(hand @ rf)
    out = jnp.stack(links)  # [10, 4, 4]

    res_joint = None
    if return_joint_info:
        # Exact joint frames from the chain itself.  The reference instead
        # assigns ``_joint_origin = _joint_axis`` (robot_pykdl.py:104) and
        # reconstructs origins via ``tip2joint`` — its Jacobian lever arms
        # are off by a few cm for joints 4/5/7; ours are exact (validated
        # against jacfwd of this FK in tests/test_panda.py).
        hand_rot = hand[:3, :3]
        origins.append(hand[:3, 3])              # fixed hand joint (unused)
        axes.append(jnp.zeros(3, q.dtype))
        origins.append(links[8][:3, 3])          # left finger, prismatic +y
        axes.append(hand_rot[:, 1])
        origins.append(links[9][:3, 3])          # right finger, prismatic -y
        axes.append(-hand_rot[:, 1])
        res_joint = (jnp.stack(origins), jnp.stack(axes))

    if apply_offset:
        out = out @ model.center_offset

    if return_joint_info:
        return out, res_joint[0], res_joint[1]
    return out


def _mm4_lanes(a, b):
    """4x4 product in lane-last layout: a, b [4, 4, N] -> [4, 4, N].

    Broadcast-multiply-reduce over the contraction axis: the same 64
    vector MACs over the N lanes as an explicit unroll, but ~5 HLO ops
    instead of ~200 (FK is instantiated several times per plan program;
    the unrolled form dominated its compile size).  Deliberately NOT a
    dot_general: XLA:TPU lowers batched [N,4,4] dots with catastrophic
    MXU padding (measured 25 ms for a 3000-config FK batch); elementwise
    VPU work at full lane width is the fast form.
    """
    p = a[:, :, None, :] * b[None, :, :, :]
    # explicit left-associated adds: bit-identical to the historical
    # unrolled form (a0b0 + a1b1) + a2b2) + a3b3 — a .sum() reduce may
    # re-associate and shift near-tied goal selections downstream
    return ((p[:, 0] + p[:, 1]) + p[:, 2]) + p[:, 3]


def _mm4_const_lanes(a, b_const):
    """[4, 4, N] @ constant [4, 4] -> [4, 4, N]."""
    p = a[:, :, None, :] * b_const[None, :, :, None]
    return ((p[:, 0] + p[:, 1]) + p[:, 2]) + p[:, 3]


_E1 = np.diag([1.0, 1.0, 0.0, 0.0])
_E2 = np.zeros((4, 4)); _E2[1, 0] = 1.0; _E2[0, 1] = -1.0
_E3 = np.diag([0.0, 0.0, 1.0, 1.0])


def forward_kinematics_batch(model: PandaModel, q: jnp.ndarray,
                             return_joint_info: bool = False,
                             apply_offset: bool = True):
    """Batched FK, TPU-fast path: q [N, 9] -> poses [N, 10, 4, 4].

    Identical chain semantics to :func:`forward_kinematics`; internally the
    per-joint transform collapses to ``cos(q) P_i + sin(q) Q_i + R_i`` with
    constant ``P/Q/R`` (from ``A Rz(q) C = c (A E1 C) + s (A E2 C) +
    A E3 C``), and all 4x4 products run lane-last on the VPU.
    """
    n = q.shape[0]
    e1, e2, e3 = (jnp.asarray(_E1, q.dtype), jnp.asarray(_E2, q.dtype),
                  jnp.asarray(_E3, q.dtype))
    cos_q = jnp.cos(q[:, :7])
    sin_q = jnp.sin(q[:, :7])

    cur = None  # [4, 4, N]
    links = []
    origins = []
    axes = []
    for i in range(7):
        a = model.pose_0[i]
        c_mat = model.chain_post[i]
        p_i = a @ e1 @ c_mat
        q_i = a @ e2 @ c_mat
        r_i = a @ e3 @ c_mat
        b = (p_i[:, :, None] * cos_q[None, None, :, i]
             + q_i[:, :, None] * sin_q[None, None, :, i]
             + r_i[:, :, None])  # [4, 4, N]
        if cur is None:
            if return_joint_info:
                pre = jnp.broadcast_to(a[:, :, None], (4, 4, n))
                origins.append(pre[:3, 3])
                axes.append(pre[:3, 2])
            cur = b
        else:
            if return_joint_info:
                pre = _mm4_const_lanes(cur, a)
                origins.append(pre[:3, 3])
                axes.append(pre[:3, 2])
            cur = _mm4_lanes(cur, b)
        links.append(cur)

    hand = _mm4_const_lanes(links[6], model.pose_0[7])
    # prismatic fingers: constant pose with q-dependent local y translation
    lf = jnp.broadcast_to(model.pose_0[8][:, :, None], (4, 4, n))
    lf = lf.at[1, 3].add(q[:, 7])
    rf = jnp.broadcast_to(model.pose_0[9][:, :, None], (4, 4, n))
    rf = rf.at[1, 3].add(-q[:, 8])
    links.append(hand)
    links.append(_mm4_lanes(hand, lf))
    links.append(_mm4_lanes(hand, rf))

    if return_joint_info:
        hand_rot_y = jnp.stack([hand[0, 1], hand[1, 1], hand[2, 1]])
        origins.append(hand[:3, 3])
        axes.append(jnp.zeros_like(hand_rot_y))
        origins.append(links[8][:3, 3])
        axes.append(hand_rot_y)
        origins.append(links[9][:3, 3])
        axes.append(-hand_rot_y)

    if apply_offset:
        links = [_mm4_const_lanes(links[j], model.center_offset[j])
                 for j in range(10)]
    out = jnp.stack(links)                       # [10, 4, 4, N]
    out = jnp.moveaxis(out, -1, 0)               # [N, 10, 4, 4]
    if return_joint_info:
        og = jnp.moveaxis(jnp.stack(origins), -1, 0)  # [N, 10, 3]
        ax = jnp.moveaxis(jnp.stack(axes), -1, 0)
        return out, og, ax
    return out


def fk_with_joint_info_batch(model: PandaModel, q: jnp.ndarray):
    """Batched FK with joint info: q [n, 9] -> ([n,10,4,4], [n,10,3], [n,10,3])."""
    return forward_kinematics_batch(model, q, return_joint_info=True)


def hand_pose(model: PandaModel, q: jnp.ndarray) -> jnp.ndarray:
    """World pose of panda_hand (link 7) without mesh offset — the IK tip."""
    return forward_kinematics(model, q, apply_offset=False)[7]


def hand_pose_batch(model: PandaModel, q: jnp.ndarray) -> jnp.ndarray:
    """panda_hand poses for a batch ``[N, 9] -> [N, 4, 4]``.

    Lane-last batched chain — a vmapped :func:`hand_pose` would lower the
    per-link ``[4,4] @ [4,4]`` products to batched dots that XLA:TPU pads
    onto full MXU tiles (the 25 ms/3000-config pathology)."""
    return forward_kinematics_batch(model, q, apply_offset=False)[:, 7]


def collision_point_positions(model: PandaModel, poses: jnp.ndarray) -> jnp.ndarray:
    """Transform body points by link poses: [.., 10, 4, 4] -> [.., 10, P, 3].

    Equivalent of the reference's ``forward_points`` (``omg/cost.py:60-72``)
    without the axis shuffling.  Written as three broadcast multiply-adds
    instead of an einsum — the einsum form is a stack of [3,3]@[3,P] dots
    that XLA:TPU pads onto full MXU tiles.
    """
    pts = model.collision_points  # [10, P, 3]
    r = poses[..., :3, :3]        # [..., 10, 3(a), 3(c)]
    t = poses[..., None, :3, 3]
    x = sum(
        r[..., c][..., :, None, :] * pts[..., c][:, :, None]
        for c in range(3))        # [..., 10, P, 3]
    return x + t


def point_jacobians(
    model: PandaModel,
    origins_w: jnp.ndarray,   # [n, 10, 3]
    axes_w: jnp.ndarray,      # [n, 10, 3]
    x: jnp.ndarray,           # [n, 10, P, 3] workspace point positions
) -> jnp.ndarray:
    """Linear-velocity Jacobians for every body point: [n, 10, P, 9, 3].

    ``J[n, j, p, d]`` is d(x_{n,j,p})/d(q_d).  Revolute columns are
    ``axis x (x - origin)``; the two prismatic finger columns are the axis
    itself.  The link/dof gating reproduces ``wrap_index``/``wrap_joint``
    (``omg/util.py:205-220``) and the structure of
    ``Cost.compute_point_jacobian`` (``omg/cost.py:92-110``), computed here
    as one dense masked tensor instead of per-link ragged lists.
    """
    ax = axes_w[:, _DOF_TO_AXIS, :]        # [n, 9, 3]
    og = origins_w[:, _DOF_TO_AXIS, :]     # [n, 9, 3]
    rel = x[:, :, :, None, :] - og[:, None, None, :, :]  # [n,10,P,9,3]
    rev = jnp.cross(jnp.broadcast_to(ax[:, None, None], rel.shape), rel)
    pris = jnp.broadcast_to(ax[:, None, None], rel.shape)
    p_mask = jnp.asarray(_PRISMATIC)[None, None, None, :, None]
    jac = rev * (1.0 - p_mask) + pris * p_mask
    return jac * jnp.asarray(_AFFECT)[None, :, None, :, None]
