"""SE(3)/SO(3) pose utilities in pure JAX.

Replaces the reference's transforms3d/Sophus usage (``omg/util.py:115-162``,
``Sophus/`` headers consumed by the CUDA kernel).  Quaternions are wxyz
(as in the reference's ``pack_pose``/``unpack_pose``).  All functions are
batched-friendly: they operate on trailing dimensions and can be ``vmap``-ed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> 3x3 rotation. Supports leading batch dims."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation -> wxyz quaternion (Shepperd's method, branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate constructions; pick the numerically largest pivot
    q0 = jnp.stack(
        [_safe_sqrt(1 + tr) / 2,
         (m21 - m12) / (2 * _safe_sqrt(1 + tr)),
         (m02 - m20) / (2 * _safe_sqrt(1 + tr)),
         (m10 - m01) / (2 * _safe_sqrt(1 + tr))], axis=-1)
    q1 = jnp.stack(
        [(m21 - m12) / (2 * _safe_sqrt(1 + m00 - m11 - m22)),
         _safe_sqrt(1 + m00 - m11 - m22) / 2,
         (m01 + m10) / (2 * _safe_sqrt(1 + m00 - m11 - m22)),
         (m02 + m20) / (2 * _safe_sqrt(1 + m00 - m11 - m22))], axis=-1)
    q2 = jnp.stack(
        [(m02 - m20) / (2 * _safe_sqrt(1 - m00 + m11 - m22)),
         (m01 + m10) / (2 * _safe_sqrt(1 - m00 + m11 - m22)),
         _safe_sqrt(1 - m00 + m11 - m22) / 2,
         (m12 + m21) / (2 * _safe_sqrt(1 - m00 + m11 - m22))], axis=-1)
    q3 = jnp.stack(
        [(m10 - m01) / (2 * _safe_sqrt(1 - m00 - m11 + m22)),
         (m02 + m20) / (2 * _safe_sqrt(1 - m00 - m11 + m22)),
         (m12 + m21) / (2 * _safe_sqrt(1 - m00 - m11 + m22)),
         _safe_sqrt(1 - m00 - m11 + m22) / 2], axis=-1)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11],
                       axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def unpack_pose(pose7: jnp.ndarray) -> jnp.ndarray:
    """[x,y,z,qw,qx,qy,qz] -> 4x4 (reference ``omg/util.py:115-119``)."""
    mat = jnp.zeros(pose7.shape[:-1] + (4, 4), pose7.dtype)
    mat = mat.at[..., :3, :3].set(quat_to_mat(pose7[..., 3:]))
    mat = mat.at[..., :3, 3].set(pose7[..., :3])
    return mat.at[..., 3, 3].set(1.0)


def pack_pose(mat: jnp.ndarray) -> jnp.ndarray:
    """4x4 -> [x,y,z,qw,qx,qy,qz] (reference ``omg/util.py:122-126``)."""
    return jnp.concatenate([mat[..., :3, 3], mat_to_quat(mat[..., :3, :3])], -1)


def se3_inverse(mat: jnp.ndarray) -> jnp.ndarray:
    """Rigid-transform inverse (reference ``omg/util.py:129-135``)."""
    r = mat[..., :3, :3]
    t = mat[..., :3, 3:]
    rt = jnp.swapaxes(r, -1, -2)
    out = jnp.zeros_like(mat)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3:].set(-rt @ t)
    return out.at[..., 3, 3].set(1.0)


def rot_z(angle) -> jnp.ndarray:
    """4x4 rotation about world z (reference ``omg/util.py:38-47``)."""
    angle = jnp.asarray(angle)
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    rows = jnp.stack(
        [c, -s, zero, zero,
         s, c, zero, zero,
         zero, zero, one, zero,
         zero, zero, zero, one], axis=-1)
    return rows.reshape(angle.shape + (4, 4))


def rot_y(angle) -> jnp.ndarray:
    """4x4 rotation about world y (reference ``omg/util.py:50-59``)."""
    angle = jnp.asarray(angle)
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    rows = jnp.stack(
        [c, zero, s, zero,
         zero, one, zero, zero,
         -s, zero, c, zero,
         zero, zero, zero, one], axis=-1)
    return rows.reshape(angle.shape + (4, 4))


def rot_x(angle) -> jnp.ndarray:
    angle = jnp.asarray(angle)
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    rows = jnp.stack(
        [one, zero, zero, zero,
         zero, c, -s, zero,
         zero, s, c, zero,
         zero, zero, zero, one], axis=-1)
    return rows.reshape(angle.shape + (4, 4))


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (used by the damped-Newton IK).

    Degenerate at rotation angle exactly pi (the off-diagonal differences
    vanish); IK success checks therefore use the rotation *angle* from the
    trace (:func:`so3_angle`) rather than the norm of this vector."""
    cos_theta = jnp.clip(
        (jnp.trace(r, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [r[..., 2, 1] - r[..., 1, 2],
         r[..., 0, 2] - r[..., 2, 0],
         r[..., 1, 0] - r[..., 0, 1]], axis=-1)
    # sin(theta) ~ theta near 0; scale = theta / (2 sin theta) -> 1/2
    scale = jnp.where(theta < 1e-6, 0.5, theta / (2.0 * jnp.sin(theta) + 1e-12))
    return w * scale[..., None]


def so3_angle(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in [0, pi] from the trace (robust at pi)."""
    return jnp.arccos(jnp.clip(
        (jnp.trace(r, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0))


def transform_points(mat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to [..., P, 3] -> [..., P, 3]."""
    return pts @ jnp.swapaxes(mat[..., :3, :3], -1, -2) + mat[..., None, :3, 3]
