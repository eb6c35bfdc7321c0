"""Generate synthetic per-link collision point clouds for the Panda.

The reference samples ``collision_point_num`` vertices from per-link surface
point clouds shipped in its data download (``omg/core.py:166-190``,
``data/robots/link*.xyz`` — not redistributable here).  This script
synthesizes deterministic surface samples from capsule/box approximations of
each link's geometry, expressed in the mesh-center frame (the frame the
reference's points live in, reached via ``center_offset``).

Users with the reference's data can instead point the loader at their
``link*.xyz`` files; see ``omg_planner_tpu/models/collision_io.py``.
"""

import numpy as np

P = 64  # stored points per link; the model loader strides down to cfg value

# (half_length_z, radius) capsule approximations per link, mesh-center frame.
LINK_GEOM = [
    (0.12, 0.055),  # link1
    (0.10, 0.055),  # link2
    (0.10, 0.050),  # link3
    (0.10, 0.050),  # link4
    (0.13, 0.045),  # link5
    (0.07, 0.045),  # link6
    (0.06, 0.045),  # link7
    (0.04, 0.060),  # hand (wider)
    (0.025, 0.012),  # left finger
    (0.025, 0.012),  # right finger
]


def capsule_points(n, half_len, radius, rng):
    """Deterministic-ish surface samples on a z-aligned capsule."""
    pts = []
    golden = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(n):
        t = i / max(n - 1, 1)
        theta = golden * i
        z = (2 * t - 1) * half_len
        r = radius * (0.85 + 0.15 * np.cos(3 * theta))
        pts.append([r * np.cos(theta), r * np.sin(theta), z])
    pts = np.array(pts)
    pts += rng.normal(scale=0.002, size=pts.shape)
    return pts


def main():
    rng = np.random.default_rng(233)
    all_pts = np.stack([
        capsule_points(P, hl, r, rng) for hl, r in LINK_GEOM
    ])
    np.savez("omg_planner_tpu/assets/panda_collision_points.npz",
             points=all_pts.astype(np.float32))
    print("wrote panda_collision_points.npz", all_pts.shape)


if __name__ == "__main__":
    main()
