"""Export the Panda kinematic constant tables into the repo's npz asset.

The numbers originate from the public Franka Panda URDF (link rest poses,
joint axes, limits, mesh-center offsets).  The reference ships them as a
pickle consumed by ``ycb_render/robotPose/robot_pykdl.py:88-116``; we store
them as a plain ``.npz`` so the TPU framework has no pickle/torch dependency
at runtime.

Run once:  python scripts/export_panda_tables.py [path-to-robot_p3.pkl]
"""

import pickle
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/ycb_render/robotPose/robot_p3.pkl"
DST = "omg_planner_tpu/assets/panda_kinematics.npz"

with open(SRC, "rb") as f:
    info = pickle.load(f)

joint_names = list(info["_joint_name"])
# 9-dof joint order: 7 arm joints + 2 finger joints (the reference keeps a
# dummy hand joint at index 7 of its 10-slot layout; we drop it).
arm_names = joint_names[:7]
finger_names = joint_names[-2:]
limits = info["_joint_limits"]
lower = np.array([limits[n][0] for n in arm_names + finger_names])
upper = np.array([limits[n][1] for n in arm_names + finger_names])

np.savez(
    DST,
    pose_0=np.array(info["_pose_0"], dtype=np.float64),
    joint_axis=np.array(info["_joint_axis"], dtype=np.float64),
    joint_origin=np.array(info["_joint_origin"], dtype=np.float64),
    tip2joint=np.array(info["_tip2joint"], dtype=np.float64),
    joint2tips=np.array(info["_joint2tips"], dtype=np.float64),
    center_offset=np.array(info["center_offset"], dtype=np.float64),
    joint_lower=lower,
    joint_upper=upper,
    dh_offsets=np.array([0, -np.pi, np.pi, np.pi, -np.pi, np.pi, np.pi]),
    link_names=np.array(info["_link_names"]),
    joint_names=np.array(joint_names),
)
print("wrote", DST)
