"""Replay saved demonstrations as videos (reference ``bullet/vis_data.py``).

Usage:  python -m omg_planner_tpu.apps.vis_demos -d data/demonstrations
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def replay(demo_path: str, out_path: str | None = None, every: int = 2):
    from ..io.assets import make_primitive, pose_at
    from ..models import panda
    from ..viz.render import render_trajectory, write_video

    d = dict(np.load(demo_path, allow_pickle=True))
    traj = d["traj"]
    model = panda.load_panda()
    objects = []
    if "scene_poses" in d and "scene_names" in d:
        for name, pose in zip(d["scene_names"], d["scene_poses"]):
            objects.append(make_primitive(
                str(name), "box", [0.05, 0.05, 0.08], pose,
                compute_grasp=False, delta=0.02))
    frames = render_trajectory(model, objects, traj, every=every)
    out_path = out_path or demo_path.replace(".npz", ".avi")
    write_video(frames, out_path)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--dir", default="data/demonstrations")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    for path in sorted(glob.glob(os.path.join(args.dir, "demo_*.npz"))):
        out = replay(path)
        print("wrote", out)


if __name__ == "__main__":
    main()
