"""Export the synthetic 100-scene benchmark suite as .npz scene files.

Gives users a persisted, inspectable dataset (the role of the reference's
``data/scenes/scene_0..99.mat``): ``python scripts/export_scene_suite.py -o
data/scenes``; load any of them with ``python -m omg_planner_tpu -f
data/scenes/scene_7.npz``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="data/scenes")
    ap.add_argument("-n", type=int, default=100)
    ap.add_argument("--obstacles", type=int, default=3)
    args = ap.parse_args()

    from omg_planner_tpu.io.assets import synthetic_tabletop_scene
    from omg_planner_tpu.io.scene_io import save_npz_scene

    os.makedirs(args.out, exist_ok=True)
    for sid in range(args.n):
        objects, target = synthetic_tabletop_scene(
            sid, n_obstacles=args.obstacles)
        save_npz_scene(os.path.join(args.out, f"scene_{sid}.npz"),
                       objects, target)
    print(f"wrote {args.n} scenes to {args.out}")


if __name__ == "__main__":
    main()
