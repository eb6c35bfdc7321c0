"""Measure goal-set build time on the attached device (two-stage IK probe).

Usage: python scripts/probe_goalset.py [--scenes N] [--single-stage]

Prints per-scene warm build times and valid-goal counts so two-stage
compaction (cfg.ik_two_stage) can be validated for both speed and quality
(VERDICT r1 item 2: target <= 0.3 s/scene warm at unchanged goal counts).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--obstacles", type=int, default=3)
    ap.add_argument("--single-stage", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.ops.sdf import bake_scene, combine_sdfs

    cfg = OMGConfig(silent=True,
                    ik_two_stage=not args.single_stage)
    scenes = [PlanningScene.synthetic(cfg, scene_id=i,
                                      n_obstacles=args.obstacles)
              for i in range(args.scenes)]
    # common SDF padding so every scene hits one compiled program
    all_shapes = np.array([o.sdf.data.shape
                           for s in scenes for o in s.env.objects])
    pad_to = tuple(all_shapes.max(axis=0))
    bake = jax.jit(bake_scene)
    for s in scenes:
        stack = combine_sdfs([o.sdf for o in s.env.objects], pad_to=pad_to)
        s.env._scene_sdf = bake(stack) if cfg.sdf_baked else stack

    print(f"device={jax.devices()[0]} two_stage={cfg.ik_two_stage}")
    # compile on scene 0
    t0 = time.time()
    gs = scenes[0].build_goal_set()
    jax.block_until_ready(gs.grasps)
    print(f"compile+first build: {time.time()-t0:.1f}s")

    times, counts = [], []
    for i, s in enumerate(scenes):
        t0 = time.time()
        gs = s.build_goal_set()
        jax.block_until_ready(gs.grasps)
        dt = time.time() - t0
        n = int(np.asarray(gs.mask).sum())
        times.append(dt)
        counts.append(n)
        print(f"scene {i}: {dt:.3f}s, {n} valid goals")
    print(f"warm mean {np.mean(times):.3f}s  counts {counts}")


if __name__ == "__main__":
    main()
