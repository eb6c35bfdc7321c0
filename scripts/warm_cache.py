"""Pre-compile the standard planning programs (deployment warmer).

A fresh process (or a fresh persistent-cache directory) pays the jit
compiles on first use: the goal-set program, the plan loop, and the
full-budget plan loop.  Run this once per deployment/config so the first
real request doesn't carry them; compiled programs land in the
persistent cache (``.jax_cache/<platform>``) keyed on HLO.

Usage:  python scripts/warm_cache.py [--cpu] [--backend analytic|exact|fused]
        [--scene data/suite_v2/scene_0.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backend", default="analytic",
                    choices=["analytic", "exact", "fused"])
    ap.add_argument("--scene", default=None,
                    help=".npz scene to shape the programs (default: the "
                         "pinned suite's scene_0, falling back to synthetic)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True,
                    sdf_analytic=args.backend == "analytic",
                    sdf_fused=args.backend == "fused")
    scene_path = args.scene or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "suite_v2", "scene_0.npz")
    if os.path.exists(scene_path):
        scene = PlanningScene.from_npz(cfg, scene_path)
    else:
        scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=3)

    t0 = time.time()
    problem = scene.build_problem()
    jax.block_until_ready(problem.goal_set.grasps)
    print(f"goal-set program: {time.time() - t0:.1f}s", flush=True)

    for name, c in (("plan", cfg),
                    ("plan_full", cfg.replace(pre_terminate=False))):
        t0 = time.time()
        fn = scene._get_plan_fn(True) if c is cfg else None
        if fn is None:
            from omg_planner_tpu.planner.plan import plan_fast
            fn = jax.jit(plan_fast, static_argnums=(1,))
            r = fn(scene.model, c.jit_key(), problem)
        else:
            r = fn(scene.model, problem)
        jax.block_until_ready(r.traj)
        print(f"{name} program: {time.time() - t0:.1f}s", flush=True)
    print("warm", flush=True)


if __name__ == "__main__":
    main()
