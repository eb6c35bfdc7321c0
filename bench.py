"""Benchmark: plans/s per chip on the synthetic 100-scene table-top suite.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline anchor: the reference publishes no numbers (BASELINE.md); its only
operational anchor is the 3 s per-plan wall-clock budget
(``omg/config.py:130``) under the standard horizon (T=30) and iteration
budget (50+20) — i.e. 1/3 plan/s/GPU.  ``vs_baseline`` is measured
plans/s divided by that budget rate.

The measured quantity matches the reference's "planning time" print
(``omg/planner.py:645-648``): the optimization loop (learner + CHOMP steps),
excluding goal-set IK construction (which the reference also reports
separately).  Plans run as one vmapped batch per chip; steady-state timing
after one warmup iteration.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_problems(cfg, n_scenes, n_obstacles=2):
    import jax
    import jax.numpy as jnp

    from omg_planner_tpu.ops.sdf import bake_scene, combine_sdfs
    from omg_planner_tpu.parallel.batch import pad_objects, stack_problems
    from omg_planner_tpu.planner.scene import PlanningScene

    problems = []
    meta = []
    scenes = []
    for sid in range(n_scenes):
        scene = PlanningScene.synthetic(
            cfg.replace(silent=True), scene_id=sid, n_obstacles=n_obstacles)
        scenes.append(scene)
    # common SDF padding across the whole suite
    all_shapes = np.array([
        o.sdf.data.shape for s in scenes for o in s.env.objects])
    pad_to = tuple(all_shapes.max(axis=0))
    max_obj = max(len(s.env.objects) for s in scenes)
    t_goal = 0.0
    bake = jax.jit(bake_scene)
    for k, scene in enumerate(scenes):
        stack = combine_sdfs([o.sdf for o in scene.env.objects],
                             pad_to=pad_to)
        scene.env._scene_sdf = bake(stack) if cfg.sdf_baked else stack
        t0 = time.time()
        problem = scene.build_problem()
        jax.block_until_ready(problem.goal_set.grasps)
        t_goal += time.time() - t0
        log(f"[bench] scene {k}: goal set {time.time()-t0:.1f}s")
        n_valid = int(np.asarray(problem.goal_set.mask).sum())
        meta.append(n_valid)
        problems.append(pad_objects(problem, max_obj))
    return stack_problems(problems), meta, t_goal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--obstacles", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--full-steps", action="store_true",
                    help="disable early termination: raw optimizer "
                         "throughput at the fixed 50+20 step budget")
    args, _ = ap.parse_known_args()

    import jax

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.parallel.batch import plan_batch_jit

    # standard reference budget: T=30, 50+20 steps, <=100 goals
    cfg = OMGConfig(silent=True)
    if args.full_steps:
        cfg = cfg.replace(pre_terminate=False)
    model = panda.load_panda(collision_point_num=cfg.collision_point_num)

    t0 = time.time()
    problems, n_valid_goals, t_goal = build_problems(
        cfg, args.scenes, args.obstacles)
    setup_time = time.time() - t0

    log(f"[bench] setup done in {setup_time:.1f}s; compiling plan batch...")
    # warmup / compile
    t0 = time.time()
    res = plan_batch_jit(model, cfg.jit_key(), problems)
    jax.block_until_ready(res.traj)
    compile_time = time.time() - t0

    log(f"[bench] compile+warmup {compile_time:.1f}s; timing...")
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        res = plan_batch_jit(model, cfg.jit_key(), problems)
        jax.block_until_ready(res.traj)
        times.append(time.time() - t0)
    best = min(times)
    plans_per_s = args.scenes / best
    # with early termination disabled the reference's terminate flag can
    # never fire; use the execute criterion (collision-free + smooth)
    success = float(np.asarray(
        res.info.execute if args.full_steps else res.flag).mean())
    steps_used = np.asarray(res.steps_used)

    baseline_rate = 1.0 / 3.0  # reference per-plan budget (config.py:130)
    out = {
        "metric": "plans_per_second_per_chip",
        "value": round(plans_per_s, 3),
        "unit": "plans/s",
        "vs_baseline": round(plans_per_s / baseline_rate, 2),
        "batch_scenes": args.scenes,
        "batch_wall_s": round(best, 4),
        "p50_plan_latency_ms": round(1000.0 * best, 2),
        "success_rate": round(success, 3),
        "mean_steps": round(float(steps_used.mean()), 1),
        "mean_goals": round(float(np.mean(n_valid_goals)), 1),
        "goal_set_build_s_total": round(t_goal, 2),
        "compile_s": round(compile_time, 2),
        "setup_s": round(setup_time, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
