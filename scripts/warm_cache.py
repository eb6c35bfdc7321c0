"""Pre-compile the standard planning programs (deployment warmer) and
ASSERT the warm cache actually covers the production path.

A fresh process (or a fresh persistent-cache directory) pays the jit
compiles on first use: the goal-set program, the plan loop, and the
full-budget plan loop.  Run this once per deployment/config so the first
real request doesn't carry them; compiled programs land in the
persistent cache (``.jax_cache/<platform>``) keyed on HLO.

The warmer and the checker share ONE staging routine that mirrors the
bench/runner path exactly — including the suite-wide object padding
(``pad_objects`` to the suite max; a warm run at unpadded shapes would
produce different HLO and silently revert first requests to cold
compiles, VERDICT r2 item 6 / ROADMAP item 4).

Coverage assertion (``--assert-coverage``): run the warmer in one fresh
subprocess, then replay the same staging path in a SECOND fresh
subprocess under a ``jax.monitoring`` compile-duration listener and fail
if any backend compile >= ``THRESHOLD_S`` fires — a persistent-cache hit
skips backend compilation entirely, and short programs are below the
cache's own ``persistent_cache_min_compile_time_secs`` policy (never
persisted by design; see THRESHOLD_S for why the detector sits well
above that policy).  CI: ``tests/test_warm_cache.py``.

Usage:  python scripts/warm_cache.py [--cpu] [--backend analytic|exact|fused]
        [--scene data/suite_v2/scene_0.npz] [--assert-coverage]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COMPILE_EVENT = "/jax/core/compile/backend_compile_duration"
# Detection threshold for the coverage check.  The production programs
# compile in 5.8-6.8 s cold on this image's CPU while every auxiliary
# program is <= 0.15 s (measured r4), so 3 s sits in the gap with ~20x
# headroom: under parallel test load (pytest -n 4) a sub-second program's
# wall can inflate several-fold and must NOT false-trip the check (the
# r3 flake), while a genuinely uncovered production program still fires.
# Programs below the cache's own persistence policy (1 s) are never
# persisted by design and are exactly the ones that need the headroom.
THRESHOLD_S = 3.0


def _suite_pad(suite_dir, cfg):
    """Suite-wide padded SDF shape + max object count, exactly as bench.py
    computes them (one compiled program set across the suite)."""
    import glob

    import numpy as np

    from omg_planner_tpu.planner.scene import PlanningScene

    shapes, max_obj = [], 0
    paths = sorted(glob.glob(os.path.join(suite_dir, "scene_*.npz")))
    for p in paths:
        s = PlanningScene.from_npz(cfg, p)
        shapes += [o.sdf.shape for o in s.env.objects]
        max_obj = max(max_obj, len(s.env.objects))
    return tuple(np.array(shapes).max(axis=0)), max_obj


def staging_path(args):
    """Stage + plan scene_0 through the production program set: goal-set
    build, fast plan, full-budget plan — at suite-padded shapes."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.ops.sdf import AnalyticScene, stage_scene_sdfs
    from omg_planner_tpu.parallel.batch import pad_objects
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True,
                    sdf_analytic=args.backend == "analytic",
                    sdf_fused=args.backend == "fused")
    scene_path = args.scene or os.path.join(
        REPO, "data", "suite_v2", "scene_0.npz")
    if os.path.exists(scene_path):
        scene = PlanningScene.from_npz(cfg, scene_path)
        pad_to, max_obj = _suite_pad(os.path.dirname(scene_path), cfg)
    else:
        scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=3)
        pad_to, max_obj = None, len(scene.env.objects)

    t0 = time.time()
    if pad_to is not None and not isinstance(
            scene.env.scene_sdf(), AnalyticScene):
        scene.env._scene_sdf = stage_scene_sdfs(
            [o.sdf for o in scene.env.objects], baked=cfg.sdf_baked,
            pad_to=pad_to)
    problem = pad_objects(scene.build_problem(), max_obj)
    jax.block_until_ready(problem.goal_set.grasps)
    print(f"goal-set program: {time.time() - t0:.1f}s", flush=True)

    plan_one = jax.jit(plan_fast, static_argnums=(1,))
    r = None
    for name, c in (("plan", cfg),
                    ("plan_full", cfg.replace(pre_terminate=False))):
        t0 = time.time()
        r = plan_one(scene.model, c.jit_key(), problem)
        jax.block_until_ready(r.traj)
        print(f"{name} program: {time.time() - t0:.1f}s", flush=True)

    if args.physics:
        # warm the physics rollout (execution-verified planning / serve
        # /execute / phys_exec): one execution at the suite's static-pad
        # shape compiles the scan rollout + lift-clearance + IK-retract
        # programs (cold ~47 s TPU / ~20 s CPU)
        import numpy as np

        from omg_planner_tpu.physics import NoMassModelError, execute_plan

        t0 = time.time()
        try:
            execute_plan(scene, np.asarray(r.traj),
                         pad_statics=max_obj - 1)
            print(f"physics rollout program: {time.time() - t0:.1f}s",
                  flush=True)
        except NoMassModelError:
            print("physics rollout skipped: no mass model", flush=True)
    print("warm", flush=True)


def check(args):
    """Fresh-process replay under a compile counter: zero expensive
    backend compiles allowed."""
    import jax  # noqa: F401  (monitoring must be registered before use)
    import jax.monitoring as monitoring

    slow = []
    monitoring.register_event_duration_secs_listener(
        lambda name, dur, **kw: slow.append((name, dur))
        if name == COMPILE_EVENT and dur >= THRESHOLD_S else None)
    staging_path(args)
    if slow:
        print(f"COVERAGE FAIL: {len(slow)} backend compiles >= "
              f"{THRESHOLD_S:.1f}s in a warmed process: "
              f"{[round(d, 1) for _, d in slow]}", flush=True)
        sys.exit(3)
    print("coverage ok: no expensive compiles in the warmed process",
          flush=True)


def assert_coverage(args):
    base = [sys.executable, os.path.abspath(__file__),
            "--backend", args.backend]
    if args.cpu:
        base.append("--cpu")
    if args.scene:
        base += ["--scene", args.scene]
    if args.physics:
        base.append("--physics")
    subprocess.run(base, check=True)
    subprocess.run(base + ["--_check"], check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backend", default="analytic",
                    choices=["analytic", "exact", "fused"])
    ap.add_argument("--scene", default=None,
                    help=".npz scene to shape the programs (default: the "
                         "pinned suite's scene_0, falling back to synthetic)")
    ap.add_argument("--assert-coverage", action="store_true",
                    help="warm in one fresh subprocess, then assert a "
                         "second fresh subprocess compiles nothing "
                         "expensive")
    ap.add_argument("--physics", action="store_true",
                    help="also warm the physics rollout programs "
                         "(execution-verified planning / serve /execute)")
    ap.add_argument("--_check", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.assert_coverage:
        assert_coverage(args)
    elif args._check:
        check(args)
    else:
        staging_path(args)


if __name__ == "__main__":
    main()
