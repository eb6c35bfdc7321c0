"""A/B the two-stage IK survivor cap (round 5).

With the pipelined path at the device ceiling
(``docs/device_budget_r05.json``: ~52 plans/s = 1/(13 ms build + 5.8 ms
plan)), the build program — dominated by the 6-solve standoff chain over
``ik_survivor_cap`` lanes — IS the e2e lever.  This probe measures, per
cap value, the warm queued build device time (3 scenes, min-of-rounds)
and the 100-scene suite outcome (success + valid-goal yield), so the
cap can be retuned with success guarded.

Usage: python scripts/probe_survivor_cap.py [--caps 256,192,128]
       [--out docs/probe_survivor_cap_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SUITE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "suite_v2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="256,192,128")
    ap.add_argument("--scenes", type=int, default=100)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/probe_survivor_cap_r05.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene, _goal_set_fn
    from omg_planner_tpu.utils.timing import retry_transient

    model = panda.load_panda(collision_point_num=15)
    rows = []
    for cap in [int(c) for c in args.caps.split(",")]:
        cfg = OMGConfig(silent=True, ik_survivor_cap=cap)
        plan_one = jax.jit(plan_fast, static_argnums=(1,))
        # build device time, 3 scenes, queued min-of-rounds
        walls = []
        for sid in range(3):
            sc = PlanningScene.from_npz(cfg, os.path.join(
                SUITE, f"scene_{sid}.npz"))
            t = sc.env.target
            fn = _goal_set_fn(cfg.jit_key(), False, False,
                              bool(cfg.y_upsample))
            poses = jnp.asarray(np.asarray(
                sc.env.grasp_poses_world(), np.float32))
            start = jnp.asarray(sc.start, jnp.float32)
            obj_pos = jnp.asarray(t.pose_mat[:3, 3], jnp.float32)
            sdf = sc.env.scene_sdf()
            params = sc.env.cost_params()

            def disp():
                return fn(model, sdf, params, poses, start,
                          jax.random.PRNGKey(0), obj_pos)

            retry_transient(
                lambda: jax.block_until_ready(disp()[0].grasps), "warm")
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                hs = [disp() for _ in range(args.reps)]
                jax.block_until_ready(hs[-1][0].grasps)
                best = min(best, (time.perf_counter() - t0) / args.reps)
            walls.append(1000.0 * best)
        # suite outcome
        flags, goals, plan_walls = [], [], []
        for sid in range(args.scenes):
            sc = PlanningScene.from_npz(cfg, os.path.join(
                SUITE, f"scene_{sid}.npz"))

            def run():
                pr = sc.build_problem()
                r = plan_one(model, cfg.jit_key(), pr)
                jax.block_until_ready(r.traj)
                return pr, r

            t0 = time.perf_counter()
            pr, r = retry_transient(run, f"scene {sid}")
            plan_walls.append(time.perf_counter() - t0)
            flags.append(bool(np.asarray(r.flag)))
            goals.append(int(np.asarray(pr.goal_set.mask).sum()))
        row = {"cap": cap,
               "build_queued_ms": [round(w, 2) for w in walls],
               "build_queued_ms_median": round(float(np.median(walls)), 2),
               "success_rate": round(float(np.mean(flags)), 3),
               "mean_valid_goals": round(float(np.mean(goals)), 1),
               "suite_wall_s": round(float(np.sum(plan_walls)), 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {"what": __doc__.split("\n")[0], "rows": rows,
           "device": "see rows"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
