"""Same-session A/B of cfg.ik_chain_total_budget (whole-chain iteration
cap in the fused chain) on the goal-set build program: 0 (uncapped, loop
runs to the slowest crawling lane, measured 39 global iterations) vs
capped values near the p99 lane (suite distribution: p50 17 / p90 18 /
tail 39).

Reports build device time per budget plus valid-goal counts, so the
trade (slowest lanes dropped vs latency saved) is explicit.

Usage: python scripts/probe_chain_budget.py [--budgets 0,26,32]
       [--scenes 3] [--reps 20] [--cpu] [--out docs/probe_chain_budget_r05.json]
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
    ap.add_argument("--budgets", default="0,26,32")
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/probe_chain_budget_r05.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.scene import PlanningScene, _goal_set_fn
    from omg_planner_tpu.utils.timing import retry_transient

    budgets = [int(x) for x in args.budgets.split(",")]
    cfgs = {b: OMGConfig(silent=True, ik_chain_total_budget=b)
            for b in budgets}
    model = panda.load_panda(
        collision_point_num=cfgs[budgets[0]].collision_point_num)

    out = {"what": "fused-chain whole-loop iteration budget A/B "
                   "(build program device time + valid-goal counts)",
           "device": jax.devices()[0].device_kind, "scenes": []}

    base = cfgs[budgets[0]]
    for sid in range(args.scenes):
        sc = PlanningScene.from_npz(base, os.path.join(
            SUITE, f"scene_{sid}.npz"))
        t = sc.env.target
        mode_args = (bool(t.attached), bool(t.attached and base.z_upsample),
                     bool(base.y_upsample and not t.attached))
        poses = jnp.asarray(np.asarray(sc.env.grasp_poses_world(),
                                       np.float32))
        start = jnp.asarray(sc.start, jnp.float32)
        obj_pos = jnp.asarray(t.pose_mat[:3, 3], jnp.float32)
        sdf = sc.env.scene_sdf()
        params = sc.env.cost_params()
        key = jax.random.PRNGKey(7)

        fns = {b: _goal_set_fn(c.jit_key(), *mode_args)
               for b, c in cfgs.items()}

        def dispatch(b):
            return fns[b](model, sdf, params, poses, start, key, obj_pos)

        goals = {}
        for b in budgets:
            t0 = time.time()
            r = retry_transient(lambda b=b: dispatch(b), f"warm {b}")
            jax.block_until_ready(r)
            goals[b] = int(r[0].mask.sum())
            print(f"scene {sid} budget {b}: warm+compile "
                  f"{time.time()-t0:.1f}s goals {goals[b]}", flush=True)

        timing = {b: float("inf") for b in budgets}
        for _ in range(args.rounds):
            for b in budgets:
                t0 = time.perf_counter()
                hs = [dispatch(b) for _ in range(args.reps)]
                jax.block_until_ready(hs[-1][0].mask)
                timing[b] = min(timing[b],
                                (time.perf_counter() - t0) / args.reps)
        row = {"scene": sid, "valid_goals": goals,
               "build_queued_ms": {b: round(1000 * v, 3)
                                   for b, v in timing.items()}}
        print(row, flush=True)
        out["scenes"].append(row)

    out["median_build_queued_ms"] = {
        b: float(np.median([r["build_queued_ms"][b] for r in out["scenes"]]))
        for b in budgets}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median_build_queued_ms"]))


if __name__ == "__main__":
    main()
