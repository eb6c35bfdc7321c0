"""Same-session A/B of the dedupe execution strategy inside the goal-set
build program: cfg.dedupe_mode "scan" (the reference-shaped sequential
greedy, unroll=16) vs "rounds" (parallel MIS fixed point — identical kept
set, dependency-depth while_loop rounds instead of C scan steps).

The dedupe is one stage of the fused build program, so the measurement is
the FULL build program's queued device time per mode, interleaved A/B/A/B
with min-over-rounds (tunnel congestion discipline, CLAUDE.md) — plus a
bit-identical check of the resulting goal sets.

Usage: python scripts/probe_dedupe_mode.py [--scenes 3] [--reps 20]
       [--cpu] [--out docs/probe_dedupe_r05.json]
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
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/probe_dedupe_r05.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.scene import PlanningScene, _goal_set_fn
    from omg_planner_tpu.utils.timing import retry_transient

    cfg_scan = OMGConfig(silent=True, dedupe_mode="scan")
    cfg_rounds = cfg_scan.replace(dedupe_mode="rounds")
    model = panda.load_panda(collision_point_num=cfg_scan.collision_point_num)

    out = {"what": "dedupe scan vs rounds inside the goal-set build "
                   "program (bit-identical output, device-time A/B)",
           "device": jax.devices()[0].device_kind, "scenes": []}

    for sid in range(args.scenes):
        sc = PlanningScene.from_npz(cfg_scan, os.path.join(
            SUITE, f"scene_{sid}.npz"))
        t = sc.env.target
        mode_args = (bool(t.attached), bool(t.attached and cfg_scan.z_upsample),
                     bool(cfg_scan.y_upsample and not t.attached))
        poses = jnp.asarray(np.asarray(sc.env.grasp_poses_world(), np.float32))
        start = jnp.asarray(sc.start, jnp.float32)
        obj_pos = jnp.asarray(t.pose_mat[:3, 3], jnp.float32)
        sdf = sc.env.scene_sdf()
        params = sc.env.cost_params()
        key = jax.random.PRNGKey(7)

        fns = {m: _goal_set_fn(c.jit_key(), *mode_args)
               for m, c in (("scan", cfg_scan), ("rounds", cfg_rounds))}

        def dispatch(m):
            return fns[m](model, sdf, params, poses, start, key, obj_pos)

        # warm (compiles the rounds variant on first use) + identity check
        res = {}
        for m in fns:
            t0 = time.time()
            res[m] = retry_transient(lambda m=m: dispatch(m), f"warm {m}")
            jax.block_until_ready(res[m])
            print(f"scene {sid} {m}: warm+compile {time.time()-t0:.1f}s",
                  flush=True)
        gs_a, gs_b = res["scan"][0], res["rounds"][0]
        same = all(bool(jnp.array_equal(a, b)) for a, b in
                   zip(jax.tree.leaves(gs_a), jax.tree.leaves(gs_b)))

        timing = {}
        for m in fns:
            timing[m] = float("inf")
        for _ in range(args.rounds):
            for m in fns:  # interleave modes within each round
                t0 = time.perf_counter()
                hs = [dispatch(m) for _ in range(args.reps)]
                jax.block_until_ready(hs[-1][0].mask)
                timing[m] = min(timing[m],
                                (time.perf_counter() - t0) / args.reps)
        row = {"scene": sid, "identical_goal_set": same,
               "build_queued_ms": {m: round(1000 * v, 3)
                                   for m, v in timing.items()}}
        print(row, flush=True)
        out["scenes"].append(row)

    ms = {m: float(np.median([r["build_queued_ms"][m]
                              for r in out["scenes"]]))
          for m in ("scan", "rounds")}
    out["median_build_queued_ms"] = ms
    out["rounds_speedup"] = round(ms["scan"] / ms["rounds"], 3)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("median_build_queued_ms", "rounds_speedup")}))


if __name__ == "__main__":
    main()
