"""Same-session A/B of the standoff-chain execution strategy inside the
goal-set build program: cfg.ik_chain_fused False (scan of 6 batched
while_loop solves — every stage pays its own straggler serially) vs True
(one while_loop, per-lane stage advancement — ops/ik.py::
_solve_chain_fused).

Unlike the dedupe A/B the outputs are NOT bit-identical (converged lanes
stop at their own convergence instant; sub-tolerance q differences can
flip tie-broken goal picks), so the probe reports goal-set agreement
stats alongside the timing instead of asserting equality.

Usage: python scripts/probe_chain_fused.py [--scenes 3] [--reps 20]
       [--cpu] [--out docs/probe_chain_fused_r05.json]
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
    ap.add_argument("--out", default="docs/probe_chain_fused_r05.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.scene import PlanningScene, _goal_set_fn
    from omg_planner_tpu.utils.timing import retry_transient

    cfgs = {"scan": OMGConfig(silent=True, ik_chain_fused=False),
            "fused": OMGConfig(silent=True, ik_chain_fused=True)}
    model = panda.load_panda(
        collision_point_num=cfgs["scan"].collision_point_num)

    out = {"what": "standoff chain scan-of-solves vs fused per-lane "
                   "chain inside the goal-set build program",
           "device": jax.devices()[0].device_kind, "scenes": []}

    for sid in range(args.scenes):
        sc = PlanningScene.from_npz(cfgs["scan"], os.path.join(
            SUITE, f"scene_{sid}.npz"))
        t = sc.env.target
        mode_args = (bool(t.attached),
                     bool(t.attached and cfgs["scan"].z_upsample),
                     bool(cfgs["scan"].y_upsample and not t.attached))
        poses = jnp.asarray(np.asarray(sc.env.grasp_poses_world(),
                                       np.float32))
        start = jnp.asarray(sc.start, jnp.float32)
        obj_pos = jnp.asarray(t.pose_mat[:3, 3], jnp.float32)
        sdf = sc.env.scene_sdf()
        params = sc.env.cost_params()
        key = jax.random.PRNGKey(7)

        fns = {m: _goal_set_fn(c.jit_key(), *mode_args)
               for m, c in cfgs.items()}

        def dispatch(m):
            return fns[m](model, sdf, params, poses, start, key, obj_pos)

        res = {}
        for m in fns:
            t0 = time.time()
            res[m] = retry_transient(lambda m=m: dispatch(m), f"warm {m}")
            jax.block_until_ready(res[m])
            print(f"scene {sid} {m}: warm+compile {time.time()-t0:.1f}s",
                  flush=True)
        gs_a, gs_b = res["scan"][0], res["fused"][0]
        na, nb = int(gs_a.mask.sum()), int(gs_b.mask.sum())
        # goal CONFIGS agreement: nearest-match distance of each valid
        # goal in a to the valid goals in b
        qa = np.asarray(gs_a.grasps)[np.asarray(gs_a.mask)]
        qb = np.asarray(gs_b.grasps)[np.asarray(gs_b.mask)]
        if len(qa) and len(qb):
            d = np.linalg.norm(qa[:, None] - qb[None, :], axis=-1)
            match = float(np.median(d.min(axis=1)))
            matched = int((d.min(axis=1) < 5e-3).sum())
        else:
            match, matched = float("nan"), 0

        timing = {m: float("inf") for m in fns}
        for _ in range(args.rounds):
            for m in fns:
                t0 = time.perf_counter()
                hs = [dispatch(m) for _ in range(args.reps)]
                jax.block_until_ready(hs[-1][0].mask)
                timing[m] = min(timing[m],
                                (time.perf_counter() - t0) / args.reps)
        row = {"scene": sid, "goals": {"scan": na, "fused": nb},
               "goals_matched_within_5e3": f"{matched}/{na}",
               "median_nearest_goal_dist": round(match, 6),
               "build_queued_ms": {m: round(1000 * v, 3)
                                   for m, v in timing.items()}}
        print(row, flush=True)
        out["scenes"].append(row)

    ms = {m: float(np.median([r["build_queued_ms"][m]
                              for r in out["scenes"]]))
          for m in ("scan", "fused")}
    out["median_build_queued_ms"] = ms
    out["fused_speedup"] = round(ms["scan"] / ms["fused"], 3)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("median_build_queued_ms", "fused_speedup")}))


if __name__ == "__main__":
    main()
