"""A/B the in-plan goal blacklist (cfg.inplan_blacklist_*) on the hard
suite: success / steps / plan wall vs the plain plan, overall and on the
diagnosed analytic-FAIL population (docs/diag_fails_r03.json).

Usage: python scripts/probe_inplan_blacklist.py [--cpu] [--scenes 100]
           [--fails-only] [--first 30] [--every 15]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
SUITE = os.path.join(REPO, "data", "suite_v2")
DIAG = os.path.join(REPO, "docs", "diag_fails_r03.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=100)
    ap.add_argument("--fails-only", action="store_true")
    ap.add_argument("--first", type=int, default=30)
    ap.add_argument("--every", type=int, default=15)
    ap.add_argument("--grid", type=str, default="",
                    help="comma list of first/every pairs, e.g. 20/10,30/10"
                         " (replaces base+single-variant)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.utils.timing import retry_transient

    sids = list(range(args.scenes))
    if args.fails_only:
        # the recoverable FAIL population: analytic-FAIL scenes that passed
        # the suite's own generation screen (screen-FAIL scenes are beyond
        # any planner; docs/diag_fails_r03.json)
        diag = json.load(open(DIAG))
        sids = [s["scene"] for s in diag["scenes"]
                if s["screen_success"]][:args.scenes]

    model = panda.load_panda()
    plan_one = jax.jit(plan_fast, static_argnums=(1,))
    variants = {
        "base": {},
        f"bl{args.first}/{args.every}": {
            "inplan_blacklist_step": args.first,
            "inplan_blacklist_every": args.every},
    }
    if args.grid:
        variants = {}
        for pair in args.grid.split(","):
            f, e = (int(x) for x in pair.split("/"))
            variants[f"bl{f}/{e}"] = {"inplan_blacklist_step": f,
                                      "inplan_blacklist_every": e}
    for name, over in variants.items():
        cfg = OMGConfig(silent=True, **over)
        flags, steps, walls = [], [], []
        for n, sid in enumerate(sids):
            sc = PlanningScene.from_npz(
                cfg, os.path.join(SUITE, f"scene_{sid}.npz"))

            def run():
                pr = sc.build_problem()
                jax.block_until_ready(pr.goal_set.grasps)
                t0 = time.time()
                r = plan_one(model, cfg.jit_key(), pr)
                jax.block_until_ready(r.traj)
                return r, time.time() - t0

            r, dt = retry_transient(run, f"{name} scene {sid}")
            if n == 0:  # compile pass; rerun warm
                r, dt = retry_transient(run, f"{name} rerun")
            flags.append(bool(np.asarray(r.flag)))
            steps.append(int(np.asarray(r.steps_used)))
            walls.append(dt)
        print(f"{name:10s} success {np.mean(flags):.2f}  "
              f"mean_steps {np.mean(steps):5.1f}  "
              f"plan p50 {1000*np.median(walls):6.1f} ms  "
              f"mean {1000*np.mean(walls):6.1f} ms  (n={len(sids)})",
              flush=True)


if __name__ == "__main__":
    main()
