"""Grade in-plan-blacklist recoveries through the independent kinematic
validator (planner/validate.py: fine swept collision against the SHARP
field, grasp geometry, antipodal cone, lift clearance) — the recovered
plans must be as executable as base successes, not just verdict-passing.

Usage: python scripts/probe_bl_validate.py [--cpu] [--scenes 25]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
SUITE = os.path.join(REPO, "data", "suite_v2")
DIAG = os.path.join(REPO, "docs", "diag_fails_r03.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=25)
    ap.add_argument("--first", type=int, default=12)
    ap.add_argument("--every", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.planner.validate import validate_execution
    from omg_planner_tpu.utils.timing import retry_transient

    # the diagnosed analytic-FAIL population that passed the suite screen:
    # every recovery here is a plan base could not produce
    diag = json.load(open(DIAG))
    sids = [s["scene"] for s in diag["scenes"]
            if s["screen_success"]][:args.scenes]

    cfg = OMGConfig(silent=True, inplan_blacklist_step=args.first,
                    inplan_blacklist_every=args.every)
    model = panda.load_panda()
    plan_one = jax.jit(plan_fast, static_argnums=(1,))
    rows = []
    for sid in sids:
        sc = PlanningScene.from_npz(
            cfg, os.path.join(SUITE, f"scene_{sid}.npz"))

        def run():
            pr = sc.build_problem()
            r = plan_one(model, cfg.jit_key(), pr)
            jax.block_until_ready(r.traj)
            return r

        r = retry_transient(run, f"scene {sid}")
        if not bool(np.asarray(r.flag)):
            rows.append((sid, "still-FAIL", None))
            continue
        rep = validate_execution(sc, np.asarray(r.traj))
        rows.append((sid, "recovered", rep))
        print(f"scene {sid}: steps {int(np.asarray(r.steps_used))} "
              f"swept_hits {rep.swept_collision_points} "
              f"grasp {rep.grasp_ok} antipodal {rep.antipodal_ok} "
              f"lift_hits {rep.lift_collision_points} valid {rep.valid}",
              flush=True)
    rec = [r for _, s, r in rows if s == "recovered"]
    ok = [r for r in rec if r.valid]
    print(f"recovered {len(rec)}/{len(rows)}; validator-clean "
          f"{len(ok)}/{len(rec)}", flush=True)


if __name__ == "__main__":
    main()
