"""Validator-clean rate of ORDINARY base successes (the comparison bar
for probe_bl_validate.py's recovered-plan numbers).

Usage: python scripts/probe_base_validate.py [--cpu] [--scenes 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
SUITE = os.path.join(REPO, "data", "suite_v2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=30)
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

    cfg = OMGConfig(silent=True)
    model = panda.load_panda()
    plan_one = jax.jit(plan_fast, static_argnums=(1,))
    n_succ = n_clean = 0
    lift_fail = swept_fail = 0
    for sid in range(args.scenes):
        sc = PlanningScene.from_npz(
            cfg, os.path.join(SUITE, f"scene_{sid}.npz"))

        def run():
            pr = sc.build_problem()
            r = plan_one(model, cfg.jit_key(), pr)
            jax.block_until_ready(r.traj)
            return r

        r = retry_transient(run, f"scene {sid}")
        if not bool(np.asarray(r.flag)):
            continue
        n_succ += 1
        rep = validate_execution(sc, np.asarray(r.traj))
        n_clean += bool(rep.valid)
        lift_fail += rep.lift_collision_points > 0
        swept_fail += rep.swept_collision_points > 0
    print(f"base successes {n_succ}/{args.scenes}; validator-clean "
          f"{n_clean}/{n_succ} (lift-dirty {lift_fail}, swept-dirty "
          f"{swept_fail})", flush=True)


if __name__ == "__main__":
    main()
