"""A/B the goal-set build knobs (survivor cap, chain iteration budget) on
the hard suite: warm build wall vs valid-goal yield vs plan success.

Usage: python scripts/probe_goalset_knobs.py [--cpu] [--scenes 25]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

SUITE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "data", "suite_v2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=25)
    ap.add_argument("--variants", type=str, default="",
                    help="comma list; empty = all")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.utils.timing import retry_transient

    variants = {
        "base": {},
        "cap256": {"ik_survivor_cap": 256},
        "chain25": {"ik_chain_max_iters": 25},
        "cap256+chain25": {"ik_survivor_cap": 256,
                           "ik_chain_max_iters": 25},
        "cap192+chain20": {"ik_survivor_cap": 192,
                           "ik_chain_max_iters": 20},
        "seeds9": {"ik_seed_num": 9},
        "seeds7": {"ik_seed_num": 7},
        "seeds5": {"ik_seed_num": 5},
        "pre8": {"ik_prefilter_iters": 8},
        "seeds7+pre8": {"ik_seed_num": 7, "ik_prefilter_iters": 8},
    }
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    model = panda.load_panda()
    plan_one = jax.jit(plan_fast, static_argnums=(1,))
    for name, over in variants.items():
        cfg = OMGConfig(silent=True, **over)
        walls, valids, flags = [], [], []
        for sid in range(args.scenes):
            sc = PlanningScene.from_npz(
                cfg, os.path.join(SUITE, f"scene_{sid}.npz"))

            def build_and_plan():
                t0 = time.time()
                sc._staged = None
                sc.env._scene_sdf = None
                pr = sc.build_problem()
                jax.block_until_ready(pr.goal_set.grasps)
                dt = time.time() - t0
                r = plan_one(model, cfg.jit_key(), pr)
                jax.block_until_ready(r.traj)
                return pr, r, dt

            pr, r, dt = retry_transient(build_and_plan,
                                        f"{name} scene {sid}")
            if sid == 0:  # compile pass; rerun warm
                pr, r, dt = retry_transient(build_and_plan,
                                            f"{name} rerun")
            walls.append(dt)
            valids.append(int(np.asarray(pr.goal_set.mask).sum()))
            flags.append(bool(np.asarray(r.flag)))
        print(f"{name:16s} build p50 {1000*np.median(walls):6.1f} ms  "
              f"mean {1000*np.mean(walls):6.1f} ms  "
              f"goals {np.mean(valids):5.1f}  "
              f"success {np.mean(flags):.2f}", flush=True)


if __name__ == "__main__":
    main()
