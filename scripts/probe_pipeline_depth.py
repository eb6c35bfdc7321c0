"""A/B plan_pipelined window depth on the hard suite (e2e throughput).

Usage: python scripts/probe_pipeline_depth.py [--cpu] [--scenes 100]
           [--depths 4,8,16,32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
SUITE = os.path.join(REPO, "data", "suite_v2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=100)
    ap.add_argument("--depths", type=str, default="4,8,16,32")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.runner import plan_pipelined
    from omg_planner_tpu.utils.timing import retry_transient

    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True)
    model = panda.load_panda()
    scenes = [(sid, PlanningScene.from_npz(
        cfg, os.path.join(SUITE, f"scene_{sid}.npz")))
        for sid in range(args.scenes)]

    for rep in range(2):  # first pass warms compiles; report the second
        for depth in (int(d) for d in args.depths.split(",")):
            def run():
                t0 = time.time()
                k = 0
                for _ in plan_pipelined(list(scenes), cfg, model=model,
                                        depth=depth):
                    k += 1
                return k / (time.time() - t0)

            rate = retry_transient(run, f"depth {depth}")
            if rep:
                print(f"depth {depth:3d}: {rate:7.3f} plans/s e2e",
                      flush=True)


if __name__ == "__main__":
    main()
