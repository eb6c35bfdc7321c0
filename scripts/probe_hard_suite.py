"""Probe the hard-suite difficulty: per-scene steps/success at the standard
budget (used to calibrate ``io/scene_gen.py`` — target mean steps >= 20 with
~0.8+ success, matching reference-grade difficulty; VERDICT r1 item 1).

Usage: python scripts/probe_hard_suite.py [--scenes N] [--steps S]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=15)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True)
    if args.steps:
        cfg = cfg.replace(optim_steps=args.steps)
    steps, flags = [], []
    for sid in range(args.scenes):
        s = PlanningScene.hard(cfg, scene_id=sid)
        fam = ("clutter", "shelf", "far")[sid % 3]
        t0 = time.time()
        res = s.step(fast=True)
        if res is None:
            print(f"scene {sid} [{fam}]: NO GOALS")
            flags.append(False)
            steps.append(cfg.total_steps)
            continue
        n = int(res.steps_used)
        ok = bool(res.flag)
        steps.append(n)
        flags.append(ok)
        info = res.info
        print(f"scene {sid} [{fam}]: steps={n} flag={ok} "
              f"collide={int(info.collide)} smooth={float(info.smooth):.1f} "
              f"({time.time()-t0:.0f}s)")
    print(f"mean_steps={np.mean(steps):.1f} success={np.mean(flags):.2f}")


if __name__ == "__main__":
    main()
