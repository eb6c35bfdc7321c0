"""Physics constants sensitivity sweep (VERDICT r4 item 5).

The native stepper's contact constants (``physics/rigid.py::default_params``:
mu=0.8, pinch_force=20 N, damping 0.3/0.6) are hand-tuned; the lift-reward
claim is only as trustworthy as its robustness to them.  This sweep plans
the 30-scene suite ONCE (plans are independent of the physics constants)
and re-executes every plan across the grid

    mu in {0.5, 0.8, 1.1} x pinch in {10, 20, 40} N x damping x{0.5, 1, 2}

recording the planned-grasp reward rate per cell, plus two per-cell
honesty controls: an air grasp (fingers close off-target) must stay 0,
and an overweight target (density x40) must stay 0.

Usage: python scripts/phys_sensitivity.py [--scenes 30]
       [--out docs/phys_sensitivity_r05.json]
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SUITE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "suite_v2")

MUS = [0.5, 0.8, 1.1]
PINCHES = [10.0, 20.0, 40.0]
DAMP_SCALES = [0.5, 1.0, 2.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=30)
    ap.add_argument("--out", default="docs/phys_sensitivity_r05.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.physics import (NoMassModelError, execute_plan,
                                         rigid)
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True)
    planned = []
    for sid in range(args.scenes):
        sc = PlanningScene.from_npz(cfg, os.path.join(
            SUITE, f"scene_{sid}.npz"))
        res = sc.step(fast=True)
        if res is not None and bool(np.asarray(res.flag)):
            planned.append((sid, sc, np.asarray(res.traj)))
    print(f"{len(planned)}/{args.scenes} scenes planned", flush=True)

    base = rigid.default_params()
    ctrl_sid, ctrl_sc, ctrl_traj = planned[0]
    air = ctrl_traj.copy()
    air[-1] = np.asarray(ctrl_sc.start)     # close the fingers off-target

    cells = []
    t_all = time.time()
    for mu, pinch, ds in itertools.product(MUS, PINCHES, DAMP_SCALES):
        pp = base._replace(
            mu=jnp.asarray(mu, jnp.float32),
            pinch_force=jnp.asarray(pinch, jnp.float32),
            damp_lin=base.damp_lin * ds,
            damp_ang=base.damp_ang * ds)
        rewards = []
        for sid, sc, traj in planned:
            try:
                rep = execute_plan(sc, traj, params=pp)
                rewards.append(int(rep.reward))
            except NoMassModelError:
                rewards.append(0)
        air_rep = execute_plan(ctrl_sc, air, params=pp)
        heavy_rep = execute_plan(ctrl_sc, ctrl_traj, params=pp,
                                 density=300.0 * 40)
        cell = {"mu": mu, "pinch_N": pinch, "damp_scale": ds,
                "reward_rate": round(float(np.mean(rewards)), 3),
                "n_lifted": int(np.sum(rewards)),
                "air_grasp_reward": int(air_rep.reward),
                "overweight_reward": int(heavy_rep.reward)}
        cells.append(cell)
        print(json.dumps(cell), flush=True)

    rates = [c["reward_rate"] for c in cells]
    default_cell = next(c for c in cells if c["mu"] == 0.8
                        and c["pinch_N"] == 20.0 and c["damp_scale"] == 1.0)
    out = {
        "what": __doc__.split("\n")[0],
        "n_planned": len(planned),
        "grid": cells,
        "default_cell_reward": default_cell["reward_rate"],
        "reward_min": min(rates), "reward_max": max(rates),
        "reward_spread_scenes": round(
            (max(rates) - min(rates)) * len(planned), 1),
        "controls_always_fail": all(
            c["air_grasp_reward"] == 0 and c["overweight_reward"] == 0
            for c in cells),
        "wall_s": round(time.time() - t_all, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "grid"}))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
