"""Empirical goal-quality study (VERDICT r4 item 2 groundwork).

For each execution-failing suite scene, plan to EVERY goal candidate
(one-hot goal mask — same jitted program, no recompiles) and execute it
in the physics stepper; record reward + per-goal geometric features
(approach downness, object width along the closing axis, pinch-axis
world orientation).  The resulting table says whether goal re-ranking
can fix the r4 failures at all, and which feature separates winners.

Usage: python scripts/probe_goal_quality.py [--scenes 25,36,...] [--max-goals 12]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R4_FAILS = [25, 36, 56, 59, 65, 67, 68, 82, 86]
R4_PASS_SAMPLE = [0, 1, 7, 13, 40, 71]          # control group


def support_width(kind: int, half: np.ndarray, d_obj: np.ndarray) -> float:
    """Object width along direction ``d_obj`` (object frame, unit)."""
    half = np.asarray(half, np.float64)
    if kind == 2:  # cylinder [r, r, hz]
        return 2.0 * (half[0] * np.linalg.norm(d_obj[:2])
                      + half[2] * abs(d_obj[2]))
    if kind == 1:  # sphere
        return 2.0 * half[0]
    return 2.0 * float(np.abs(d_obj) @ half)  # box


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="")
    ap.add_argument("--max-goals", type=int, default=12)
    ap.add_argument("--out", default="docs/probe_goal_quality_r05.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.physics import NoMassModelError, execute_plan
    from omg_planner_tpu.planner import goal_set as gs
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene

    sids = ([int(s) for s in args.scenes.split(",") if s]
            or R4_FAILS + R4_PASS_SAMPLE)
    cfg = OMGConfig(silent=True)
    plan_one = jax.jit(plan_fast, static_argnums=(1,))
    rows = []
    for sid in sids:
        sc = PlanningScene.from_npz(
            cfg, os.path.join("data", "suite_v2", f"scene_{sid}.npz"))
        gset = sc.build_goal_set()
        mask = np.asarray(gset.mask)
        valid = np.nonzero(mask)[0]
        if len(valid) == 0:
            continue
        ana = getattr(sc.env.target.sdf, "analytic", None)
        kind = int(ana[0]) if ana is not None else -1
        half = np.asarray(ana[1]) if ana is not None else np.zeros(3)
        r_obj = np.asarray(sc.env.target.pose_mat[:3, :3])
        hands = np.asarray(panda.hand_pose_batch(sc.model, gset.grasps))
        pick = valid[np.linspace(0, len(valid) - 1,
                                 min(args.max_goals, len(valid)),
                                 dtype=int)]
        pick = sorted(set(pick.tolist()))
        for k in pick:
            onehot = np.zeros_like(mask)
            onehot[k] = True
            gs_k = gset._replace(mask=jnp.asarray(onehot))
            pr = sc.build_problem(goal_set=gs_k)
            sc._staged = None  # don't cache the one-hot set
            res = plan_one(sc.model, cfg.jit_key(), pr)
            flag = bool(np.asarray(res.flag))
            y_hat = hands[k, :3, 1]               # closing axis (world)
            z_hat = hands[k, :3, 2]               # approach axis (world)
            d_obj = r_obj.T @ y_hat
            feat = {
                "scene": sid, "goal": int(k),
                "downness": round(float(-z_hat[2]), 3),
                "close_width_m": round(
                    support_width(kind, half, d_obj), 4),
                "close_vertical": round(float(abs(y_hat[2])), 3),
                "obj_kind": kind,
                "obj_half": half.round(4).tolist(),
                "plan_flag": flag,
            }
            if flag:
                try:
                    rep = execute_plan(sc, np.asarray(res.traj))
                    feat.update(reward=rep.reward,
                                lifted_m=round(rep.lifted_m, 3),
                                hand_dist_m=round(rep.hand_dist_m, 3),
                                finger_stop_m=round(rep.finger_stop_m, 4))
                except NoMassModelError:
                    feat.update(reward=None)
            rows.append(feat)
            print(json.dumps(feat), flush=True)
    with open(args.out, "w") as f:
        json.dump({"what": "per-goal plan+execute outcomes with geometric "
                           "features (r4 failing scenes + pass controls)",
                   "rows": rows}, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
