"""Diagnose the full-budget success regression (VERDICT r3 item 4).

BENCH_r03: early-term success 0.98 vs 0.85 when the 50+20-step budget is
forced (``pre_terminate=False``) — more compute must not un-solve scenes.
Hypothesis: the multiplicative smoothness boost (x1.02/step,
``omg/optimizer.py:59-80`` semantics) keeps re-weighting the tradeoff, so
a trajectory that satisfied the execute criteria mid-run can trade
collision clearance back for smoothness by step 70.

This probe runs the full-budget plan WITH per-step history on every suite
scene and records, per scene: the final execute verdict, whether execute
was true at ANY step (creep proof), the first/last executable step, and
which criterion (collide vs smooth) fails at the end.

Usage: python scripts/diag_full_budget.py [--cpu] [--scenes N]
       [--exec-snapshot]  (A/B the cfg.full_budget_exec_snapshot fix)
Writes docs/diag_full_budget_r04.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SUITE = os.path.join(REPO, "data", "suite_v2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=100)
    ap.add_argument("--exec-snapshot", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "diag_full_budget_r04.json"))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.parallel.batch import pad_objects
    from omg_planner_tpu.planner.plan import plan, plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True, exec_snapshot=False)
    cfg_full = cfg.replace(pre_terminate=False)
    if args.exec_snapshot:
        cfg = cfg.replace(exec_snapshot=True)
        cfg_full = cfg_full.replace(exec_snapshot=True)
    model = panda.load_panda(collision_point_num=cfg.collision_point_num)
    plan_hist = jax.jit(plan, static_argnums=(1,))
    plan_early = jax.jit(plan_fast, static_argnums=(1,))

    scenes = [PlanningScene.from_npz(cfg, os.path.join(
        SUITE, f"scene_{sid}.npz")) for sid in range(args.scenes)]
    max_obj = max(len(s.env.objects) for s in scenes)

    rows = []
    t_all = time.time()
    for sid, sc in enumerate(scenes):
        pr = pad_objects(sc.build_problem(), max_obj)
        r_e = plan_early(model, cfg.jit_key(), pr)
        r_f = plan_hist(model, cfg_full.jit_key(), pr)
        ih = r_f.info_history
        coll = np.asarray(ih.collide)
        smooth = np.asarray(ih.smooth)
        exec_steps = np.asarray(ih.execute)
        fin = r_f.info
        row = dict(
            sid=sid,
            early_flag=bool(np.asarray(r_e.flag)),
            early_steps=int(np.asarray(r_e.steps_used)),
            full_exec=bool(np.asarray(fin.execute)),
            exec_any=bool(exec_steps.any()),
            first_exec=int(exec_steps.argmax()) if exec_steps.any() else -1,
            last_exec=(int(len(exec_steps) - 1 - exec_steps[::-1].argmax())
                       if exec_steps.any() else -1),
            final_collide=float(np.asarray(fin.collide)),
            final_smooth=float(np.asarray(fin.smooth)),
            fail_collide=bool(np.asarray(fin.collide)
                              > cfg.allow_collision_point),
            fail_smooth=bool(np.asarray(fin.smooth)
                             >= cfg.terminate_smooth_loss),
            max_collide_after_first_exec=(
                float(coll[exec_steps.argmax():].max())
                if exec_steps.any() else None),
            max_smooth=float(smooth.max()),
        )
        rows.append(row)
        if not row["full_exec"] or not row["early_flag"]:
            print(f"[{sid}] early={row['early_flag']} "
                  f"full_exec={row['full_exec']} exec_any={row['exec_any']} "
                  f"first/last exec {row['first_exec']}/{row['last_exec']} "
                  f"end collide {row['final_collide']:.0f} "
                  f"smooth {row['final_smooth']:.1f}", flush=True)
        sc.env._scene_sdf = None
        del pr, r_e, r_f

    early = np.mean([r["early_flag"] for r in rows])
    full = np.mean([r["full_exec"] for r in rows])
    creep = [r["sid"] for r in rows if r["exec_any"] and not r["full_exec"]]
    never = [r["sid"] for r in rows
             if not r["exec_any"] and not r["full_exec"]]
    summary = dict(
        n=len(rows), early_success=round(float(early), 3),
        full_budget_success=round(float(full), 3),
        exec_snapshot=bool(args.exec_snapshot),
        creep_scenes=creep,   # were executable mid-run, lost it by step 70
        never_exec_scenes=never,
        wall_s=round(time.time() - t_all, 1),
        device=str(jax.devices()[0]),
    )
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump(dict(summary=summary, rows=rows), f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
