"""Diagnose the analytic-FAIL population on the pinned hard suite and A/B
the cascade fallback policies (VERDICT r2 item 2).

For every suite scene that FAILs on the default analytic backend, run four
fallback arms on the exact grid backend:

  cold_fast   re-plan from the spline init, early-termination on
              (round-2 cascade behavior)
  warm_fast   resume from the analytic attempt's final trajectory
              (scene.step(traj_init=...), the round-3 warm-start)
  warm_full   warm + full budget (pre_terminate off)
  cold_full   cold + full budget

Writes ``docs/diag_fails_r03.json``: per-scene fail metrics (collide /
reach / smooth / family / screen class) + per-arm verdicts and walls, plus
the summary the cascade default is chosen from.

Run on the TPU (ambient axon):
  setsid nohup python scripts/diag_fails.py > /tmp/diag_fails.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SUITE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "data", "suite_v2")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "docs", "diag_fails_r03.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(n=100):
    import jax

    if os.environ.get("DIAG_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.ops.sdf import AnalyticScene, stage_scene_sdfs
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.parallel.batch import pad_objects
    from omg_planner_tpu.utils.timing import retry_transient

    cfg = OMGConfig(silent=True)  # analytic default
    cfg_x = cfg.replace(sdf_analytic=False)
    cfg_x_full = cfg_x.replace(pre_terminate=False)
    model = panda.load_panda(collision_point_num=cfg.collision_point_num)
    plan_one = jax.jit(plan_fast, static_argnums=(1,))

    with open(os.path.join(SUITE, "manifest.json")) as f:
        manifest = {s["scene"]: s for s in json.load(f)["scenes"]}

    scenes = [PlanningScene.from_npz(cfg, os.path.join(
        SUITE, f"scene_{sid}.npz")) for sid in range(n)]
    all_shapes = np.array([o.sdf.shape for s in scenes
                           for o in s.env.objects])
    pad_to = tuple(all_shapes.max(axis=0))
    max_obj = max(len(s.env.objects) for s in scenes)

    rows = []
    for k, scene in enumerate(scenes):
        def analytic():
            scene._staged = None
            scene.env._scene_sdf = None
            pr = pad_objects(scene.build_problem(), max_obj)
            jax.block_until_ready(pr)
            r = plan_one(model, cfg.jit_key(), pr)
            jax.block_until_ready(r.traj)
            return r

        r = retry_transient(analytic, f"analytic scene {k}", log=log)
        if bool(np.asarray(r.flag)):
            scene.env._scene_sdf = None
            continue
        row = {
            "scene": k,
            "family": manifest[k]["family"],
            "cls": manifest[k]["cls"],
            "screen_success": manifest[k]["success"],
            "analytic": {
                "collide": float(np.asarray(r.info.collide)),
                "reach": float(np.asarray(r.info.reach)),
                "smooth": float(np.asarray(r.info.smooth)),
                "steps": int(np.asarray(r.steps_used)),
            },
        }
        warm = np.asarray(r.traj)

        def arm(cfg_arm, traj_init, label):
            def run():
                t0 = time.time()
                scene.cfg = cfg_arm
                scene._sync_env_cfg()
                if scene.env._scene_sdf is None or isinstance(
                        scene.env.scene_sdf(), AnalyticScene):
                    scene.env._scene_sdf = stage_scene_sdfs(
                        [o.sdf for o in scene.env.objects],
                        baked=cfg_arm.sdf_baked, pad_to=pad_to)
                scene._staged = None
                pr = pad_objects(scene.build_problem(), max_obj)
                if traj_init is not None:
                    ti = np.asarray(traj_init, np.float32)
                    pr = pr._replace(
                        traj_init=jax.numpy.asarray(ti),
                        end=jax.numpy.asarray(ti[-1]))
                jax.block_until_ready(pr)
                r2 = plan_one(model, cfg_arm.jit_key(), pr)
                jax.block_until_ready(r2.traj)
                return r2, time.time() - t0

            r2, dt = retry_transient(run, f"{label} scene {k}", log=log)
            return {
                "flag": bool(np.asarray(r2.flag)),
                "collide": float(np.asarray(r2.info.collide)),
                "reach": float(np.asarray(r2.info.reach)),
                "steps": int(np.asarray(r2.steps_used)),
                "wall_s": round(dt, 3),
            }

        try:
            row["cold_fast"] = arm(cfg_x, None, "cold_fast")
            row["warm_fast"] = arm(cfg_x, warm, "warm_fast")
            row["warm_full"] = arm(cfg_x_full, warm, "warm_full")
            row["cold_full"] = arm(cfg_x_full, None, "cold_full")
        finally:
            scene.cfg = cfg
            scene.env._scene_sdf = None
        rows.append(row)
        log(f"[diag] scene {k} cls={row['cls']} "
            f"analytic collide={row['analytic']['collide']:.0f} "
            f"reach={row['analytic']['reach']:.3f} | "
            + " ".join(f"{a}={row[a]['flag']}" for a in
                       ("cold_fast", "warm_fast", "warm_full",
                        "cold_full")))

    arms = ("cold_fast", "warm_fast", "warm_full", "cold_full")
    summary = {
        "n_scenes": n,
        "n_analytic_fail": len(rows),
        "fail_by_cls": {},
        "recovered": {a: sum(r[a]["flag"] for r in rows) for a in arms},
        "recovered_screened_ok": {
            a: sum(r[a]["flag"] for r in rows if r["screen_success"])
            for a in arms},
        "n_fail_screened_ok": sum(r["screen_success"] for r in rows),
        "median_wall_s": {
            a: float(np.median([r[a]["wall_s"] for r in rows]))
            if rows else None for a in arms},
    }
    for r in rows:
        summary["fail_by_cls"][r["cls"]] = \
            summary["fail_by_cls"].get(r["cls"], 0) + 1
    report = {"summary": summary, "scenes": rows}
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    log(json.dumps(summary, indent=1))
    log(f"-> {OUT}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
