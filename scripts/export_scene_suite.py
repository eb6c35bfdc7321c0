"""Export the synthetic benchmark scene suites as .npz scene files.

Gives users a persisted, inspectable dataset (the role of the reference's
``data/scenes/scene_0..99.mat``): ``python scripts/export_scene_suite.py -o
data/scenes``; load any of them with ``python -m omg_planner_tpu -f
data/scenes/scene_7.npz``.

``--hard`` builds the difficulty-calibrated round-2 suite
(clutter/shelf/far families with settle-and-reject placement,
``io/scene_gen.py``) with a PLANNING SCREEN: every candidate scene is
planned at the standard budget and kept only if it lands in the target
difficulty mix — mostly "hard band" scenes where the optimizer needs real
work (>= min-steps), a bounded quota of unsolved-at-budget scenes, and a
small quota of easy ones (the reference's 100-scene YCB suite has the same
shape: most plans use the budget, some fail, a few are free,
``omg/planner.py:639-648``).  Per-scene screen results are pinned in
``manifest.json`` so the difficulty claim is reproducible from the
artifact alone.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def export_plain(args):
    from omg_planner_tpu.io.assets import synthetic_tabletop_scene
    from omg_planner_tpu.io.scene_io import save_npz_scene

    for sid in range(args.n):
        objects, target = synthetic_tabletop_scene(
            sid, n_obstacles=args.obstacles)
        save_npz_scene(os.path.join(args.out, f"scene_{sid}.npz"),
                       objects, target)
    print(f"wrote {args.n} scenes to {args.out}")


def export_hard(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.io.scene_gen import synthetic_hard_scene
    from omg_planner_tpu.io.scene_io import save_npz_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True)
    quota_easy = int(args.n * 0.10)
    quota_fail = int(args.n * 0.15)
    kept, n_easy, n_fail = [], 0, 0
    candidate = 0
    while len(kept) < args.n and candidate < args.max_candidates:
        sid = candidate
        candidate += 1
        objects, target = synthetic_hard_scene(sid)
        scene = PlanningScene._from_objects(cfg, objects, target)
        res = scene.step(fast=True)
        if res is None:          # empty goal set: structurally broken
            continue
        steps = int(res.steps_used)
        ok = bool(res.flag)
        if ok and steps >= args.min_steps:
            cls = "band"
        elif ok:
            if n_easy >= quota_easy:
                continue
            n_easy += 1
            cls = "easy"
        else:
            if n_fail >= quota_fail:
                continue
            n_fail += 1
            cls = "fail"
        out_id = len(kept)
        save_npz_scene(os.path.join(args.out, f"scene_{out_id}.npz"),
                       objects, target)
        kept.append(dict(scene=out_id, gen_seed=sid, family=sid % 3,
                         cls=cls, steps=steps, success=ok,
                         collide=int(res.info.collide)))
        print(f"[{out_id}/{args.n}] gen_seed={sid} {cls} steps={steps} "
              f"success={ok}", flush=True)

    stats = dict(
        n=len(kept), candidates_tried=candidate,
        mean_steps=float(np.mean([k["steps"] for k in kept])),
        success_rate=float(np.mean([k["success"] for k in kept])),
        screen=dict(min_steps=args.min_steps, quota_easy=quota_easy,
                    quota_fail=quota_fail,
                    budget=dict(optim_steps=cfg.optim_steps,
                                extra_smooth_steps=cfg.extra_smooth_steps)),
        scenes=kept)
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(f"wrote {len(kept)} scenes to {args.out}: "
          f"mean_steps={stats['mean_steps']:.1f} "
          f"success={stats['success_rate']:.2f} "
          f"({candidate} candidates screened)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="data/scenes")
    ap.add_argument("-n", type=int, default=100)
    ap.add_argument("--obstacles", type=int, default=3)
    ap.add_argument("--hard", action="store_true",
                    help="export the screened difficulty-calibrated suite")
    ap.add_argument("--min-steps", type=int, default=12,
                    help="hard-band threshold for the planning screen")
    ap.add_argument("--max-candidates", type=int, default=1000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.hard:
        export_hard(args)
    else:
        export_plain(args)


if __name__ == "__main__":
    main()
