"""CLI driver (reference ``python -m omg.core``, ``omg/core.py:782-885``).

Modes:
  python -m omg_planner_tpu -f 0              one synthetic scene by id
  python -m omg_planner_tpu -f scene.npz      scene from an .npz file
  python -m omg_planner_tpu -exp              loop the 100-scene suite
  python -m omg_planner_tpu -p -f 0           perception mode: plan against a
                                              point-cloud SDF of the scene
  add -w to write a playback video, -v to dump frames
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _load_scene(cfg, name: str, n_obstacles: int, traj_init: str = "grasp"):
    from .planner.scene import PlanningScene

    if name.endswith(".npz") and os.path.exists(name):
        from .io.assets import make_primitive
        from .io.scene_io import load_npz_scene
        from .planner.scene import Env

        d = load_npz_scene(name)
        env = Env(cfg)
        for kind, ext, pose, nm in zip(d["kinds"], d["extents"], d["poses"],
                                       d["names"]):
            env.add_object(make_primitive(
                str(nm), str(kind), np.trim_zeros(np.asarray(ext), "b"),
                pose, compute_grasp=(str(nm) == d["target_name"])))
        env.set_target(d["target_name"])
        scene = PlanningScene(cfg, env)
        if traj_init == "scene" and "goals" in d:
            # precomputed goals from the scene file (planner.py:155-174)
            scene.set_precomputed_goals(
                d["goals"], d.get("reach_grasps"))
        return scene
    return PlanningScene.synthetic(cfg, scene_id=int(name),
                                   n_obstacles=n_obstacles)


def _perception_plan(cfg, scene_id: int, n_obstacles: int):
    """Plan from observed points: sample object surfaces as the 'observed'
    cloud, rebuild a PointEnv, reuse the scene's grasp IK goals as external
    grasps (reference ``-p`` flow, ``omg/core.py:826-867``)."""
    import jax.numpy as jnp

    from .models import panda
    from .planner.scene import PlanningScene, PointEnv

    full = PlanningScene.synthetic(cfg, scene_id=scene_id,
                                   n_obstacles=n_obstacles)
    goal_set = full.build_goal_set()
    mask = np.asarray(goal_set.mask)
    grasp_configs = np.asarray(goal_set.grasps)[mask]
    if len(grasp_configs) == 0:
        print("no grasps found for perception mode")
        return None
    import jax
    hands = np.array(jax.jit(jax.vmap(
        lambda q: panda.hand_pose(full.model, q)))(
            jnp.asarray(grasp_configs, jnp.float32)))

    # observe the scene through the point-splat camera (partial view with
    # self-occlusion; reference renders depth+mask and back-projects,
    # core.py:826-867), then split target vs obstacles by segmentation
    from .viz.camera import render_point_observation

    pts, labels, _depth, _seg = render_point_observation(full.env.objects)
    nontarget = pts[labels != full.env.target_idx].astype(np.float32)
    if len(nontarget) > 3072:
        nontarget = nontarget[
            np.random.default_rng(0).choice(len(nontarget), 3072,
                                            replace=False)]

    env = PointEnv(cfg)
    env.compute_sdf_from_points(nontarget)
    scene = PlanningScene(cfg, env)
    scene.external_grasps = hands
    return scene


def main():
    ap = argparse.ArgumentParser(prog="omg_planner_tpu")
    ap.add_argument("-f", "--file", default="0",
                    help="scene id (int) or scene .npz path")
    ap.add_argument("-exp", "--experiment", action="store_true",
                    help="loop the 100-scene suite")
    ap.add_argument("-p", "--perception", action="store_true")
    ap.add_argument("-w", "--write_video", action="store_true")
    ap.add_argument("-v", "--vis", action="store_true")
    ap.add_argument("-vc", "--vis_collision", action="store_true",
                    help="overlay collision points colored by potential "
                         "with gradient quivers (reference fast_debug_vis "
                         "collision mode, core.py:561-630)")
    ap.add_argument("-vg", "--vis_goalset", action="store_true",
                    help="overlay goal-set ghost skeletons")
    ap.add_argument("-g", "--grasp", default="grasp",
                    choices=["grasp", "scene"],
                    help="goal init: grasp DB IK, or precomputed scene goals")
    ap.add_argument("--obstacles", type=int, default=2)
    ap.add_argument("--fast", action="store_true",
                    help="history-free while-loop plan")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from .config import OMGConfig

    cfg = OMGConfig()
    if args.grasp == "scene":
        cfg = cfg.replace(use_standoff=False)  # planner.py:160-161

    def run_one(scene, name):
        res = scene.step(fast=args.fast)
        if res is None:
            return False
        if (args.write_video or args.vis or args.vis_collision
                or args.vis_goalset):
            import numpy as np

            from .viz.render import (render_trajectory,
                                     render_trajectory_collision,
                                     write_video)

            kw = {}
            if args.vis_goalset and scene.goal_set is not None:
                m = np.asarray(scene.goal_set.mask)
                kw["goal_configs"] = np.asarray(scene.goal_set.grasps)[m][:16]
            if args.vis_collision:
                frames = render_trajectory_collision(
                    scene.model, scene, res.traj, every=2, **kw)
            else:
                frames = render_trajectory(
                    scene.model, scene.env.objects, res.traj, every=2, **kw)
            os.makedirs("output_videos", exist_ok=True)
            write_video(frames, f"output_videos/{name}.avi")
            print(f"video: output_videos/{name}.avi")
        return bool(res.flag)

    if args.experiment:
        cfg = cfg.replace(use_standoff=False)  # core.py:876
        suite = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "suite_v2")
        t0 = time.time()
        if os.path.isdir(suite):
            # the pinned hard suite, with execution validation
            from .planner.runner import SuiteRunner

            runner = SuiteRunner("output_suite", cfg.replace(silent=True),
                                 scene_source="npz", suite_dir=suite)
            out = runner.run(range(100))
            print(f"total: {out['success']}/{out['total']} planned, "
                  f"{out.get('exec_valid', '?')} execution-valid in "
                  f"{time.time() - t0:.1f}s")
        else:
            wins = 0
            for sid in range(100):
                scene = _load_scene(cfg, str(sid), args.obstacles)
                wins += run_one(scene, f"scene_{sid}")
                print(f"scene_{sid}: cumulative success {wins}/{sid + 1}")
            print(f"total: {wins}/100 in {time.time() - t0:.1f}s")
    elif args.perception:
        scene = _perception_plan(cfg, int(args.file), args.obstacles)
        if scene is not None:
            run_one(scene, f"perception_{args.file}")
    else:
        scene = _load_scene(cfg, args.file, args.obstacles, args.grasp)
        run_one(scene, f"scene_{args.file}")


if __name__ == "__main__":
    main()
