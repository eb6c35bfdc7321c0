"""Scripted multi-step pick-and-place (kitchen) tasks.

Re-implements the reference's kitchen task driver
(``bullet/panda_kitchen_scene.py:440-607`` + ``real_world/trial.py:235-430``)
without PyBullet/GL: a synthetic cabinet scene and the same script grammar
(parsed at ``panda_kitchen_scene.py:477-501``):

    T <target_name>          plan a grasp of <target_name>
    P dx,dy,dz[,standoff]    place the held object displaced by (dx,dy,dz)
    E <i>                    move to anchor configuration i
    ONCE                     run the script once (no looping)

Usage:  python -m omg_planner_tpu.apps.kitchen -s script.txt
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import OMGConfig
from ..io.assets import DEFAULT_START, make_primitive, pose_at
from ..planner import tasks
from ..planner.goal_set import ANCHOR_SEEDS
from ..planner.scene import Env, PlanningScene


def kitchen_scene(cfg: OMGConfig) -> PlanningScene:
    """A synthetic cabinet: shelf boards + side walls + objects on shelves
    (plays the role of ``data/scenes/kitchen0.mat``)."""
    env = Env(cfg)
    # shelf boards
    for k, z in enumerate((0.05, 0.42)):
        env.add_object(make_primitive(
            f"shelf_{k}", "box", [0.5, 0.9, 0.04],
            pose_at([0.62, 0.0, z]), compute_grasp=False, delta=0.02))
    # side walls
    for k, y in enumerate((-0.47, 0.47)):
        env.add_object(make_primitive(
            f"wall_{k}", "box", [0.5, 0.04, 0.8],
            pose_at([0.62, y, 0.4]), compute_grasp=False, delta=0.02))
    # objects on the lower shelf
    env.add_object(make_primitive(
        "mug", "cylinder", [0.032, 0.1], pose_at([0.52, -0.18, 0.12])))
    env.add_object(make_primitive(
        "can", "cylinder", [0.030, 0.12], pose_at([0.55, 0.15, 0.13])))
    env.set_target("mug")
    return PlanningScene(cfg, env)


def parse_script(path: str):
    steps = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line == "ONCE":
                steps.append(("ONCE",))
            elif line.startswith("T "):
                steps.append(("T", line[2:].strip()))
            elif line.startswith("P "):
                vals = [float(v) for v in line[2:].split(",")]
                steps.append(("P", vals))
            elif line.startswith("E "):
                steps.append(("E", int(line[2:])))
    return steps


def run_script(scene: PlanningScene, steps, fast: bool = False):
    """Execute the parsed script; returns the per-step results."""
    conf = np.array(DEFAULT_START)
    held = None
    results = []
    for step in steps:
        kind = step[0]
        if kind == "ONCE":
            continue
        if kind == "T":
            res = tasks.plan_to_target(scene, conf, step[1], fast=fast)
            if res is not None:
                conf = res.traj[-1]
                held = step[1]
            results.append(("pick", step[1], res))
        elif kind == "P":
            if held is None:
                results.append(("place", None, None))
                continue
            dx, dy, dz = step[1][:3]
            # optional 4th value: standoff placement (script grammar
            # ``P dx,dy,dz,standoff``, panda_kitchen_scene.py:477-501)
            standoff = bool(step[1][3]) if len(step[1]) > 3 else False
            place = scene.env.target.pose_mat.copy()
            place[:3, 3] += [dx, dy, dz]
            res, achieved = tasks.place_target(scene, conf, place,
                                               target_name=held,
                                               apply_standoff=standoff,
                                               fast=fast)
            if res is not None:
                conf = res.traj[-1]
            held = None
            results.append(("place", achieved, res))
        elif kind == "E":
            target_conf = ANCHOR_SEEDS[step[1] % len(ANCHOR_SEEDS)]
            res = tasks.plan_to_conf(scene, conf, target_conf, fast=fast)
            if res is not None:
                conf = res.traj[-1]
            results.append(("move", step[1], res))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--script", default=None)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = OMGConfig(silent=False)
    scene = kitchen_scene(cfg)
    if args.script:
        steps = parse_script(args.script)
    else:  # default demo: pick the mug, move it 20 cm sideways, retreat
        steps = [("T", "mug"), ("P", [0.0, 0.25, 0.0]), ("E", 0)]
    results = run_script(scene, steps, fast=args.fast)
    for kind, what, res in results:
        ok = res is not None and bool(res.flag)
        print(f"{kind}: {'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
