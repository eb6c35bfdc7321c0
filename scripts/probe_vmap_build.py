"""Streamed vs vmapped goal-set BUILDS (B suite scenes per dispatch).

vmapped PLANS lose (probe_vmap.py: a batched while_loop runs every lane
to the slowest scene's step count, 2.7x worse than streaming).  Builds
are different: fixed-iteration prefilter + capped chain solves over
~600 lanes may underutilize the chip, and batching B scenes into one
dispatch amortizes the remote tunnel's per-dispatch latency.  This probe
measures warm wall per scene for streamed vs vmapped builds on the hard
suite (analytic backend).

Usage: python scripts/probe_vmap_build.py [--cpu] [--scenes 16] [--batch 4]
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
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.io.assets import DEFAULT_START
    from omg_planner_tpu.parallel.batch import _pad_cost_params, pad_scene
    from omg_planner_tpu.planner import goal_set as gs
    from omg_planner_tpu.planner.scene import PlanningScene
    from omg_planner_tpu.utils.timing import retry_transient

    cfg = OMGConfig(silent=True).jit_key()
    scenes = [PlanningScene.from_npz(
        cfg, os.path.join(SUITE, f"scene_{sid}.npz"))
        for sid in range(args.scenes)]

    model = scenes[0].model
    start = jnp.asarray(DEFAULT_START, jnp.float32)

    # host prep: pad every scene to (max_obj, max_grasps)
    max_obj = max(len(s.env.objects) for s in scenes)
    poses_list = [s.env.grasp_poses_world() for s in scenes]
    max_g = max(p.shape[0] for p in poses_list)

    def pad_poses(p):
        pad = np.tile(np.eye(4)[None], (max_g - p.shape[0], 1, 1))
        v = np.zeros(max_g, bool)
        v[: p.shape[0]] = True
        return np.concatenate([p, pad]).astype(np.float32), v

    staged = []
    for s, p in zip(scenes, poses_list):
        pp, v = pad_poses(p)
        staged.append((
            pad_scene(s.env.scene_sdf(), max_obj),
            _pad_cost_params(s.env.cost_params(),
                             max_obj - len(s.env.objects)),
            jnp.asarray(pp), jnp.asarray(v)))

    def build_one(scene_sdf, params, poses, valid, key):
        return gs.build_goal_set(model, cfg, scene_sdf, params, poses,
                                 valid, start, key, attached=False)

    one = jax.jit(build_one)
    many = jax.jit(jax.vmap(build_one, in_axes=(0, 0, 0, 0, 0)))

    keys = jax.random.split(jax.random.PRNGKey(0), len(scenes))

    # --- streamed ---------------------------------------------------------
    def streamed():
        outs = [one(sc, pr, po, va, k)
                for (sc, pr, po, va), k in zip(staged, keys)]
        jax.block_until_ready(outs)
        return outs

    outs_s = retry_transient(streamed, "streamed compile")
    t0 = time.time()
    outs_s = streamed()
    dt_s = (time.time() - t0) / len(scenes)

    # --- vmapped ----------------------------------------------------------
    b = args.batch
    batched = jax.tree.map(lambda *a: jnp.stack(a), *staged)

    def vmapped():
        outs = []
        for lo in range(0, len(scenes), b):
            sl = jax.tree.map(lambda a: a[lo:lo + b], batched)
            outs.append(many(sl[0], sl[1], sl[2], sl[3], keys[lo:lo + b]))
        jax.block_until_ready(outs)
        return outs

    outs_v = retry_transient(vmapped, "vmapped compile")
    t0 = time.time()
    outs_v = vmapped()
    dt_v = (time.time() - t0) / len(scenes)

    ns = [int(np.asarray(o.mask).sum()) for o in outs_s]
    nv = [int(n) for o in outs_v for n in np.asarray(o.mask).sum(axis=1)]
    print(f"streamed  {1000*dt_s:7.1f} ms/scene  goals {ns}")
    print(f"vmapped{b} {1000*dt_v:7.1f} ms/scene  goals {nv}")


if __name__ == "__main__":
    main()
