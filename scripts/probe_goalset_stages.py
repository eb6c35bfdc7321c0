"""Stage-level decomposition of the goal-set build on the attached device.

The end-to-end bottleneck is the warm goal-set build (~0.6 s/scene on the
v5e, BENCH_r02); this probe times each stage of the pipeline as its own
warm jitted program so the next optimization targets the right stage:

  prefilter   fixed-iteration DLS sweep over all (grasp x seed) lanes
  compact     survivor ranking + take_rows to ik_survivor_cap
  chain       scanned standoff Newton chain (1 + tail batched solves)
  augflt      wrist-flip augment + task-space filter
  prune       goal_prune_cap compaction + batched collision prune
  tail        dedupe + sample + gather + goal init + spline init

Stage walls won't sum exactly to the fused program (XLA fuses across
stages and the one-dispatch build avoids intermediate host syncs), but
the ranking is what matters.

Usage: python scripts/probe_goalset_stages.py [--cpu] [--scene K]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, *args, n=5):
    """Warm wall time of a jitted fn (first call compiles)."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scene", type=int, default=0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.ops import ik as ik_ops
    from omg_planner_tpu.planner import goal_set as gs
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True).jit_key()
    suite = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "data", "suite_v2")
    scene = PlanningScene.from_npz(cfg, os.path.join(
        suite, f"scene_{args.scene}.npz"))
    model = scene.model
    env = scene.env
    poses = jnp.asarray(env.grasp_poses_world(), jnp.float32)
    start = jnp.asarray(scene.start, jnp.float32)
    key = jax.random.PRNGKey(0)
    lo, hi = model.soft_limits(cfg.soft_joint_limit_padding)
    seeds = jnp.concatenate([
        start[None, :7],
        jnp.asarray(gs.ANCHOR_SEEDS[: cfg.ik_seed_num, :7], jnp.float32)])
    n, s = poses.shape[0], seeds.shape[0]
    print(f"device={jax.devices()[0]} grasps={n} seeds={s} lanes={n*s}")

    # --- stage: prefilter ------------------------------------------------
    tail = cfg.reach_tail_length
    offs = jnp.zeros((tail, 4, 4)).at[:].set(jnp.eye(4))
    if cfg.use_standoff:
        zs = -cfg.standoff_dist * jnp.arange(tail) / tail
        offs = offs.at[:, 2, 3].set(zs)

    @jax.jit
    def prefilter(poses):
        standoffs = jnp.einsum("nab,kbc->nkac", poses, offs)
        tgt = jnp.repeat(standoffs, s, axis=0)
        seeds_b = jnp.tile(seeds, (n, 1))
        q, err = ik_ops.ik_batch_fixed(model, tgt[:, -1], seeds_b, cfg,
                                       lo[:7], hi[:7],
                                       cfg.ik_prefilter_iters)
        return tgt, q, err

    dt, (tgt, q_pre, err_pre) = timed(prefilter, poses, n=args.reps)
    print(f"prefilter   {dt*1000:8.1f} ms   ({cfg.ik_prefilter_iters} iters"
          f" x {n*s} lanes)")

    # --- stage: compact ----------------------------------------------------
    from omg_planner_tpu.utils.linalg import take_rows
    k_cap = min(n * s, cfg.ik_survivor_cap)

    @jax.jit
    def compact(tgt, q_pre, err_pre):
        lane_idx = jax.lax.top_k(-err_pre, k_cap)[1]
        return (take_rows(tgt, lane_idx), take_rows(q_pre, lane_idx),
                jnp.take(err_pre, lane_idx) < cfg.ik_prefilter_tol)

    dt, (tgt_c, seeds_c, active) = timed(compact, tgt, q_pre, err_pre,
                                         n=args.reps)
    print(f"compact     {dt*1000:8.1f} ms   (top-{k_cap} of {n*s})")
    print(f"  active lanes: {int(np.asarray(active).sum())}/{k_cap}")

    # --- stage: chain ------------------------------------------------------
    @jax.jit
    def chain(tgt_c, seeds_c, active):
        def chain_step(carry, tgt_k):
            prev, ok, act = carry
            res = ik_ops.ik_batch(model, tgt_k, prev, cfg, lo[:7], hi[:7],
                                  active=act)
            return (res.q, ok & res.success, act & res.success), res.q

        chain_tgts = jnp.concatenate([tgt_c[:, -1:], tgt_c], axis=1)
        (_, ok, _), qs = jax.lax.scan(
            chain_step, (seeds_c, active, active),
            jnp.moveaxis(chain_tgts, 0, 1))
        return ok, jnp.moveaxis(qs[1:], 0, 1)

    dt, (ok, qs) = timed(chain, tgt_c, seeds_c, active, n=args.reps)
    print(f"chain       {dt*1000:8.1f} ms   ({1+tail} solves x {k_cap} "
          f"lanes, <=({cfg.ik_max_iters}) iters)")
    print(f"  chain-valid lanes: {int(np.asarray(ok).sum())}")

    # --- full fused build (scene API) ----------------------------------
    def full():
        scene._staged = None
        scene._staged_init = None
        gs_out = scene.build_goal_set()
        jax.block_until_ready(gs_out.grasps)
        return gs_out

    full()  # compile + cache staging
    t0 = time.time()
    for _ in range(args.reps):
        out = full()
    dt_full = (time.time() - t0) / args.reps
    print(f"FULL build  {dt_full*1000:8.1f} ms   "
          f"(valid goals {int(np.asarray(out.mask).sum())})")

    # residual = augment/filter/prune/dedupe/sample + dispatch overhead
    print("(full - prefilter - compact - chain = augment/filter/prune/"
          "dedupe/sample/init + per-dispatch overhead)")


if __name__ == "__main__":
    main()
