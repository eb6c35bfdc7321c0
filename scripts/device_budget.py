"""Speed-of-light accounting for the pipelined path (VERDICT r4 item 6).

Measures, warm on the real chip, the per-scene DEVICE budget of the two
production programs — goal-set build and plan — and compares
``1 / (build_dev + plan_dev)`` against the measured pipelined rate, so
the artifact says how close the e2e path is to the chip's own ceiling
and what bounds each program.

Method: each program is timed two ways —
  * ``serial_ms``: dispatch, block, repeat (includes one tunnel round
    trip per call — the single-request cost);
  * ``queued_ms``: N dispatches enqueued back-to-back, one final block
    (the device executes the queue with dispatch overhead overlapped —
    an upper bound on true device time, the pipelined regime).
The gap between the two IS the tunnel/host share.  XLA's
``cost_analysis`` adds FLOPs + HBM bytes so the queued time can be
placed against roofline bounds (v5e: ~197 TFLOP/s bf16 MXU, ~819 GB/s
HBM; the plan program is mostly f32 VPU work, so the bandwidth bound is
the relevant one).

Usage: python scripts/device_budget.py [--scenes 8] [--reps 20]
       [--out docs/device_budget_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SUITE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "suite_v2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/device_budget_r05.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.models import panda
    from omg_planner_tpu.planner.plan import plan_fast
    from omg_planner_tpu.planner.scene import (PlanningScene, _goal_set_fn)
    from omg_planner_tpu.utils.timing import retry_transient

    cfg = OMGConfig(silent=True)
    model = panda.load_panda(collision_point_num=cfg.collision_point_num)
    plan_one = jax.jit(plan_fast, static_argnums=(1,))

    scenes = [PlanningScene.from_npz(cfg, os.path.join(
        SUITE, f"scene_{s}.npz")) for s in range(args.scenes)]

    # tunnel round-trip reference (same probe bench.py records)
    f_tiny = jax.jit(lambda x: x + 1.0)
    x_tiny = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f_tiny(x_tiny))
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(f_tiny(x_tiny))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = 1000.0 * float(np.median(rtts))

    def timed(dispatch, leaf, reps):
        """(serial_ms, queued_ms) for a nullary dispatch closure.

        queued = (first dispatch -> last result ready) / reps with all
        reps enqueued asynchronously, MIN over 3 rounds — the tunnel
        congests in bursts (single-round queued walls have been observed
        4x apart minutes apart), and the min round is the least-congested
        estimate of true device throughput."""
        jax.block_until_ready(leaf(dispatch()))  # warm
        serial = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(leaf(dispatch()))
            serial.append(time.perf_counter() - t0)
        queued = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            hs = [dispatch() for _ in range(reps)]
            jax.block_until_ready(leaf(hs[-1]))
            queued = min(queued, (time.perf_counter() - t0) / reps)
        return 1000.0 * float(np.median(serial)), 1000.0 * queued

    rows = []
    for sc in scenes[:3]:          # per-scene programs: 3 scenes suffice
        sid = scenes.index(sc)

        def build_once(sc=sc):
            sc._staged = None
            return sc.build_problem()

        pr = retry_transient(build_once, "stage problem")
        jax.block_until_ready(pr)
        t = sc.env.target
        fn = _goal_set_fn(cfg.jit_key(), bool(t.attached),
                          bool(t.attached and cfg.z_upsample),
                          bool(cfg.y_upsample and not t.attached))
        poses = jnp.asarray(np.asarray(sc.env.grasp_poses_world(),
                                       np.float32))
        start = jnp.asarray(sc.start, jnp.float32)
        obj_pos = jnp.asarray(t.pose_mat[:3, 3], jnp.float32)
        sdf = sc.env.scene_sdf()
        params = sc.env.cost_params()

        def build_dispatch():
            return fn(model, sdf, params, poses, start,
                      jax.random.PRNGKey(0), obj_pos)

        bs, bq = retry_transient(
            lambda: timed(build_dispatch, lambda r: r[0].grasps,
                          args.reps), "time build")

        def plan_dispatch():
            return plan_one(model, cfg.jit_key(), pr)

        ps_, pq = retry_transient(
            lambda: timed(plan_dispatch, lambda r: r.traj, args.reps),
            "time plan")
        steps = int(np.asarray(plan_dispatch().steps_used))
        rows.append({"scene": sid,
                     "build_serial_ms": round(bs, 2),
                     "build_queued_ms": round(bq, 2),
                     "plan_serial_ms": round(ps_, 2),
                     "plan_queued_ms": round(pq, 2),
                     "steps_used": steps,
                     "plan_ms_per_step": round(pq / max(steps, 1), 3)})
        print(json.dumps(rows[-1]), flush=True)

    # program-level cost analysis (FLOPs + bytes) for roofline bounds
    def cost(compiled):
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return {"gflops": round(ca.get("flops", 0) / 1e9, 3),
                    "hbm_gbytes": round(
                        ca.get("bytes accessed", 0) / 1e9, 4)}
        except Exception as e:
            return {"error": str(e)[:120]}

    sc = scenes[0]
    sc._staged = None
    pr = sc.build_problem()
    plan_cost = cost(plan_one.lower(model, cfg.jit_key(), pr).compile())

    build_q = float(np.median([r["build_queued_ms"] for r in rows]))
    plan_q = float(np.median([r["plan_queued_ms"] for r in rows]))
    sol_rate = 1000.0 / (build_q + plan_q)
    hbm_bound_ms = plan_cost.get("hbm_gbytes", 0) / 819.0 * 1000.0
    mxu_bound_ms = plan_cost.get("gflops", 0) / 197e3 * 1000.0
    bench_pipe = None
    bench_path = os.path.join(os.path.dirname(SUITE), "..", "docs",
                              "bench_r05c_analytic.json")
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            bench_pipe = json.load(f).get("pipelined_plans_per_s")
    report = {
        "what": __doc__.split("\n")[0],
        "device": str(jax.devices()[0]),
        "tunnel_rtt_ms": round(rtt_ms, 3),
        "measured_pipelined_plans_per_s": bench_pipe,
        "per_scene": rows,
        "build_queued_ms_median": round(build_q, 2),
        "plan_queued_ms_median": round(plan_q, 2),
        "speed_of_light_plans_per_s": round(sol_rate, 2),
        "plan_program_cost": plan_cost,
        "plan_roofline_ms": {"hbm_819GBps": round(hbm_bound_ms, 3),
                             "mxu_197Tbf16": round(mxu_bound_ms, 4)},
        "note": ("queued_ms overlaps dispatch with device work, so it "
                 "upper-bounds true device time; serial-queued gap = "
                 "tunnel/host share per call.  Compare "
                 "speed_of_light_plans_per_s with the bench artifact's "
                 "pipelined_plans_per_s: the difference is host staging "
                 "+ result harvest not hidden by the pipeline."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("per_scene",)}), flush=True)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
