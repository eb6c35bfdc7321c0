"""Multi-chip scaling artifact (VERDICT r4 item 3).

Runs the FULL sharded pipeline (goal-sharded IK build + goal-sharded
plan, scenes on the data axis) over a virtual CPU mesh at
scene_ax in {1,2,4,8} x goal_ax in {1,2}, on a fixed 8-scene workload
from the pinned hard suite, and records:

  * fused-pipeline warm walls + plans/s + scaling efficiency vs (1,1);
  * per-phase walls (goal-set build program vs plan program) at the
    mesh shapes where the goal axis matters;
  * HLO collective statistics (op counts + payload bytes) of the
    compiled programs — hardware-independent evidence of what the mesh
    actually communicates;
  * an analytic ICI-time estimate for the per-step collective at v5e
    link bandwidth, i.e. the expected REAL-hardware story.

Caveat recorded in the artifact: this host has 4 cores, so 8 virtual
devices time-share — wall-clock efficiency beyond 4 devices is
meaningless; the structural numbers (collective bytes, phase split) are
the transferable result.

Usage: python scripts/multichip_scaling.py [--out docs/multichip_scaling_r05.json]
"""

import argparse
import json
import os
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the ambient environment pins the axon TPU regardless of JAX_PLATFORMS
# env; only the config update wins (tests/conftest.py does the same)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIDS = [0, 5, 10, 23, 40, 60, 80, 90]


def build_inputs(cfg, sids, max_obj=None):
    """PipelineInputs for suite scenes (the dryrun's construction)."""
    import jax
    import jax.numpy as jnp

    from omg_planner_tpu.io.assets import DEFAULT_START
    from omg_planner_tpu.parallel.batch import PipelineInput, pad_objects
    from omg_planner_tpu.planner.plan import PlanProblem, init_trajectory
    from omg_planner_tpu.planner.scene import PlanningScene
    from __graft_entry__ import _fake_goal_set

    suite = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "suite_v2")
    scenes = [PlanningScene.from_npz(cfg, os.path.join(
        suite, f"scene_{s}.npz")) for s in sids]
    max_obj = max_obj or max(len(s.env.objects) for s in scenes)
    start = jnp.asarray(DEFAULT_START, jnp.float32)
    placeholder = _fake_goal_set(cfg, np.asarray(DEFAULT_START))
    raw, max_g = [], 0
    for sc in scenes:
        lo, hi = sc.model.soft_limits(cfg.soft_joint_limit_padding)
        pr = PlanProblem(
            start=start, end=placeholder.grasps[0],
            traj_init=init_trajectory(cfg, start, placeholder.grasps[0]),
            goal_set=placeholder, scene=sc.env.scene_sdf(),
            cost_params=sc.env.cost_params(), joint_lower=lo,
            joint_upper=hi, world_potential=sc._world_potential())
        pr = pad_objects(pr, max_obj)
        gw = np.asarray(sc.env.grasp_poses_world(), np.float32)
        tp = np.asarray(sc.env.target.pose_mat[:3, 3], np.float32)
        raw.append((pr, gw, tp))
        max_g = max(max_g, len(gw))
    inps = []
    for pr, gw, tp in raw:
        gw_pad = np.tile(np.eye(4, dtype=np.float32), (max_g, 1, 1))
        gw_pad[:len(gw)] = gw
        valid = np.zeros(max_g, bool)
        valid[:len(gw)] = True
        inps.append(PipelineInput(
            problem=pr, grasps_world=jnp.asarray(gw_pad),
            grasp_valid=jnp.asarray(valid),
            key=jax.random.PRNGKey(0), obj_pos=jnp.asarray(tp)))
    return scenes[0].model, inps


def collective_stats(compiled) -> dict:
    """Collective op counts + payload bytes from optimized HLO."""
    txt = compiled.as_text()
    out = {}
    total_bytes = 0
    for kind in ("all-gather", "all-reduce", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        # lines look like:  %x = f32[2,100,9]{...} all-gather(...)
        pat = re.compile(
            r"= ([a-z0-9]+)\[([0-9,]*)\][^ ]* " + kind + r"[ (]")
        n, b = 0, 0
        for m in pat.finditer(txt):
            n += 1
            dtype, shape = m.group(1), m.group(2)
            elems = 1
            for d in shape.split(","):
                if d:
                    elems *= int(d)
            width = {"f32": 4, "s32": 4, "u32": 4, "pred": 1,
                     "bf16": 2, "f16": 2, "f64": 8, "s8": 1,
                     "u8": 1}.get(dtype, 4)
            b += elems * width
        if n:
            out[kind] = {"count": n, "bytes": b}
            total_bytes += b
    out["total_bytes"] = total_bytes
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/multichip_scaling_r05.json")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.parallel.batch import (
        _plan_goal_sharded, make_sharded_pipeline, solve_goal_set_sharded)
    from omg_planner_tpu.planner import goal_set as gs_mod
    from omg_planner_tpu.planner.plan import init_trajectory

    cfg = OMGConfig(silent=True)
    model, inps = build_inputs(cfg, SIDS)
    devices = jax.devices()
    assert len(devices) >= 8, devices
    report = {"what": __doc__.split("\n")[0],
              "workload": {"suite": "data/suite_v2", "scenes": SIDS,
                           "cfg": "production default"},
              "host_cores": os.cpu_count(),
              "caveat": ("virtual CPU mesh on a 4-core host: walls "
                         "time-share beyond 4 devices; collective bytes "
                         "and phase split are the transferable result"),
              "grid": []}

    def stack(rows):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *rows)

    grid = [(1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (2, 2), (4, 2)]
    base_rate = None
    for scene_ax, goal_ax in grid:
        n_dev = scene_ax * goal_ax
        mesh = Mesh(np.array(devices[:n_dev]).reshape(scene_ax, goal_ax),
                    ("scene", "goal"))
        fn = make_sharded_pipeline(mesh, model, cfg)
        # waves of scene_ax over the fixed 8-scene workload
        waves = [stack(inps[lo:lo + scene_ax])
                 for lo in range(0, len(inps), scene_ax)]
        t0 = time.time()
        for w in waves:
            jax.block_until_ready(fn(w).traj)
        compile_s = time.time() - t0
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            for w in waves:
                jax.block_until_ready(fn(w).traj)
            walls.append(time.time() - t0)
        wall = float(np.median(walls))
        rate = len(inps) / wall
        if base_rate is None:
            base_rate = rate
        row = {"scene_ax": scene_ax, "goal_ax": goal_ax,
               "devices": n_dev, "warm_wall_s": round(wall, 3),
               "plans_per_s": round(rate, 3),
               "speedup_vs_1x1": round(rate / base_rate, 2),
               "efficiency": round(rate / base_rate / n_dev, 3),
               "first_pass_s": round(compile_s, 1)}
        print(json.dumps(row), flush=True)
        report["grid"].append(row)

    # per-phase walls + collective stats at the goal-axis-relevant
    # shapes.  The goal axis does its real work in the BUILD phase (the
    # sharded IK chain); the plan phase runs the gathered goal set
    # replicated (VERDICT r4 weak #3) — so build is measured at both
    # goal_ax values, plan at goal_ax=1 (its output shapes at
    # goal_ax=2 depend on axis size, which eval_shape outside the mesh
    # cannot bind; its per-step collective is a [G] float all_gather,
    # estimated analytically below).
    report["phases"] = []
    for scene_ax, goal_ax in [(4, 1), (4, 2)]:
        n_dev = scene_ax * goal_ax
        mesh = Mesh(np.array(devices[:n_dev]).reshape(scene_ax, goal_ax),
                    ("scene", "goal"))

        import functools
        solve = functools.partial(solve_goal_set_sharded, axis="goal")

        def one_build(inp):
            pr = inp.problem
            gset = gs_mod.build_goal_set(
                model, cfg, pr.scene, pr.cost_params, inp.grasps_world,
                inp.grasp_valid, pr.start, inp.key, solve_fn=solve,
                obj_pos=inp.obj_pos)
            end = gset.grasps[gs_mod.goal_idx_policy(cfg, gset, pr.start)]
            return pr._replace(
                goal_set=gset, end=end,
                traj_init=init_trajectory(cfg, pr.start, end))

        def one_plan(pr):
            return _plan_goal_sharded(model, cfg, pr, "goal", True)

        def local_build(inps_):
            return jax.lax.map(one_build, inps_)

        def local_plan(prs):
            return jax.lax.map(one_plan, prs)

        w0 = stack(inps[:scene_ax])
        in_specs = jax.tree.map(lambda _: P("scene"), w0)

        # output SHAPES via the replicated (unsharded) build — identical
        # to the sharded build's (the sharded IK chain all_gathers back
        # to the full survivor set); eval_shape cannot bind mesh axes
        def one_build_shapes(inp):
            pr = inp.problem
            gset = gs_mod.build_goal_set(
                model, cfg, pr.scene, pr.cost_params, inp.grasps_world,
                inp.grasp_valid, pr.start, inp.key, obj_pos=inp.obj_pos)
            end = gset.grasps[gs_mod.goal_idx_policy(cfg, gset, pr.start)]
            return pr._replace(
                goal_set=gset, end=end,
                traj_init=init_trajectory(cfg, pr.start, end))

        pr_example = jax.eval_shape(
            lambda b: jax.lax.map(one_build_shapes, b), w0)
        pr_specs = jax.tree.map(lambda _: P("scene"), pr_example)
        build_j = jax.jit(jax.shard_map(
            local_build, mesh=mesh, in_specs=(in_specs,),
            out_specs=pr_specs, check_vma=False))

        prs = build_j(w0)
        jax.block_until_ready(prs.goal_set.grasps)

        def timed(f, x, leaf):
            ws = []
            for _ in range(args.reps):
                t0 = time.time()
                jax.block_until_ready(leaf(f(x)))
                ws.append(time.time() - t0)
            return float(np.median(ws))

        row = {
            "scene_ax": scene_ax, "goal_ax": goal_ax,
            "build_wall_s": round(
                timed(build_j, w0, lambda r: r.goal_set.grasps), 3),
            "build_collectives": collective_stats(
                build_j.lower(w0).compile()),
        }
        if goal_ax == 1:
            from omg_planner_tpu.planner.plan import plan_fast

            out_example = jax.eval_shape(
                lambda prs_: jax.lax.map(
                    lambda p: plan_fast(model, cfg, p), prs_), pr_example)
            out_specs = jax.tree.map(lambda _: P("scene"), out_example)
            plan_j = jax.jit(jax.shard_map(
                local_plan, mesh=mesh, in_specs=(pr_specs,),
                out_specs=out_specs, check_vma=False))
            jax.block_until_ready(plan_j(prs).traj)
            row["plan_wall_s"] = round(
                timed(plan_j, prs, lambda r: r.traj), 3)
            row["plan_collectives"] = collective_stats(
                plan_j.lower(prs).compile())
        print(json.dumps(row), flush=True)
        report["phases"].append(row)

    # expected real-ICI story.  The plan phase's only per-step collective
    # under the goal axis is the cost-vector all_gather: [G] f32 per
    # participating step (parallel/batch.py::_plan_goal_sharded) — and at
    # the production active-lane default it does not run at all (the
    # sweep is replicated; the goal axis parallelizes the build).
    g = cfg.goal_set_max_num
    steps = cfg.optim_steps + cfg.extra_smooth_steps
    per_plan_bytes = 4 * g * steps
    report["expected_ici"] = {
        "plan_per_step_collective_bytes": 4 * g,
        "plan_program_collective_bytes_upper": per_plan_bytes,
        "ici_bw_assumed_GBps": 45,
        "est_ici_time_s_per_plan": round(per_plan_bytes / 45e9, 9),
        "note": ("collective payloads are sub-KB; at ICI bandwidth the "
                 "communication per plan is <1 us of bytes — the real "
                 "cost is per-step collective LAUNCH latency (~1-5 us x "
                 "70 steps ~ 0.1-0.4 ms) against a ~5.8 ms/plan device "
                 "budget.  At the production active-lane default the "
                 "plan loop is collective-free (replicated) and the "
                 "goal axis accelerates only the IK build — the "
                 "measured-negative basis for NOT sharding the K=32 "
                 "active-lane sweep: its shardable work is <0.1 "
                 "ms/step (device_budget_r05: 0.27 ms/step total, "
                 "0.087 without the learner) while the unconditional "
                 "compute-then-mask it would force on the 20 smoothing "
                 "steps plus per-step launch latency cost the same "
                 "order as the savings"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
