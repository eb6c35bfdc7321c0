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

    # per-phase walls + collective stats at the goal-axis-relevant shapes
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
        pr_example = jax.eval_shape(local_build, w0)
        pr_specs = jax.tree.map(lambda _: P("scene"), pr_example)
        build_j = jax.jit(jax.shard_map(
            local_build, mesh=mesh, in_specs=(in_specs,),
            out_specs=pr_specs, check_vma=False))
        out_example = jax.eval_shape(local_plan, pr_example)
        out_specs = jax.tree.map(lambda _: P("scene"), out_example)
        plan_j = jax.jit(jax.shard_map(
            local_plan, mesh=mesh, in_specs=(pr_specs,),
            out_specs=out_specs, check_vma=False))

        prs = build_j(w0)
        jax.block_until_ready(prs.goal_set.grasps)
        res = plan_j(prs)
        jax.block_until_ready(res.traj)

        def timed(f, x, leaf):
            ws = []
            for _ in range(args.reps):
                t0 = time.time()
                jax.block_until_ready(leaf(f(x)))
                ws.append(time.time() - t0)
            return float(np.median(ws))

        t_build = timed(build_j, w0, lambda r: r.goal_set.grasps)
        t_plan = timed(plan_j, prs, lambda r: r.traj)
        row = {
            "scene_ax": scene_ax, "goal_ax": goal_ax,
            "build_wall_s": round(t_build, 3),
            "plan_wall_s": round(t_plan, 3),
            "build_collectives": collective_stats(
                build_j.lower(w0).compile()),
            "plan_collectives": collective_stats(
                plan_j.lower(prs).compile()),
        }
        print(json.dumps(row), flush=True)
        report["phases"].append(row)

    # expected real-ICI story: per-step plan collective payload at v5e
    # link bandwidth (~45 GB/s effective per direction, one hop)
    g2 = next(p for p in report["phases"] if p["goal_ax"] == 2)
    per_plan_bytes = g2["plan_collectives"].get("total_bytes", 0)
    ici_s = per_plan_bytes / 45e9
    report["expected_ici"] = {
        "plan_program_collective_bytes": per_plan_bytes,
        "ici_bw_assumed_GBps": 45,
        "est_ici_time_s_per_plan": round(ici_s, 6),
        "note": ("collective payloads are KB-scale; at ICI bandwidth "
                 "the communication time per plan is microseconds — "
                 "the mesh's non-embarrassingly-parallel term is "
                 "latency (hops x ~1us per step collective), still "
                 "<<1 ms against a ~7 ms/plan device budget"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
