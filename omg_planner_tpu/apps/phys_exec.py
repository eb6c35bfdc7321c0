"""Plan-and-execute over a scene suite in the native physics stepper.

The reference's evaluation loop plans each scene and EXECUTES the plan in
PyBullet, scoring the binary lift reward (``bullet/panda_scene.py``
reset/step/retract/``_reward``; driven by ``omg/core.py:869-885``).  This
app is that loop on the native stepper (:mod:`omg_planner_tpu.physics`):
plan with the production config, replay + close + retract in-sim, score.

Usage::

    python -m omg_planner_tpu.apps.phys_exec --scenes 30 \
        --out docs/phys_exec.json [--cpu]

Writes a JSON report: per-scene plan verdict + execution report, plus
aggregates (plan success rate, execution reward on planned successes,
end-to-end reward).  Scenes whose plan FAILED are not executed (the
reference only retracts after a declared grasp) and count 0.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SUITE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "..", "data", "suite_v2")


def _write_replay(scene, trace, args):
    """Render the rollout trace (robot + simulated target) to a video."""
    from omg_planner_tpu.physics.executor import _body_spec_for
    from omg_planner_tpu.viz.render import render_execution, write_video

    env = scene.env
    spec = _body_spec_for(env.target, args.density, scene.cfg)
    frames = render_execution(
        scene.model, env.objects, env.target_idx, trace["configs"],
        np.asarray(trace["x"]), np.asarray(trace["q"]),
        com=np.asarray(spec.com))
    write_video(frames, args.video)
    print(f"replay -> {args.video}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default=os.path.abspath(SUITE))
    ap.add_argument("--scenes", type=int, default=30)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--density", type=float, default=300.0)
    ap.add_argument("--pinch", type=float, default=0.0,
                    help="finger motor stall force override, N (0 = "
                         "model default; the reference's PyBullet "
                         "harness drives fingers at 250 N, "
                         "panda_gripper.py:43)")
    ap.add_argument("--cascade", action="store_true",
                    help="recover plan failures with the production "
                         "escalation cascade (goal-blacklist retries + "
                         "exact-grid fallback) before executing")
    ap.add_argument("--exec-retries", type=int, default=0,
                    help="execution-verified planning "
                         "(planner/exec_verify.py): on a failed simulated "
                         "lift, blacklist the goal's neighborhood and "
                         "re-plan, up to N times (0 = r4 behavior: "
                         "execute the first plan once)")
    ap.add_argument("--pipeline", action="store_true",
                    help="co-schedule the devices: plans stream through "
                         "the TPU pipelined executor while a worker "
                         "thread executes rollouts on the host CPU; "
                         "exec-retries are resolved serially afterwards "
                         "for the (few) failing scenes")
    ap.add_argument("--video", default="",
                    help="write an execution-replay video (robot + "
                         "simulated target pose) of the first executed "
                         "scene to this path")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # rollouts run host-side by default (6x faster than the tunnel);
        # planning stays on the ambient device
        from omg_planner_tpu.physics import ensure_cpu_backend
        ensure_cpu_backend()

    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.planner.scene import PlanningScene

    cfg = OMGConfig(silent=True)          # production defaults
    pad = 0
    scenes = []
    for sid in range(args.scenes):
        path = os.path.join(args.suite, f"scene_{sid}.npz")
        scene = PlanningScene.from_npz(cfg, path)
        scenes.append((sid, scene))
        pad = max(pad, len(scene.env.objects) - 1)

    t_all = time.time()
    if args.video and (args.pipeline or args.exec_retries > 0):
        print("note: --video records only in the serial "
              "non-exec-retries mode; flag ignored for this run",
              flush=True)
    if args.pipeline:
        rows = _run_pipelined(args, cfg, scenes, pad)
    else:
        rows = _run_serial(args, cfg, scenes, pad)

    planned = [r for r in rows if r.get("plan_flag")]
    executed = [r for r in rows if r.get("executed")]
    report = {
        "what": ("plan (production cfg) + native physics execution + "
                 "lift reward over the pinned hard suite"),
        "n_scenes": len(rows),
        "n_exec_skipped": len(planned) - len(executed),
        "plan_success_rate": round(len(planned) / max(len(rows), 1), 3),
        "exec_reward_rate_on_planned": round(
            sum(r["reward"] for r in executed) / max(len(planned), 1), 3),
        "exec_reward_rate_on_executed": round(
            sum(r["reward"] for r in executed) / max(len(executed), 1), 3),
        "end_to_end_reward_rate": round(
            sum(r.get("reward", 0) for r in rows) / max(len(rows), 1), 3),
        "mean_lifted_m_on_success": round(float(np.mean(
            [r["lifted_m"] for r in executed if r["reward"]] or [0.0])), 3),
        "wall_s": round(time.time() - t_all, 1),
        "pipelined": bool(args.pipeline),
        "scenes": rows,
    }
    line = json.dumps({k: v for k, v in report.items() if k != "scenes"})
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"-> {args.out}", flush=True)


def _run_pipelined(args, cfg, scenes, pad):
    """TPU/CPU co-schedule: plans stream through ``plan_pipelined`` (TPU)
    while two worker threads replay rollouts on the host CPU (XLA CPU
    executes concurrently across threads: 1.96 -> 3.68 exec/s measured;
    3 workers plateau on this 4-core host) — the two devices work
    concurrently instead of strictly alternating (the serial loop pays
    ~1 s plan + ~1.5 s rollout per scene back-to-back).  Failures are
    resolved serially afterwards: failed rollouts re-plan
    execution-verified (seeded with the already-observed failure, so
    the known-bad rollout is not repeated), and with ``--cascade``
    plan-level failures get the backend escalation cascade too — the
    same semantics as the serial path."""
    import concurrent.futures as cf

    from omg_planner_tpu.models import panda
    from omg_planner_tpu.physics import NoMassModelError, execute_plan
    from omg_planner_tpu.planner.runner import plan_pipelined

    model = panda.load_panda(collision_point_num=cfg.collision_point_num)
    params = _pinch_params(args)
    rows_by_sid = {}
    results_by_sid = {}
    reps_by_sid = {}

    def run_exec(sid, scene, traj):
        try:
            rep = execute_plan(scene, traj, density=args.density,
                               pad_statics=pad, params=params)
            return sid, rep, None
        except NoMassModelError as e:
            return sid, None, str(e)

    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        futs = []
        for sid, sc, res, dt in plan_pipelined(
                scenes, cfg, model=model, depth=8):
            row = {"scene": sid, "plan_wall_s": round(dt, 2)}
            rows_by_sid[sid] = row
            if res is None or not bool(np.asarray(res.flag)):
                row.update(plan_flag=False, reward=0, executed=False)
                continue
            row["plan_flag"] = True
            results_by_sid[sid] = res
            futs.append(pool.submit(run_exec, sid, sc,
                                    np.asarray(res.traj)))
        for fut in cf.as_completed(futs):
            sid, rep, skip = fut.result()
            row = rows_by_sid[sid]
            if rep is None:
                row.update(executed=False, reward=0, skip_reason=skip)
            else:
                reps_by_sid[sid] = rep
                row.update(executed=True, **rep.to_dict())
            print(f"scene {sid}: reward {row['reward']}", flush=True)

    if args.exec_retries > 0 or args.cascade:
        from omg_planner_tpu.planner.exec_verify import \
            plan_execute_verified

        by_sid = dict(scenes)
        for sid, row in rows_by_sid.items():
            plan_failed = not row.get("plan_flag")
            exec_failed = bool(row.get("executed")) and row["reward"] == 0
            if plan_failed and not args.cascade:
                continue
            if not plan_failed and not exec_failed:
                continue
            if exec_failed and args.exec_retries == 0:
                continue
            seed = None
            if exec_failed and sid in results_by_sid:
                seed = (results_by_sid[sid], reps_by_sid.get(sid))
            out = plan_execute_verified(
                by_sid[sid], exec_retries=args.exec_retries,
                cascade=args.cascade, seed=seed, density=args.density,
                pad_statics=pad, params=params)
            if out is None or out.report is None:
                continue           # keep the recorded failure
            row.update(plan_flag=bool(np.asarray(out.result.flag)),
                       executed=True,
                       exec_attempts=out.exec_attempts
                       + (1 if seed else 0),
                       verified=out.verified, **out.report.to_dict())
            print(f"scene {sid}: retried -> reward {row['reward']}",
                  flush=True)
    return [rows_by_sid[sid] for sid, _ in scenes]


def _pinch_params(args):
    if args.pinch <= 0:
        return None
    import jax.numpy as jnp

    from omg_planner_tpu.physics import rigid
    return rigid.default_params()._replace(
        pinch_force=jnp.asarray(args.pinch, jnp.float32))


def _run_serial(args, cfg, scenes, pad):
    import time

    from omg_planner_tpu.physics import NoMassModelError, execute_plan

    params = _pinch_params(args)
    rows = []
    for sid, scene in scenes:
        t0 = time.time()
        if args.exec_retries > 0:
            from omg_planner_tpu.planner.exec_verify import \
                plan_execute_verified

            out = plan_execute_verified(
                scene, exec_retries=args.exec_retries,
                cascade=args.cascade, density=args.density,
                pad_statics=pad, params=params)
            wall = round(time.time() - t0, 2)
            row = {"scene": sid, "plan_wall_s": wall}
            if out is None or not bool(np.asarray(out.result.flag)):
                row.update(plan_flag=False, reward=0, executed=False)
                print(f"scene {sid}: PLAN FAIL ({wall:.1f}s)", flush=True)
            elif out.report is None:
                row.update(plan_flag=True, executed=False, reward=0,
                           skip_reason="no mass model")
            else:
                row.update(plan_flag=True, executed=True,
                           exec_attempts=out.exec_attempts,
                           verified=out.verified, **out.report.to_dict())
                print(f"scene {sid}: plan ok -> reward {row['reward']} "
                      f"({out.exec_attempts} exec attempts, {wall:.1f}s)",
                      flush=True)
            rows.append(row)
            continue
        res = scene.step(fast=True)
        if args.cascade and (res is None or not bool(res.flag)):
            from omg_planner_tpu.planner.cascade import plan_cascade
            cr = plan_cascade(scene)
            if cr is not None:
                res = cr.result
        t_plan = time.time() - t0
        row = {"scene": sid, "plan_wall_s": round(t_plan, 2)}
        if res is None or not bool(res.flag):
            row.update(plan_flag=False, reward=0, executed=False)
            rows.append(row)
            print(f"scene {sid}: PLAN FAIL ({t_plan:.1f}s)", flush=True)
            continue
        row["plan_flag"] = True
        t0 = time.time()
        want_video = bool(args.video) and not any(
            r.get("executed") for r in rows)
        try:
            out = execute_plan(scene, np.asarray(res.traj),
                               density=args.density, pad_statics=pad,
                               params=params, return_trace=want_video)
            rep, trace = out if want_video else (out, None)
            row.update(executed=True, exec_wall_s=round(time.time() - t0, 2),
                       **rep.to_dict())
            if trace is not None:
                _write_replay(scene, trace, args)
        except NoMassModelError as e:     # no mass model for this target
            row.update(executed=False, reward=0, skip_reason=str(e))
        rows.append(row)
        print(f"scene {sid}: plan ok ({t_plan:.1f}s) -> reward "
              f"{row['reward']} lifted {row.get('lifted_m', 0):.3f} "
              f"({row.get('exec_wall_s', 0):.1f}s)", flush=True)
    return rows


if __name__ == "__main__":
    main()
