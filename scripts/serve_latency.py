"""Serve latency artifact (VERDICT r4 item 7).

Measures warm per-request latency of the /plan handler in-process
(the HTTP layer adds ~0.1 ms on localhost; the handler IS the cost):

  * ``repeat``: the same body over and over — after the round-5
    request-keyed scene cache, staging collapses to a dict hit and the
    request pays plan + fetch only;
  * ``fresh``: every request a different start configuration — staging
    (goal-set build dispatch) runs each time; this is the cold-scene
    request cost the bench's serial_e2e tracks.

Writes p50/p90/p99 for both, plus the stage/plan split from the
handler's own timings.

Usage: python scripts/serve_latency.py [--reps 40] [--cpu]
       [--out docs/serve_latency_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def body_for(start=None):
    objs = [
        {"name": "table", "kind": "box", "extents": [0.9, 1.2, 0.04],
         "pose": np.diag([1.0, 1, 1, 1]).flatten().tolist()},
        {"name": "mug", "kind": "cylinder", "extents": [0.04, 0.04, 0.06],
         "pose": [1, 0, 0, 0.55, 0, 1, 0, 0.05, 0, 0, 1, 0.1,
                  0, 0, 0, 1], "target": True},
        {"name": "jar", "kind": "cylinder", "extents": [0.05, 0.05, 0.1],
         "pose": [1, 0, 0, 0.45, 0, 1, 0, -0.18, 0, 0, 1, 0.14,
                  0, 0, 0, 1]},
    ]
    # table top surface at z=0 via pose z offset
    objs[0]["pose"][11] = -0.02
    b = {"objects": objs}
    if start is not None:
        b["start"] = list(map(float, start))
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/serve_latency_r05.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from omg_planner_tpu.apps.serve import plan_request
    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.io.assets import DEFAULT_START
    from omg_planner_tpu.utils.timing import retry_transient

    cfg = OMGConfig(silent=True)

    def once(body):
        t0 = time.perf_counter()
        code, payload = plan_request(body, cfg)
        wall = 1000.0 * (time.perf_counter() - t0)
        assert code == 200, (code, payload)
        return wall, payload["timings"]

    # warm compiles (both fixed-start and varied-start request shapes)
    retry_transient(lambda: once(body_for()), "warm fixed")
    starts = [np.asarray(DEFAULT_START) + 0.02 * np.sin(k + np.arange(9))
              for k in range(args.reps)]
    retry_transient(lambda: once(body_for(starts[0])), "warm varied")

    def run(kind, bodies):
        walls, stages, plans = [], [], []
        for b in bodies:
            w, t = retry_transient(lambda: once(b), f"{kind} request")
            walls.append(w)
            stages.append(1000.0 * t["stage_s"])
            plans.append(1000.0 * t["plan_s"])
        return {
            "p50_ms": round(float(np.percentile(walls, 50)), 1),
            "p90_ms": round(float(np.percentile(walls, 90)), 1),
            "p99_ms": round(float(np.percentile(walls, 99)), 1),
            "stage_p50_ms": round(float(np.percentile(stages, 50)), 1),
            "plan_p50_ms": round(float(np.percentile(plans, 50)), 1),
        }

    rep = run("repeat", [body_for() for _ in range(args.reps)])
    fresh = run("fresh", [body_for(s) for s in starts])
    out = {"what": __doc__.split("\n")[0],
           "device": str(jax.devices()[0]),
           "reps": args.reps,
           "repeat_request": rep,
           "fresh_start_request": fresh}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
