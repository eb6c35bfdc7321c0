"""bench.py smoke: the driver runs this script on real hardware at round
end — a bit-rotted bench loses the round's numbers, so CI runs one scene
on CPU and validates the JSON contract."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_one_scene_cpu():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--scenes", "1", "--skip-full-budget"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "backend",
                "end_to_end_plans_per_s", "p50_plan_latency_ms",
                "warm_goal_set_build_s", "success_rate", "mean_steps",
                "cascade_success_rate", "cascade_e2e_plans_per_s"):
        assert key in rec, key
    assert rec["metric"] == "plans_per_second_per_chip"
    assert rec["unit"] == "plans/s"
    assert rec["value"] > 0
