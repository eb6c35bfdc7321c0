"""A/B cfg.learner_active_goals (top-K candidate lanes) and
learner_refresh_every on the pinned hard suite (TPU, production cfg).
The K=32 sweep is the remaining per-step hot spot after sweep thinning;
smaller K shrinks the sweep batch but risks missing the goal the plan
should converge to between refreshes."""
import sys, os, time, json
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import numpy as np
import jax

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.planner.plan import plan_fast
from omg_planner_tpu.planner.scene import PlanningScene
from omg_planner_tpu.parallel.batch import pad_objects

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
base = OMGConfig(silent=True)
model = panda.load_panda(collision_point_num=base.collision_point_num)
scenes = [PlanningScene.from_npz(base, f"data/suite_v2/scene_{i}.npz")
          for i in range(N)]
max_obj = max(len(s.env.objects) for s in scenes)
plan_one = jax.jit(plan_fast, static_argnums=(1,))

probs = []
for s in scenes:
    probs.append(pad_objects(s.build_problem(), max_obj))
    s.env._scene_sdf = None
jax.block_until_ready(probs[-1])
print(f"{N} scenes staged", flush=True)

GRID = [(24, 14), (32, 10), (24, 14), (32, 10), (24, 14), (32, 10)]
for K, refresh in GRID:
    cfg = base.replace(learner_active_goals=K, learner_refresh_every=refresh)
    r = plan_one(model, cfg.jit_key(), probs[0])
    jax.block_until_ready(r.traj)  # compile
    walls, flags, steps = [], [], []
    for p in probs:
        t0 = time.time()
        r = plan_one(model, cfg.jit_key(), p)
        jax.block_until_ready(r.traj)
        walls.append(time.time() - t0)
        flags.append(bool(np.asarray(r.flag)))
        steps.append(int(np.asarray(r.steps_used)))
    print(json.dumps(dict(
        K=K, refresh=refresh,
        plans_per_s=round(len(walls)/sum(walls), 2),
        p50_ms=round(1000*float(np.median(walls)), 1),
        success=round(float(np.mean(flags)), 3),
        mean_steps=round(float(np.mean(steps)), 1))), flush=True)
