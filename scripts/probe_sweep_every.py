"""A/B cfg.learner_sweep_every on the pinned hard suite (TPU):
the candidate sweep is ~80% of an analytic plan step; k>1 skips it on
off-steps (real lax.cond) and holds the previous goal.  Measures
early-term throughput + success with the production config (blacklist,
active lanes, exec snapshot)."""
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

for k in (1, 2, 1, 2):
    cfg = base.replace(learner_sweep_every=k)
    r = plan_one(model, cfg.jit_key(), probs[0])
    jax.block_until_ready(r.traj)  # compile
    walls, flags, steps = [], [], []
    t_all = time.time()
    for p in probs:
        t0 = time.time()
        r = plan_one(model, cfg.jit_key(), p)
        jax.block_until_ready(r.traj)
        walls.append(time.time() - t0)
        flags.append(bool(np.asarray(r.flag)))
        steps.append(int(np.asarray(r.steps_used)))
    print(json.dumps(dict(
        sweep_every=k, plans_per_s=round(len(walls)/sum(walls), 2),
        p50_ms=round(1000*float(np.median(walls)), 1),
        success=round(float(np.mean(flags)), 3),
        mean_steps=round(float(np.mean(steps)), 1))), flush=True)
