"""Analytic backend: vmapped scene-batch throughput vs streamed plans."""
import sys, os, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.planner.scene import PlanningScene
from omg_planner_tpu.planner.plan import plan_fast
from omg_planner_tpu.parallel.batch import stack_problems, pad_objects, plan_batch_vmap, plan_batch

cfg = OMGConfig(silent=True, sdf_analytic=True)
cfg_full = cfg.replace(pre_terminate=False)
model = panda.load_panda(collision_point_num=cfg.collision_point_num)

N = 16
scenes = [PlanningScene.from_npz(cfg, f"data/suite_v2/scene_{i}.npz") for i in range(N)]
probs = []
max_obj = 0
for s in scenes:
    p = s.build_problem()
    probs.append(p)
    max_obj = max(max_obj, p.cost_params.inv_poses.shape[0])
probs = [pad_objects(p, max_obj) for p in probs]
stacked = stack_problems(probs)
jax.block_until_ready(stacked)
print(f"{N} scenes staged, max_obj {max_obj}", flush=True)

for name, fn_cfg in (("early", cfg), ("full", cfg_full)):
    # streamed baseline
    plan_one = jax.jit(lambda pr, c=fn_cfg.jit_key(): plan_fast(model, c, pr))
    for p in probs[:2]: jax.block_until_ready(plan_one(p).traj)  # compile+warm
    t0 = time.time()
    for p in probs: jax.block_until_ready(plan_one(p).traj)
    dt = time.time() - t0
    print(f"[{name}] streamed: {N/dt:.2f} plans/s ({dt/N*1000:.0f} ms/plan)", flush=True)

    bv = jax.jit(lambda ps, c=fn_cfg.jit_key(): plan_batch_vmap(model, c, ps))
    t0 = time.time(); r = bv(stacked); jax.block_until_ready(r.traj)
    print(f"[{name}] vmap compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); r = bv(stacked); jax.block_until_ready(r.traj)
    dt = time.time() - t0
    print(f"[{name}] vmap batch: {N/dt:.2f} plans/s ({dt/N*1000:.1f} ms/plan) "
          f"flags {np.asarray(r.flag).mean():.2f}", flush=True)
