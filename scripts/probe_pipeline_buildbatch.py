"""Warm A/B: plan_pipelined with and without vmapped build waves."""
import sys, os, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import numpy as np
import jax

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.planner.scene import PlanningScene
from omg_planner_tpu.planner.runner import plan_pipelined

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
cfg = OMGConfig(silent=True)
model = panda.load_panda(collision_point_num=cfg.collision_point_num)
scenes = [PlanningScene.from_npz(cfg, f"data/suite_v2/scene_{i}.npz")
          for i in range(N)]
max_obj = max(len(s.env.objects) for s in scenes)

for name, bb in (("bb4-cold", 4), ("bb4-warm", 4), ("bb0", 0), ("bb4-warm2", 4), ("bb0-2", 0)):
    t0 = time.time()
    k = 0
    for _ in plan_pipelined(list(enumerate(scenes)), cfg, model=model,
                            depth=8, max_obj=max_obj, build_batch=bb):
        k += 1
    dt = time.time() - t0
    print(f"[{name}] {k/dt:.2f} plans/s e2e ({dt:.1f}s)", flush=True)
