"""Step-decomposition probe on a hard-suite scene (TPU).

Times each component of a plan step in isolation, chained device-side in a
fori_loop (defeats the remote-tunnel dispatch artifact + DCE by consuming
outputs into the carry).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.models import api as model_api
from omg_planner_tpu.ops import chomp, learner as ol
from omg_planner_tpu.ops.sdf import sdf_potentials
from omg_planner_tpu.planner.scene import PlanningScene
from omg_planner_tpu.planner.plan import _learner_step, _optimize_once

import argparse; _ap = argparse.ArgumentParser(); _ap.add_argument("--backend", default="analytic"); _a,_ = _ap.parse_known_args()
cfg = OMGConfig(silent=True, sdf_analytic=_a.backend == "analytic", sdf_fused=_a.backend == "fused")
hp = cfg.horizon()
model = panda.load_panda(collision_point_num=cfg.collision_point_num)
scene = PlanningScene.from_npz(cfg, "data/suite_v2/scene_5.npz")
problem = scene.build_problem()
jax.block_until_ready(problem)
N = 200

def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / N * 1000
    print(f"{name:28s} {dt:8.3f} ms/iter")
    return dt

traj0 = problem.traj_init

def loop(body):
    def f(traj):
        return jax.lax.fori_loop(0, N, body, traj)
    return f

# 1. full step (learner + optimize)
def full_body(i, traj):
    lstate = ol.init_learner_state(problem.goal_set,
                                   cfg.learner_active_goals)
    lstate, gidx = _learner_step(model, cfg, hp, problem, traj,
                                 jnp.asarray(0, jnp.int32), lstate,
                                 jnp.asarray(0), None)
    new_traj, info = _optimize_once(model, cfg, hp, problem, traj, gidx, i)
    return new_traj
timed("full step", loop(full_body), traj0)

# 2. optimize only (cost eval + projection + limits)
def opt_body(i, traj):
    new_traj, info = _optimize_once(model, cfg, hp, problem, traj,
                                    jnp.asarray(0, jnp.int32), i)
    return new_traj
timed("optimize (eval+update)", loop(opt_body), traj0)

# 3. learner sweep only
def learn_body(i, traj):
    cv = ol.cost_vector(model, problem.scene, problem.cost_params, cfg, hp,
                        traj, problem.goal_set, jnp.asarray(1.0),
                        problem.world_potential)
    return traj + 1e-9 * cv.sum()
timed("learner sweep", loop(learn_body), traj0)

# 4. cost eval only (no update)
def eval_body(i, traj):
    cost, grad, info = chomp.compute_total_loss(
        model, problem.scene, problem.cost_params, cfg, hp, traj,
        problem.start, problem.end, problem.end, 1.0, 1.0)
    return traj + 1e-9 * grad
timed("cost eval (FK+SDF+grad)", loop(eval_body), traj0)

# 5. FK + point positions only
def fk_body(i, traj):
    poses, o, a = model_api.fk_with_joint_info_batch(model, traj)
    x = model_api.point_positions(model, poses)
    return traj + 1e-9 * x.sum()
timed("FK+points", loop(fk_body), traj0)

# 6. FK + points + jacobians
def fkj_body(i, traj):
    poses, o, a = model_api.fk_with_joint_info_batch(model, traj)
    x = model_api.point_positions(model, poses)
    jac = model_api.point_jacobians(model, o, a, x)
    return traj + 1e-9 * (x.sum() + jac.sum())
timed("FK+points+jacobians", loop(fkj_body), traj0)

# 7. SDF potentials only (fixed point count = T*10*P)
poses, o, a = model_api.fk_with_joint_info_batch(model, traj0)
pts = model_api.point_positions(model, poses).reshape(-1, 3)
p = problem.cost_params
def sdf_body(i, carry):
    q = pts + 1e-9 * carry
    pot, grad, col = sdf_potentials(problem.scene, p.inv_poses, q,
                                    p.epsilons, p.padding_scales,
                                    p.clearances, p.disables)
    return carry + 1e-9 * (pot.sum() + grad.sum())
def sdf_loop(c):
    return jax.lax.fori_loop(0, N, sdf_body, c)
t0 = jnp.zeros(3)
timed(f"sdf_potentials ({pts.shape[0]} pts)", sdf_loop, t0)

# 8. projection update + apply + joint-limit
cost, grad0, info = jax.jit(lambda tr: chomp.compute_total_loss(
    model, problem.scene, problem.cost_params, cfg, hp, tr,
    problem.start, problem.end, problem.end, 1.0, 1.0))(traj0)
tail = problem.goal_set.reach_grasps[0]
def upd_body(i, traj):
    up = chomp.goal_set_projection_update(hp, cfg, traj, grad0, tail, 0.1)
    traj = chomp.apply_update(model, cfg, traj, up * 1e-6)
    traj = chomp.handle_joint_limit(hp, cfg, traj, problem.joint_lower,
                                    problem.joint_upper)
    return traj
timed("update+clamp+limits", loop(upd_body), traj0)

# 9. smooth loss only
def smooth_body(i, traj):
    loss, grad = chomp.smooth_loss(hp, cfg, traj, problem.start, problem.end)
    return traj + 1e-9 * grad
timed("smooth loss", loop(smooth_body), traj0)

print("done")

# 10. MD update machinery only (fixed cv)
gsafe = problem.goal_set
cv0 = jnp.abs(jnp.ones(gsafe.capacity) * 0.01)
lstate0 = ol.init_learner_state(gsafe)
def md_body(i, carry):
    st = lstate0._replace(p=carry)
    st = ol.update_goal_dist(cfg, st, cv0 + 1e-9 * carry, gsafe,
                             problem.traj_init[-1])
    return st.p
def md_loop(c):
    return jax.lax.fori_loop(0, N, md_body, c)
timed("MD update (bregman x5)", md_loop, lstate0.p)
print("done2")
