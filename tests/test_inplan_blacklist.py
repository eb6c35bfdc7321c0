"""In-plan goal blacklist (cfg.inplan_blacklist_*, planner/plan.py).

The mechanism moves the cascade's measured-effective goal-blacklist
RE-PLAN (planner/cascade.py) inside the one jitted plan program: at check
steps a still-colliding plan masks out the chosen goal's neighborhood and
restarts (fresh spline to the best remaining goal, learner reset,
schedule restart) within the same step budget.
"""

import jax
import jax.numpy as jnp
import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.ops import learner as ol
from omg_planner_tpu.planner.plan import (_blacklist_restart,
                                          _inplan_blacklist, plan_fast)
from omg_planner_tpu.planner.scene import PlanningScene

CFG = OMGConfig(optim_steps=8, extra_smooth_steps=3, goal_set_max_num=12,
                ik_seed_num=3, ik_max_iters=30, learner_interp_steps=8,
                silent=True)


def _dummy_info(collide):
    from omg_planner_tpu.planner.plan import _dummy_info as di
    return di(CFG)._replace(collide=jnp.asarray(float(collide)))


def _problem(cfg):
    scene = PlanningScene.synthetic(cfg, scene_id=0, n_obstacles=1)
    return scene.build_problem()


def test_trigger_masks_neighborhood_and_keeps_set_nonempty():
    cfg = CFG.replace(inplan_blacklist_step=3, inplan_blacklist_every=2)
    pr = _problem(cfg)
    mask0 = pr.goal_set.mask
    # colliding at a check step (step+1 == 3): the chosen goal's 0.5-rad
    # neighborhood goes invalid
    m1, fire = _inplan_blacklist(cfg, pr, mask0, jnp.asarray(0),
                                 _dummy_info(10), jnp.asarray(2))
    assert bool(fire)
    m1, mask0_np = np.asarray(m1), np.asarray(mask0)
    assert not m1[0]
    assert m1.sum() < mask0_np.sum()
    assert m1.sum() >= 1
    # not a check step -> no-op even when colliding
    m2, fire2 = _inplan_blacklist(cfg, pr, mask0, jnp.asarray(0),
                                  _dummy_info(10), jnp.asarray(3))
    assert not bool(fire2) and (np.asarray(m2) == mask0_np).all()
    # check step but not colliding -> no-op
    m3, fire3 = _inplan_blacklist(cfg, pr, mask0, jnp.asarray(0),
                                  _dummy_info(0), jnp.asarray(2))
    assert not bool(fire3) and (np.asarray(m3) == mask0_np).all()


def test_trigger_never_empties_the_goal_set():
    cfg = CFG.replace(inplan_blacklist_step=3, inplan_blacklist_every=2,
                      inplan_blacklist_radius=1e9)  # would kill every goal
    pr = _problem(cfg)
    m, fire = _inplan_blacklist(cfg, pr, pr.goal_set.mask, jnp.asarray(0),
                                _dummy_info(10), jnp.asarray(2))
    assert not bool(fire)
    assert (np.asarray(m) == np.asarray(pr.goal_set.mask)).all()


def test_restart_resplines_to_best_remaining_goal():
    cfg = CFG.replace(inplan_blacklist_step=3)
    pr = _problem(cfg)
    g = pr.goal_set.capacity
    lstate = ol.init_learner_state(pr.goal_set)
    # learner believes goal 0 (blacklisted) then goal 2 are best
    p = jnp.zeros(g).at[0].set(0.6).at[2].set(0.4)
    lstate = lstate._replace(p=p, t=jnp.asarray(5.0))
    mask = pr.goal_set.mask & (jnp.arange(g) != 0)
    traj, goal, rt = _blacklist_restart(cfg, pr, mask, lstate)
    assert int(goal) == 2
    # exactly the plan-init spline to the chosen goal (same boundary
    # convention as init_trajectory / _learner_init)
    from omg_planner_tpu.utils.spline import cubic_interpolate
    np.testing.assert_allclose(
        np.asarray(traj),
        np.asarray(cubic_interpolate(pr.start, pr.goal_set.grasps[2],
                                     cfg.timesteps)), atol=1e-6)
    # learner reset: uniform over the mask, clock back to 0
    assert float(rt.t) == 0.0
    pn = np.asarray(rt.p)
    mn = np.asarray(mask)
    assert np.allclose(pn[mn], 1.0 / mn.sum())
    assert np.allclose(pn[~mn], 0.0)


def test_plan_with_blacklist_on_success_scene_is_a_noop():
    """A plan that succeeds never trips the trigger: same trajectory, and
    the returned goal_mask is the static mask."""
    model = panda.load_panda()
    cfg_on = CFG.replace(inplan_blacklist_step=3, inplan_blacklist_every=2)
    scene = PlanningScene.synthetic(CFG, scene_id=0, n_obstacles=1)
    pr = scene.build_problem()
    base = jax.jit(plan_fast, static_argnums=(1,))(model, CFG.jit_key(), pr)
    on = jax.jit(plan_fast, static_argnums=(1,))(model, cfg_on.jit_key(), pr)
    assert bool(base.flag) and bool(on.flag)
    assert (np.asarray(on.goal_mask) == np.asarray(pr.goal_set.mask)).all()
    np.testing.assert_allclose(np.asarray(on.traj), np.asarray(base.traj),
                               atol=1e-6)
