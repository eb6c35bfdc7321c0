"""Executable-state snapshot (cfg.exec_snapshot, DESIGN §7 item 10).

Fixes the full-budget un-solving regression (VERDICT r3 item 4,
docs/diag_full_budget_r04.json): a plan that optimizes past an executable
state must not END worse than it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.planner.plan import (_apply_exec_snapshot, _Carry,
                                          _dummy_info,
                                          _exec_snapshot_update, plan_fast)
from omg_planner_tpu.planner.scene import PlanningScene

CFG = OMGConfig(optim_steps=8, extra_smooth_steps=3, goal_set_max_num=10,
                ik_seed_num=2, ik_max_iters=25, learner_interp_steps=8,
                silent=True)


def _carry(cfg, traj, exec_ok=False):
    info = _dummy_info(cfg)
    return _Carry(traj, jnp.asarray(0), None, jnp.asarray(0),
                  jnp.asarray(False), info, jnp.ones(4, bool),
                  jnp.asarray(0), exec_traj=jnp.zeros_like(traj),
                  exec_ok=jnp.asarray(exec_ok), exec_info=info)


def test_update_records_executable_state_only():
    cfg = CFG
    traj = jnp.ones((cfg.timesteps, 9))
    c = _carry(cfg, traj)
    good = _dummy_info(cfg)._replace(execute=jnp.asarray(True),
                                     collide=jnp.asarray(1.0))
    bad = _dummy_info(cfg)._replace(execute=jnp.asarray(False),
                                    collide=jnp.asarray(50.0))
    et, eo, ei = _exec_snapshot_update(cfg, c, traj, bad)
    assert not bool(eo)
    assert float(np.abs(np.asarray(et)).max()) == 0.0  # untouched
    et, eo, ei = _exec_snapshot_update(cfg, c, traj, good)
    assert bool(eo)
    np.testing.assert_array_equal(np.asarray(et), np.asarray(traj))
    assert float(ei.collide) == 1.0


def test_apply_swaps_only_when_final_not_executable():
    cfg = CFG
    traj_fin = jnp.full((cfg.timesteps, 9), 2.0)
    snap = jnp.full((cfg.timesteps, 9), 3.0)
    info_bad = _dummy_info(cfg)._replace(execute=jnp.asarray(False))
    info_good = _dummy_info(cfg)._replace(execute=jnp.asarray(True))
    c = _carry(cfg, traj_fin, exec_ok=True)._replace(
        exec_traj=snap,
        exec_info=_dummy_info(cfg)._replace(execute=jnp.asarray(True),
                                            collide=jnp.asarray(2.0)))
    # final non-executable + snapshot exists -> snapshot returned
    t, i = _apply_exec_snapshot(cfg, c, info_bad)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(snap))
    assert bool(i.execute) and float(i.collide) == 2.0
    # final executable -> untouched
    t, i = _apply_exec_snapshot(cfg, c, info_good)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(traj_fin))
    # no snapshot recorded -> untouched even when final is bad
    c0 = c._replace(exec_ok=jnp.asarray(False))
    t, i = _apply_exec_snapshot(cfg, c0, info_bad)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(traj_fin))
    assert not bool(i.execute)
    # statically off -> passthrough
    t, i = _apply_exec_snapshot(cfg.replace(exec_snapshot=False), c,
                                info_bad)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(traj_fin))


def test_early_terminated_plan_bit_identical_with_snapshot_on_off():
    """Plans that end executable (every early-terminated success) must be
    unaffected by the flag — it only engages on non-executable endings."""
    scene = PlanningScene.synthetic(CFG, scene_id=0, n_obstacles=1)
    pr = scene.build_problem()
    model = scene.model
    r_on = jax.jit(plan_fast, static_argnums=(1,))(model, CFG.jit_key(), pr)
    r_off = jax.jit(plan_fast, static_argnums=(1,))(
        model, CFG.replace(exec_snapshot=False).jit_key(), pr)
    assert bool(r_on.flag) and bool(r_off.flag)
    np.testing.assert_array_equal(np.asarray(r_on.traj),
                                  np.asarray(r_off.traj))
    assert int(r_on.steps_used) == int(r_off.steps_used)
