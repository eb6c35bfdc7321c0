"""Robustness: NaN-safety and degenerate inputs through the core ops."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.models import panda
from omg_planner_tpu.ops import chomp
from omg_planner_tpu.ops.sdf import SignedDensityField, combine_sdfs
from omg_planner_tpu.parallel.multihost import (host_local_batch,
                                                my_scene_ids)


def test_fuzz_collision_loss_no_nans():
    """Random (including extreme) configurations must never produce NaNs in
    cost or gradient — the functional gradient divides by velocity norms
    and the trajectory can be momentarily degenerate."""
    cfg = OMGConfig()
    hp = cfg.horizon()
    model = panda.load_panda()
    f = SignedDensityField.from_analytic("sphere", [0.08], delta=0.01)
    f.penalize_inside(5.0)
    scene = combine_sdfs([f])
    pose = np.eye(4); pose[:3, 3] = [0.4, 0.0, 0.5]
    params = chomp.CostParams(
        inv_poses=jnp.asarray(np.linalg.inv(pose)[None], jnp.float32),
        epsilons=jnp.asarray([0.2]), padding_scales=jnp.asarray([1.0]),
        clearances=jnp.asarray([0.01]), disables=jnp.asarray([0.0]),
        target_idx=jnp.asarray(0))
    rng = np.random.default_rng(17)
    for trial in range(3):
        # constant trajectory (zero velocity!) and wild values
        if trial == 0:
            xi = jnp.tile(jnp.asarray(rng.normal(size=9), jnp.float32),
                          (30, 1))
        else:
            xi = jnp.asarray(rng.normal(scale=2.0, size=(30, 9)), jnp.float32)
        start = xi[0]
        end = xi[-1]
        cost, grad, collide = chomp.compute_collision_loss(
            model, scene, params, cfg, hp, xi, start, end)
        assert np.isfinite(np.asarray(cost)).all(), trial
        assert np.isfinite(np.asarray(grad)).all(), trial


def test_empty_goal_capacity_learner():
    """A fully-invalid goal set must not NaN the learner init."""
    from omg_planner_tpu.ops import learner as ol
    from omg_planner_tpu.ops.chomp import GoalSet
    gs = GoalSet(grasps=jnp.zeros((8, 9)),
                 reach_grasps=jnp.zeros((8, 5, 9)),
                 mask=jnp.zeros(8, bool), potentials=jnp.zeros(8))
    state = ol.init_learner_state(gs)
    assert np.isfinite(np.asarray(state.p)).all()


def test_multihost_single_process_paths():
    assert my_scene_ids(10) == list(range(10))  # one process owns all
    import __graft_entry__ as ge
    from jax.sharding import Mesh
    cfg = OMGConfig(optim_steps=2, extra_smooth_steps=1, timesteps=8,
                    goal_set_max_num=4, ik_seed_num=2, ik_max_iters=10,
                    learner_interp_steps=4)
    model, pr = ge._tiny_problem(cfg)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("scene", "goal"))
    batch = host_local_batch(mesh, [pr, pr])
    assert batch.start.shape[0] == 2


def test_single_object_scene():
    """Planning works with exactly one object (the target, no table)."""
    from omg_planner_tpu.io.assets import make_primitive, pose_at
    from omg_planner_tpu.planner.scene import Env, PlanningScene
    cfg = OMGConfig(optim_steps=3, extra_smooth_steps=1, goal_set_max_num=4,
                    ik_seed_num=2, ik_max_iters=20, learner_interp_steps=4,
                    silent=True)
    env = Env(cfg)
    env.add_object(make_primitive("ball", "sphere", [0.03],
                                  pose_at([0.5, 0.0, 0.4]), target=True))
    env.set_target("ball")
    scene = PlanningScene(cfg, env)
    res = scene.step()
    assert res is None or np.isfinite(res.traj).all()


def test_retry_transient_retries_infra_and_raises_rest(monkeypatch):
    from omg_planner_tpu.utils.timing import retry_transient

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: TPU device error")
        return "ok"

    logs = []
    out = retry_transient(flaky, "unit", attempts=4, wait_s=0.01,
                          log=logs.append)
    assert out == "ok" and calls["n"] == 3 and len(logs) == 2

    def broken():
        raise ValueError("shape mismatch")

    try:
        retry_transient(broken, "unit", attempts=4, wait_s=0.01,
                        log=logs.append)
    except ValueError:
        pass
    else:
        raise AssertionError("non-transient error must re-raise")

    def always_down():
        raise RuntimeError("ABORTED: chip gone")

    try:
        retry_transient(always_down, "unit", attempts=2, wait_s=0.01,
                        log=logs.append)
    except RuntimeError:
        pass
    else:
        raise AssertionError("exhausted attempts must re-raise")
