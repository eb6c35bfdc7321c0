"""Online-learner tests: Bregman projection, algorithms, goal updates."""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.ops import learner as ol
from omg_planner_tpu.ops.chomp import GoalSet


def _goal_set(g=10, valid=10, seed=0):
    rng = np.random.default_rng(seed)
    grasps = rng.normal(size=(g, 9)).astype(np.float32)
    mask = np.zeros(g, bool)
    mask[:valid] = True
    return GoalSet(
        grasps=jnp.asarray(grasps),
        reach_grasps=jnp.asarray(np.repeat(grasps[:, None], 5, 1)),
        mask=jnp.asarray(mask),
        potentials=jnp.zeros(g))


def test_bregman_projection_is_distribution():
    g = 10
    gs = _goal_set(g)
    rng = np.random.default_rng(1)
    x = np.ones(g) / g
    v = rng.uniform(0, 1, g).astype(np.float32)
    delta = np.ones(g, np.float32) / (4 * g + 1)
    w = np.ones(g, np.float32)
    y = ol.bregman_projection(
        jnp.asarray(x, jnp.float32), jnp.asarray(v), jnp.asarray(delta),
        jnp.asarray(w), gs.mask)
    y = np.array(y)
    assert np.all(y >= -1e-6)
    assert abs(y.sum() - 1.0) < 1e-4
    # low-cost goals should get more mass than high-cost ones
    assert y[np.argmin(v)] > y[np.argmax(v)]


def test_bregman_respects_mask():
    gs = _goal_set(10, valid=6)
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.uniform(0, 1, 10), jnp.float32)
    delta = jnp.asarray(np.ones(10) / 41, jnp.float32)
    y = np.array(ol.bregman_projection(
        jnp.ones(10) / 10, v, delta, jnp.ones(10), gs.mask))
    assert np.all(y[6:] < 1e-6)


def test_ftl_ftc_exp_md_select_cheap_goal():
    cfg0 = OMGConfig()
    gs = _goal_set(8)
    cv = jnp.asarray([5.0, 0.1, 4.0, 3.0, 2.0, 6.0, 7.0, 8.0])
    for alg in ("FTL", "FTC", "Exp", "MD"):
        cfg = cfg0.replace(ol_alg=alg)
        state = ol.init_learner_state(gs)
        for _ in range(3):
            state = ol.update_goal_dist(cfg, state, cv, gs, gs.grasps[0])
        p = np.array(state.p)
        assert np.argmax(p) == 1, (alg, p)


def test_proj_selects_closest():
    cfg = OMGConfig(ol_alg="Proj")
    gs = _goal_set(8)
    state = ol.init_learner_state(gs)
    end = gs.grasps[3] + 0.01
    state = ol.update_goal_dist(cfg, state, jnp.zeros(8), gs, end)
    assert int(np.argmax(np.array(state.p))) == 3


def test_md_distribution_concentrates_over_time():
    cfg = OMGConfig(ol_alg="MD")
    gs = _goal_set(12)
    rng = np.random.default_rng(5)
    cv = jnp.asarray(
        np.concatenate([[0.01], rng.uniform(0.5, 1.0, 11)]), jnp.float32)
    state = ol.init_learner_state(gs)
    entropies = []
    for _ in range(8):
        state = ol.update_goal_dist(cfg, state, cv, gs, gs.grasps[0])
        p = np.clip(np.array(state.p), 1e-12, 1)
        entropies.append(-(p * np.log(p)).sum())
    assert entropies[-1] < entropies[0]
    assert int(np.argmax(np.array(state.p))) == 0


def test_md_batched_experts_match_sequential_reference_loop():
    """The vmapped-expert MD update must equal the reference's sequential
    expert loop (``online_learner.py:224-235``) — including the q
    recurrence's partially-updated cost snapshots."""
    cfg = OMGConfig(ol_alg="MD")
    gs = _goal_set(12, valid=9, seed=3)
    rng = np.random.default_rng(7)
    state = ol.init_learner_state(gs)
    # advance a couple of steps so experts_costs/q are non-trivial
    for step in range(4):
        cv = jnp.asarray(rng.uniform(0, 1, 12), jnp.float32)
        cv = jnp.where(gs.mask, cv, 1e6)

        # sequential replication of the reference loop
        mf = gs.mask.astype(cv.dtype)
        n_valid = mf.sum()
        etas = ol._etas(cfg, n_valid)
        delta = mf / (4.0 * n_valid + 1.0)
        w = jnp.ones(12, cv.dtype)
        experts_p = state.experts_p
        experts_costs = state.experts_costs
        q = state.q
        p_seq = state.p
        for i in range(ol.NUM_EXPERTS):
            p_i = ol.bregman_projection(
                experts_p[i], etas[i] * cv, delta, w, gs.mask)
            c_i = jnp.dot(cv * mf, p_i) + jnp.dot(
                w * mf, jnp.abs(p_i - experts_p[i]))
            experts_costs = experts_costs.at[i].set(c_i)
            experts_p = experts_p.at[i].set(p_i)
            q = q * jnp.exp(-experts_costs)
            q = q / jnp.maximum(jnp.sum(q), 1e-12)
            p_seq = jnp.einsum("e,eg->g", q, experts_p)
            p_seq = p_seq / jnp.maximum(jnp.sum(p_seq), 1e-12)
        p_seq = p_seq * mf

        state = ol.update_goal_dist(cfg, state, cv, gs, gs.grasps[0])
        np.testing.assert_allclose(np.array(state.p), np.array(p_seq),
                                   atol=1e-6)
        np.testing.assert_allclose(np.array(state.experts_p),
                                   np.array(experts_p), atol=1e-6)
        np.testing.assert_allclose(np.array(state.q), np.array(q), atol=1e-6)
        np.testing.assert_allclose(np.array(state.experts_costs),
                                   np.array(experts_costs), atol=1e-6)
