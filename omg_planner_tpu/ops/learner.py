"""Online goal-selection learner (FTL / FTC / Proj / Exp / MD).

Re-implements ``omg/online_learner.py`` as pure, static-shape JAX over a
masked fixed-capacity goal set.  The candidate-cost evaluation
(``cost_vector``, reference ``:104-160``) — linear interpolation from the
current configuration to every goal, batched FK + SDF hinge potentials with
arc-length weighting — is the largest single tensor computation in a plan
step and runs as one fused program on device; the reference already batched
it but bounced through host numpy and a CUDA layer.

Static-shape note: the reference interpolates ``timesteps - start`` points
(shrinking as optimization progresses, ``:109-114``); we use a fixed
``cfg.num_interp`` sample count — the arc-length weighting makes the score a
line-integral estimate, so sample density only changes quadrature
resolution, not the ranking semantics.

The Bregman projection ``bp`` onto the shifted simplex and its bisection
root-finder reproduce reference ``:17-58`` with fixed iteration counts
(bisection halves the step each iteration, so 40 iterations exhausts f32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import HorizonParams, OMGConfig
from ..models import panda
from ..utils.diff import get_derivative
from ..utils.spline import multi_linear_interpolate
from .chomp import CostParams, GoalSet
from .sdf import (AnalyticScene, SceneSDF, WorldPotential, sdf_potentials,
                  world_potential_lookup, world_potential_lookup_nearest)

NUM_EXPERTS = 5
_ETA_POWERS = (-2, -1, 0, 2, 4)  # reference online_learner.py:84


class LearnerState(NamedTuple):
    p: jnp.ndarray             # [G] goal distribution
    sum_costs: jnp.ndarray     # [G]
    experts_p: jnp.ndarray     # [E, G]
    experts_costs: jnp.ndarray  # [E]
    q: jnp.ndarray             # [E] expert mixture
    t: jnp.ndarray             # scalar float step count
    ti: jnp.ndarray            # [G] per-goal selection counts
    # active-lane sweep restriction (cfg.learner_active_goals): indices of
    # the K lanes the per-step sweep scores ([0] when the knob is off) and
    # every lane's last observed RAW potential (stale for inactive lanes —
    # fed back so distributions stay well-defined without resurrecting or
    # killing lanes artificially)
    active_idx: jnp.ndarray    # [K] int32
    last_raw: jnp.ndarray      # [G]


def sweep_restricted(cfg: OMGConfig, capacity: int) -> bool:
    """Static: is the per-step candidate sweep restricted to the
    ``cfg.learner_active_goals`` best-ranked lanes for this goal capacity?

    Shared by the plan loop and the goal-sharded path: when True, the
    sweep touches only K lanes (no collectives anywhere in the learner),
    so the sharded planner runs the identical replicated program instead
    of injecting a gathered cost vector (``parallel/batch.py``)."""
    return bool(cfg.learner_active_goals and cfg.ol_alg != "Proj"
                and cfg.learner_active_goals < capacity)


def init_learner_state(goal_set: GoalSet,
                       active_goals: int = 0) -> LearnerState:
    g = goal_set.capacity
    m = goal_set.mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    uniform = m / n
    k = min(active_goals, g) if active_goals else 0
    return LearnerState(
        p=uniform,
        sum_costs=jnp.zeros(g),
        experts_p=jnp.tile(uniform[None], (NUM_EXPERTS, 1)),
        experts_costs=jnp.zeros(NUM_EXPERTS),
        q=jnp.ones(NUM_EXPERTS) / NUM_EXPERTS,
        t=jnp.asarray(0.0),
        ti=jnp.zeros(g),
        active_idx=jnp.zeros(k, jnp.int32),
        last_raw=jnp.zeros(g),
    )


def find_zero(f, x0, x1, iters: int = 30):
    """Sign-bisection root finder (reference ``online_learner.py:17-29``);
    30 halvings exhaust f32 resolution of the bracket."""
    x = (x0 + x1) / 2.0
    s = (x1 - x0) / 4.0

    def body(_, state):
        x, s = state
        y = f(x)
        return x - s * jnp.sign(y), s / 2.0

    x, _ = jax.lax.fori_loop(0, iters, body, (x, s))
    return x


def bregman_projection(x, v, delta, w, mask, max_iters: int = 20,
                       tol: float = 1e-6, uniform_w: bool = True):
    """Weighted/shifted-entropy Bregman projection onto the simplex
    (reference ``bp``, ``online_learner.py:32-58``), masked to valid goals.

    The outer fixed-point loop exits on alpha convergence like the
    reference (``:52-54``) — typically 1-2 iterations — via
    ``lax.while_loop`` (this sits inside the sequential per-step learner
    update, so saved iterations are saved wall-clock).

    ``uniform_w``: the MD learner always calls with ``w = 1`` (ours AND
    the reference's, ``online_learner.py:229``), which makes the inner
    root-solve closed-form — ``f(el) = e^el * S - target`` with
    ``S = sum shiftx e^z``, so ``el = log target - logsumexp(log shiftx
    + z)`` — replacing the reference's 30-iteration sign bisection (a
    pure sequential-latency chain on TPU; 0.16 ms of a 0.45 ms step).
    Agreement with the bisection is at f32 resolution (the bisection's
    own terminal precision).  ``uniform_w=False`` keeps the bisection
    for general weights.
    """
    m = mask.astype(x.dtype)
    target = 1.0 + jnp.sum(delta * m)
    shiftx = (x + delta) * m
    upper = jnp.max(jnp.where(mask, w + v, -jnp.inf))

    def solve_el(alpha):
        z = (alpha - v) / w
        if uniform_w:
            logs = jnp.where(m > 0,
                             jnp.log(jnp.maximum(shiftx, 1e-30)) + z,
                             -jnp.inf)
            s = jax.scipy.special.logsumexp(logs)
            # clip to the bisection's bracket: when the root lies outside
            # [0, upper] the reference's sign-bisection converges to the
            # bracket boundary, and that clamped value IS its semantics
            return jnp.clip(jnp.log(target) - s, 0.0, upper)

        def f(el):
            return jnp.sum(
                shiftx * jnp.exp(jnp.clip(el / w + z, -60.0, 60.0))) - target

        return find_zero(f, jnp.zeros_like(upper), upper)

    def cond(state):
        it, alpha, diff = state
        return (diff > tol) & (it < max_iters)

    def body(state):
        it, alpha, _ = state
        el = solve_el(alpha)
        alpha_prime = jnp.maximum(
            0.0, v - el + w * jnp.log(delta / jnp.maximum(shiftx, 1e-20)))
        alpha_prime = alpha_prime * m
        return it + 1, alpha_prime, jnp.linalg.norm(alpha_prime - alpha)

    _, alpha, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), jnp.zeros_like(x), jnp.asarray(jnp.inf)))
    el = solve_el(alpha)
    y = shiftx * jnp.exp(jnp.clip((el + alpha - v) / w, -60.0, 60.0)) - delta
    y = jnp.maximum(y * m, 0.0)
    return y / jnp.maximum(jnp.sum(y), 1e-12)


def cost_vector(
    model: panda.PandaModel,
    scene: SceneSDF,
    params: CostParams,
    cfg: OMGConfig,
    hp: HorizonParams,
    traj: jnp.ndarray,       # [T, 9]
    goal_set: GoalSet,
    t: jnp.ndarray,          # learner step (1-based at call, as reference)
    world_potential: WorldPotential | None = None,
) -> jnp.ndarray:
    """Goal-candidate objective estimates [G] (reference ``:104-160``)."""
    raw = cost_vector_raw(model, scene, params, cfg, hp, traj, goal_set, t,
                          world_potential)
    return finalize_cost_vector(cfg, raw, goal_set.mask)


def cost_vector_raw(
    model: panda.PandaModel,
    scene: SceneSDF,
    params: CostParams,
    cfg: OMGConfig,
    hp: HorizonParams,
    traj: jnp.ndarray,
    goal_set: GoalSet,
    t: jnp.ndarray,
    world_potential: WorldPotential | None = None,
) -> jnp.ndarray:
    """Unnormalized masked candidate potentials [G] (invalid goals -> 0);
    see :func:`finalize_cost_vector`."""
    clamp = 1
    start_idx = jnp.minimum(
        clamp + (t / cfg.optim_steps * cfg.timesteps).astype(jnp.int32) - 1,
        cfg.timesteps - clamp)
    start_idx = jnp.maximum(start_idx, 0)
    traj_start = traj[start_idx]

    goals = goal_set.grasps  # [G, 9]
    if cfg.parity_density:
        # reference-exact SHRINKING sample density (parity mode,
        # ``omg/online_learner.py:109-114``): n_t = timesteps - start
        # interior samples at (k+1)/(n_t+1) — dynamic count under static
        # ``timesteps`` capacity via masking (invalid samples score 0)
        n = cfg.timesteps
        n_t = cfg.timesteps - start_idx            # dynamic, in [1, T]
        ks = jnp.arange(n)
        u = (ks + 1.0) / (n_t + 1.0)               # [n] dynamic positions
        sample_valid = ks < n_t                    # [n]
        interp = (traj_start[None, None, :]
                  + u[None, :, None]
                  * (goals[:, None, :] - traj_start[None, None, :]))
    else:
        n = cfg.num_interp
        sample_valid = None
        interp = multi_linear_interpolate(traj_start, goals, n)  # [G,n,9]
    g = goals.shape[0]
    # FK the start + interior samples + goal of every candidate as ONE
    # batch: the arc-length boundary positions (x_start / x_goal) come from
    # slices of the same program instead of two more FK instantiations —
    # each batched-FK call site is ~9k lines of HLO in the (twice-
    # instantiated) plan program, and one fused dispatch shortens the
    # step's sequential critical path on the remote chip
    full = jnp.concatenate([
        jnp.broadcast_to(traj_start, (g, 1, goals.shape[-1])),
        interp, goals[:, None, :]], axis=1)      # [G, n+2, 9]
    flat_q = full.reshape(g * (n + 2), -1)

    score_model = model
    if cfg.learner_collision_points and \
            cfg.learner_collision_points < model.num_collision_points:
        stride = max(model.num_collision_points
                     // cfg.learner_collision_points, 1)
        score_model = model._replace(
            collision_points=model.collision_points[:, ::stride, :]
            [:, :cfg.learner_collision_points, :])
    poses = panda.forward_kinematics_batch(score_model, flat_q)
    x_full = panda.collision_point_positions(score_model, poses)
    p = x_full.shape[2]
    x_full = x_full.reshape(g, n + 2, panda.NUM_LINKS, p, 3)
    x = x_full[:, 1:-1]  # interior samples score the potential
    if (cfg.learner_world_potential and world_potential is not None
            and not isinstance(scene, AnalyticScene)):
        lookup = (world_potential_lookup_nearest
                  if cfg.learner_lookup == "nearest"
                  else world_potential_lookup)
        pot = lookup(world_potential, x.reshape(-1, 3))
    else:
        # AnalyticScene routes here: a direct true-SDF sweep is elementwise
        # VPU work (XLA DCEs the unused gradient outputs), cheaper and
        # exacter than one baked-field gather per scoring point
        pot, _, _ = sdf_potentials(
            scene, params.inv_poses, x.reshape(-1, 3), params.epsilons,
            params.padding_scales, params.clearances, params.disables)
    pot = pot.reshape(g, n, panda.NUM_LINKS, p)

    # arc-length weights: |d x / dt| along the interpolation axis
    # (reference cost.py:235-275)
    x_start = x_full[:, 0]   # [G, 10, P, 3] (identical rows; broadcast-free)
    x_goal = x_full[:, -1]
    xs = jnp.moveaxis(x, 1, 3)  # [G, 10, P, n, 3]
    if cfg.parity_density:
        # the order-1 rule [-1, 1] is a backward difference with the
        # start boundary (the end rows carry zero coefficients /
        # are dropped — config.py:134-159), so the dynamic-n derivative
        # is exact without truncating hp's static diff matrix
        prev = jnp.concatenate(
            [x_start[..., None, :], xs[..., :-1, :]], axis=-2)
        v = (xs - prev) / hp.time_interval
        speed = jnp.linalg.norm(v, axis=-1)      # [G, 10, P, n]
        speed = speed * sample_valid[None, None, None, :]
    else:
        v = get_derivative(hp, xs, x_start, x_goal, 1)
        speed = jnp.linalg.norm(v, axis=-1)      # [G, 10, P, n]
    collision = (jnp.moveaxis(pot, 1, 3) * speed).sum(axis=(1, 2, 3))  # [G]

    # config-space distance term: reference uses np.diff along the joint
    # axis (online_learner.py:149-151)
    diff = jnp.diff(traj_start[None, :] - goals, axis=-1)
    smooth = jnp.linalg.norm(diff, axis=-1) ** 2

    potentials = (cfg.base_obstacle_weight * collision
                  + cfg.smoothness_base_weight * cfg.dist_eps * smooth)
    if cfg.grasp_optimize or cfg.grip_quality_weight:
        # grasp-quality terms baked into goal_set.potentials at build time
        # (downness under grasp_optimize; pinch-to-COM distance under
        # grip_quality_weight — the latter rides on the collision-prune
        # potential baseline, goal_set.py::build_goal_set)
        potentials = potentials + goal_set.potentials
    return jnp.where(goal_set.mask, potentials, 0.0)


def finalize_cost_vector(cfg: OMGConfig, potentials: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Normalization + invalid-goal masking of the raw candidate potentials.

    Split from :func:`cost_vector` so a goal-sharded caller can compute the
    raw potentials on its local shard, ``all_gather``, and apply the (global)
    normalization here — a shard-local normalization would use the wrong
    norm (``parallel/batch.py``)."""
    if cfg.normalize_cost:
        potentials = potentials / jnp.maximum(
            jnp.linalg.norm(potentials), 1e-12)
    # invalid goals get a huge cost so no algorithm selects them
    return jnp.where(mask, potentials, 1e6)


def _etas(cfg: OMGConfig, n_valid):
    eta = jnp.sqrt(jnp.log(n_valid + 1.0) / cfg.optim_steps)
    return jnp.stack([eta * (2.0**x) for x in _ETA_POWERS])


def update_goal_dist(
    cfg: OMGConfig,
    state: LearnerState,
    cv: jnp.ndarray,
    goal_set: GoalSet,
    traj_end: jnp.ndarray,
) -> LearnerState:
    """One online-learning update of the goal distribution
    (reference ``update_goal_dist`` + per-algorithm methods, ``:162-235``)."""
    mask = goal_set.mask
    mf = mask.astype(cv.dtype)
    g = goal_set.capacity
    n_valid = jnp.maximum(mf.sum(), 1.0)

    alg = cfg.ol_alg
    if alg == "Proj":
        dists = jnp.where(
            mask, jnp.linalg.norm(traj_end[None] - goal_set.grasps, axis=-1),
            jnp.inf)
        p = jax.nn.one_hot(jnp.argmin(dists), g, dtype=cv.dtype)
        return state._replace(p=p)

    if alg == "FTL":
        sum_costs = state.sum_costs + cv
        p = jax.nn.one_hot(
            jnp.argmin(jnp.where(mask, sum_costs, jnp.inf)), g, dtype=cv.dtype)
        return state._replace(p=p, sum_costs=sum_costs)

    if alg == "FTC":
        p = jax.nn.one_hot(
            jnp.argmin(jnp.where(mask, cv, jnp.inf)), g, dtype=cv.dtype)
        return state._replace(p=p)

    if alg == "Exp":
        sum_costs = state.sum_costs + cv * mf
        norm_sum = sum_costs / (jnp.sum(sum_costs) + 1e-8)
        eta = jnp.sqrt(jnp.log(n_valid + 1.0) / cfg.optim_steps)
        p_new = jnp.exp(-eta * cv) * state.p
        p = (p_new * 0.999 + norm_sum * 0.001) * mf
        p = p / (jnp.sum(p) + 1e-8)
        return state._replace(p=p, sum_costs=sum_costs)

    if alg == "MD":
        etas = _etas(cfg, n_valid)
        delta = mf / (4.0 * n_valid + 1.0)  # reference :85
        w = jnp.ones(g, cv.dtype)
        # The reference loops over experts (online_learner.py:224-235), but
        # the Bregman projections and expert costs depend only on that
        # expert's own state — batch them (one vmapped projection instead of
        # NUM_EXPERTS sequential bisection chains; this is the dominant
        # sequential latency of the learner update on TPU).  Only the q
        # recurrence is order-dependent: at inner step i the reference
        # multiplies by exp(-experts_costs) with entries 0..i fresh and
        # i+1.. still carrying the previous learner step's values — the
        # fori_loop below replays those exact snapshots, so the final
        # (q, p) match the sequential loop bit-for-bit up to reduction
        # order.  Intermediate p mixtures inside the reference loop are
        # overwritten and never observed.
        p_new = jax.vmap(
            lambda pi, eta: bregman_projection(pi, eta * cv, delta, w, mask)
        )(state.experts_p, etas)
        c_new = ((cv * mf)[None] * p_new).sum(-1) + (
            (w * mf)[None] * jnp.abs(p_new - state.experts_p)).sum(-1)

        def q_body(i, q):
            costs_i = jnp.where(jnp.arange(NUM_EXPERTS) <= i,
                                c_new, state.experts_costs)
            q = q * jnp.exp(-costs_i)
            return q / jnp.maximum(jnp.sum(q), 1e-12)

        q = jax.lax.fori_loop(0, NUM_EXPERTS, q_body, state.q)
        p = jnp.einsum("e,eg->g", q, p_new)
        p = p / jnp.maximum(jnp.sum(p), 1e-12)
        return state._replace(
            p=p * mf, experts_p=p_new, experts_costs=c_new, q=q)

    raise ValueError(f"unknown ol_alg {alg}")


def update_goal(
    model: panda.PandaModel,
    scene: SceneSDF,
    params: CostParams,
    cfg: OMGConfig,
    hp: HorizonParams,
    traj: jnp.ndarray,
    goal_set: GoalSet,
    state: LearnerState,
    world_potential: WorldPotential | None = None,
    cv_fn=None,
):
    """Advance the learner one step and pick argmax goal
    (reference ``update_goal``, ``:237-249``).

    ``cv_fn(traj, t, mask) -> [G]`` overrides the candidate-cost
    evaluation — the goal-sharded planner injects a shard-local sweep +
    ``all_gather`` here so single-chip and sharded paths share this loop
    (``parallel/batch.py``).  ``mask`` is ``goal_set.mask``, which the
    plan loop narrows mid-plan (in-plan blacklist); the injected sweep's
    collective must be mask-independent, applying the mask only at the
    finalize step.  Unused when the sweep is restricted to active lanes
    (:func:`sweep_restricted` — the restricted sweep is collective-free
    and runs as-is on every shard).

    Returns (new_state, goal_idx).
    """
    t = state.t + 1.0
    state = state._replace(t=t)
    restrict = (sweep_restricted(cfg, goal_set.capacity)
                # a state built without active lanes (direct
                # init_learner_state callers) falls back to the full sweep
                and state.active_idx.shape[0] > 0
                # a caller-supplied cost override is AUTHORITATIVE: the
                # active-lane ranking would score lanes by the built-in
                # raw sweep and silently drop the injection (the sharded
                # path passes cv_fn=None when restricted, so only user
                # overrides reach here)
                and cv_fn is None)
    if cfg.ol_alg == "Proj":
        state = update_goal_dist(cfg, state, jnp.zeros(goal_set.capacity),
                                 goal_set, traj[-1])
    elif restrict:
        # Active-lane sweep (ROADMAP item 2 / VERDICT r2 item 3): the
        # candidate sweep dominates the per-step profile and its cost is
        # proportional to the STATIC lane count, so score only the K
        # currently-active lanes (a compacted gather of the goal set —
        # same cost_vector_raw program at [K] instead of [G]) and feed
        # inactive lanes their last observed raw potential.  An optional
        # full sweep every ``learner_refresh_every`` steps re-ranks all
        # lanes and re-picks the active set (lax.cond: skipped steps pay
        # nothing).  Deviation from the reference's always-full sweep
        # (online_learner.py:104-160) — measured A/B in DESIGN §3c.
        k = min(cfg.learner_active_goals, goal_set.capacity)

        def partial_sweep(state):
            # take_rows, not a[idx]: fancy-indexing multi-dim rows lowers
            # to the slow slice_sizes>1 lax.gather on v5e (DESIGN §3b)
            from ..utils.linalg import take_rows

            gs_small = jax.tree.map(
                lambda a: take_rows(a, state.active_idx), goal_set)
            raw_small = cost_vector_raw(
                model, scene, params, cfg, hp, traj, gs_small, t,
                world_potential)
            raw_full = state.last_raw.at[state.active_idx].set(raw_small)
            return raw_full, state.active_idx

        def full_sweep(state):
            raw_full = cost_vector_raw(
                model, scene, params, cfg, hp, traj, goal_set, t,
                world_potential)
            cvn = finalize_cost_vector(cfg, raw_full, goal_set.mask)
            new_active = jax.lax.top_k(-cvn, k)[1].astype(jnp.int32)
            return raw_full, new_active

        if cfg.learner_refresh_every:
            do_full = jnp.mod(t, float(cfg.learner_refresh_every)) == 0.0
            raw_full, active = jax.lax.cond(
                do_full, full_sweep, partial_sweep, state)
        else:
            raw_full, active = partial_sweep(state)
        cv = finalize_cost_vector(cfg, raw_full, goal_set.mask)
        state = state._replace(last_raw=raw_full, active_idx=active)
        state = update_goal_dist(cfg, state, cv, goal_set, traj[-1])
    else:
        cv = (cv_fn(traj, t, goal_set.mask) if cv_fn is not None else
              cost_vector(model, scene, params, cfg, hp, traj, goal_set, t,
                          world_potential))
        state = update_goal_dist(cfg, state, cv, goal_set, traj[-1])
    goal_idx = jnp.argmax(jnp.where(goal_set.mask, state.p, -jnp.inf))
    state = state._replace(ti=state.ti.at[goal_idx].add(1.0))
    return state, goal_idx
