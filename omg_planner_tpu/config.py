"""Immutable planner configuration and derived per-horizon operators.

TPU-native re-design of the reference's mutable global ``cfg`` EasyDict
(reference: ``omg/config.py:27-131``).  Instead of a process-global dict that
is mutated mid-run (cost schedules, horizon changes), we use a frozen
dataclass whose derived, horizon-dependent operators (finite-difference
matrices, the CHOMP metric ``A = D^T D`` and its inverse, and the goal-set
projection operators) are computed once per ``(timesteps, goal_set_proj)``
pair and closed over by jitted functions.

Cost schedules that the reference implements by mutating ``cfg`` each step
(``omg/optimizer.py:59-80``) are pure functions of the step index here
(:func:`schedule_weights`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

# The reference's 7-tap finite difference rules (omg/config.py:204-207).
DIFF_RULE_LENGTH = 7
DIFF_RULES = np.array(
    [
        [0.0, 0.0, -1.0, 1.0, 0.0, 0.0, 0.0],  # velocity
        [0.0, 0.0, 1.0, -2.0, 1.0, 0.0, 0.0],  # acceleration
        [0.0, -0.5, 1.0, 0.0, -1.0, 0.5, 0.0],  # jerk
    ]
)


@dataclasses.dataclass(frozen=True)
class OMGConfig:
    """Planner hyperparameters, mirroring reference ``omg/config.py:29-131``.

    All fields are static (hashable) so an ``OMGConfig`` can be a jit static
    argument.  Arrays derived from it live in :class:`HorizonParams`.
    """

    # --- hyperparameters (reference config.py:30-39)
    smoothness_base_weight: float = 0.1
    base_obstacle_weight: float = 1.0
    base_grasp_weight: float = 1.0
    cost_schedule_decay: float = 1.0
    cost_schedule_boost: float = 1.02
    base_step_size: float = 0.1
    step_decay_rate: float = 1.0
    joint_limit_max_steps: int = 10
    optim_steps: int = 50

    # --- planner parameters (reference config.py:42-104)
    epsilon: float = 0.2
    target_epsilon: float = 0.1
    target_obj_collision: float = 0.0
    collision_point_num: int = 15
    time_interval: float = 0.1
    top_k_collision: int = 1000
    clearance: float = 0.01
    target_clearance: float = 0.0
    ik_clearance: float = 0.03
    target_size: float = 1.0
    obstacle_size: float = 1.0
    obj_point_num: int = 800
    terminate_smooth_ratio: float = 4.0
    terminate_grad_norm: float = 1.5
    terminate_smooth_loss: float = 35.0
    penalize_constant: float = 5.0
    grasp_optimize: bool = False
    traj_init: str = "grasp"
    traj_interpolate: str = "cubic"
    goal_set_proj: bool = True
    goal_set_max_num: int = 100
    ol_alg: str = "MD"
    dist_eps: float = 0.1
    goal_idx: int = -2
    pre_terminate: bool = True
    ik_seed_num: int = 12
    finger_hard_constraint: bool = True
    uncheck_finger_collision: int = 0
    allow_collision_point: int = 5
    soft_joint_limit_padding: float = 0.2
    extra_smooth_steps: int = 20
    clip_grad_scale: float = 10.0
    normalize_cost: bool = True
    disable_collision_set: Tuple[str, ...] = ()
    use_standoff: bool = True
    standoff_dist: float = 0.08
    remove_flip_grasp: bool = True
    remove_base_rotate_grasp: bool = True
    remove_camera_downward_grasp: bool = True
    augment_flip_grasp: bool = True
    target_hand_filter_angle: float = 120.0
    dynamic_timestep: bool = False
    post_standoff: bool = False
    consider_finger: bool = False
    reach_tail_length: int = 5
    increment_iks: bool = False
    traj_delta: float = 0.05
    traj_max_step: int = 50
    traj_min_step: int = 2
    default_lazy: bool = True
    y_upsample: bool = False
    z_upsample: bool = True
    use_point_sdf: bool = False

    # --- globals (reference config.py:106-131)
    timesteps: int = 30
    base_link: str = "panda_link0"
    report_cost: bool = False
    report_time: bool = False
    scene_file: str = ""
    timeout: float = 3.0
    silent: bool = False

    # --- TPU-framework additions
    dof: int = 9
    num_links: int = 10
    # fixed number of interior samples the online learner uses when scoring
    # goal candidates (the reference uses a step-dependent count
    # ``timesteps - start``, online_learner.py:109-114; we keep the sample
    # count static for XLA and let arc-length weighting absorb the density
    # difference).
    # reference shrinks this count from T to 1 over the plan
    # (online_learner.py:109-114), averaging ~T/2; 15 matches that average
    # at the standard horizon. 0 -> use `timesteps`.
    learner_interp_steps: int = 15
    # collision points per link used by the learner's candidate sweep
    # (0 = all of collision_point_num, the reference behavior); lower values
    # trade scoring resolution for gather bandwidth
    learner_collision_points: int = 0
    # restrict the per-step candidate sweep to the K best-ranked lanes
    # (0 = sweep all, the reference behavior): the sweep's cost scales
    # with the static lane count, and the init sweep already ranks all
    # lanes; inactive lanes keep their last observed raw potential.
    # Default 32 after a measured suite A/B (DESIGN §3c): full-budget
    # 15.0 -> 17.7-19.7 plans/s on the v5e at -1 pt primary success (the
    # cascade's goal-blacklist retries recover it; cascade success stays
    # 0.95).  No-op when the goal capacity is <= K (small configs).
    # See ops/learner.py::update_goal (ROADMAP item 2).
    learner_active_goals: int = 32
    # with learner_active_goals: re-run a FULL sweep (and re-pick the
    # active lanes) every r-th learner step; 0 = init ranking only
    learner_refresh_every: int = 10
    # run the learner's candidate sweep only every k-th optimization step
    # (1 = every step, the reference behavior, omg/planner.py:614-618).
    # On the analytic backend the sweep is ~80% of a plan step (DESIGN
    # §3c step decomposition) while the chosen goal rarely changes
    # between adjacent steps; k>1 skips the sweep (a real lax.cond, so
    # skipped steps pay nothing) and holds the previous goal.
    # Default 2 after a repeated suite A/B (scripts/probe_sweep_every,
    # r4, warm v5e, two passes each): 31.0/31.3 -> 32.7/33.5 plans/s
    # early-term, p50 31.5 -> 29.3 ms, success identical at 0.98, mean
    # steps 15.3 -> 14.4 (holding the goal an extra step converges
    # slightly FASTER — per-step re-targeting churns the projection
    # endpoint).  Parity runs pin 1 (scripts/parity_run.py::_ours_cfg).
    learner_sweep_every: int = 2
    # honor PlanProblem.traj_init as the optimization's starting trajectory
    # even when the learner is enabled (skip the learner-init respline,
    # online_learner.py:94-102) — set automatically by
    # PlanningScene.step(traj_init=...); separate compiled program.
    warm_start_init: bool = False
    # reproduce the reference's top-k branch quirks bit-for-bit (duplicate
    # fancy-index writes dropped -> one gradient point per (timestep, link);
    # per-link cost scalar broadcast over timesteps) — parity runs only.
    # See ops/chomp.py::compute_collision_loss and DESIGN §7 item 1.
    ref_topk_quirks: bool = False
    # pre-bake SDF gradient channels per scene: 8 corner gathers per
    # point/object instead of 56 (exact in the interior; see
    # ops.sdf.BakedSceneSDF)
    sdf_baked: bool = True
    # score learner goal candidates against a scene-fused world-frame
    # potential volume (1 gather-channel instead of per-object stencils;
    # see ops.sdf.WorldPotential). CHOMP gradients stay exact.
    learner_world_potential: bool = True
    world_potential_resolution: float = 0.015
    # 'nearest' = one gather per scoring point (8x cheaper than trilinear;
    # the scoring field is already a smoothed approximation layer and the
    # reference's host lookup is nearest-cell too)
    learner_lookup: str = "nearest"
    # CHOMP collision backend: query ONE scene-fused 5-channel world field
    # (hinge pot + world grad + min-dist) instead of the per-object
    # baked stencil — O x fewer random gathers on the latency-bound TPU
    # gather pipeline (~150 M/s measured on v5e regardless of payload
    # width).  False restores the exact kernel.cu per-object numerics
    # (ops.sdf.WorldField documents the deviations).
    sdf_fused: bool = False
    world_field_resolution: float = 0.01
    # grid-free collision backend for analytic-primitive scenes: evaluate
    # the TRUE primitive SDF + closed-form gradient at query points
    # (ops.sdf.AnalyticScene) — zero gathers, zero interpolation error,
    # no bakes.  Applies automatically only when every scene object is
    # analytic; data-backed objects keep the voxel paths.  False restores
    # the reference's voxelize-then-interpolate numerics for primitives
    # (omg/core.py:366-411).
    sdf_analytic: bool = True
    ik_max_iters: int = 60
    ik_pos_tol: float = 1e-4
    ik_rot_tol: float = 1e-3
    ik_damping: float = 1e-4
    # batched-IK stall gate (ops/ik.py::ik_batch): a lane that hasn't
    # improved its twist error by >=15% in this many consecutive
    # iterations stops gating the batch's convergence exit (it keeps
    # receiving updates; it just can't drag every other lane to
    # ik_max_iters — the goal-set chain profile showed stragglers costing
    # 60 iterations where p95 of lanes converge in ~4; window 6 / 15%
    # halves total chain iterations at ~1% chain-valid lane loss).
    # 0 disables the gate.
    ik_stall_window: int = 6
    # two-stage goal-set IK (ops/ik.py::solve_goal_set): a fixed-iteration
    # prefilter over all (grasp x seed) lanes, then a full-budget re-solve
    # of only the `ik_survivor_cap` best-ranked lanes, warm-started.
    # Lanes above `ik_prefilter_tol` post-prefilter error are inactive and
    # can't drag the convergence exit to the full budget.
    ik_two_stage: bool = True
    ik_prefilter_iters: int = 12
    ik_prefilter_tol: float = 0.05
    # 384 -> 256 measured on the hard suite (scripts/probe_goalset_knobs):
    # warm build p50 -5% TPU / -31% CPU, valid goals -4%, success unchanged
    ik_survivor_cap: int = 256
    # iteration budget for the warm-started standoff-chain solves
    # (0 = inherit ik_max_iters).  The chain re-solves from the prefilter
    # solution and then hops ~2 cm per tail pose, so stragglers — not
    # typical lanes — set its wall; the chain dominates the goal-set
    # build (probe_goalset_stages: 288 of 380 ms CPU).  25 measured
    # success-neutral with cap 256 (probe_goalset_knobs; 20 was not).
    ik_chain_max_iters: int = 25
    # fuse the 6 sequential chain solves into ONE while_loop with
    # per-lane stage advancement (ops/ik.py::_solve_chain_fused): total
    # latency max_lane(sum_stage iters) instead of sum_stage(max_lane
    # iters), and every lane's result becomes independent of batch
    # composition (the sharded build needs no pmax-synced exit).
    # Behavioral deviation from the scanned form: converged lanes stop at
    # their own convergence instant (see DESIGN §7); parity runs pin it
    # off.  Default on: same-session v5e A/B measured the build program
    # 12.0 -> 10.3 ms queued (1.163x, all scenes win; goal sets match to
    # a few dedupe tie-flips — docs/probe_chain_fused_r05.json).
    ik_chain_fused: bool = True
    # whole-chain iteration budget for the fused chain (0 = uncapped):
    # the suite-measured per-lane completion distribution is p50 17 /
    # p90 18 global iterations with a crawl tail to 39 (lanes inside
    # the loose 10x acceptance improving <15%/iter, so the stall window
    # never trips).  Lanes unfinished at the budget grade as IK
    # failures; the cap trades the slowest ~p99 lanes for ~1/3 of the
    # chain loop's latency.  Default 26: same-session v5e A/B measured
    # build 10.4 -> 8.6 ms median (1.21x) with the VALID-GOAL count
    # unchanged on every probe scene — the dropped crawl lanes never
    # survive the prune/dedupe anyway (docs/probe_chain_budget_r05.json;
    # 32 keeps more lanes but wins less, 9.3 ms).  Applies only in the
    # regime it was calibrated in — warm two-stage chains on a full
    # survivor-cap compaction (ops/ik.py gates it); small goal sets and
    # cold chains run uncapped.
    ik_chain_total_budget: int = 26
    # compact candidate lanes to at most this many valid ones before the
    # collision prune / dedupe stages (goal_set.py): invalid lanes (failed
    # IK, limit-violating flips, task-space-filtered) need no collision
    # check, and the dedupe's O(C^2) distances + O(C) greedy scan shrink
    # with the cap. If more than `goal_prune_cap` lanes are valid, a
    # uniform (Gumbel top-k) subsample survives — same distribution the
    # final `sample_goals` stage applies anyway. 0 disables.
    goal_prune_cap: int = 512
    # dedupe execution strategy (identical kept set either way —
    # goal_set.py::diversity_dedupe): "scan" replays the reference's
    # sequential greedy pass; "rounds" resolves the same
    # lexicographically-first MIS as a parallel fixed point (dependency-
    # depth rounds of [C, C] mask reductions instead of C scan steps).
    # Default "rounds": same-session A/B on the v5e measured the build
    # program 13.9 -> 12.1 ms queued (1.146x, every scene wins,
    # bit-identical goal sets — docs/probe_dedupe_r05.json).
    dedupe_mode: str = "rounds"
    # in-plan goal blacklist (framework extension; the reference plans once
    # and reports FAIL, omg/planner.py:600-653): at steps s, s+every, ...
    # a plan still colliding above `allow_collision_point` masks out the
    # chosen goal's neighborhood (arm-joint L2 < radius — the goal-set
    # dedupe diversity radius, omg/planner.py:545-560) IN-GRAPH and
    # RESTARTS within the same step budget: fresh spline to the learner's
    # best remaining goal, learner distribution reset, cost schedule
    # restarted — the cascade's measured-effective goal-blacklist RE-PLAN
    # (planner/cascade.py, docs/diag_fails_r03.json: FAILs are dominated
    # by bad goal CHOICE) fused into the one jitted program, selected by
    # jnp.where (no extra dispatches).  Measured on the 100-scene hard
    # suite (v5e; scripts/probe_inplan_blacklist.py): primary success
    # 0.66 -> 0.97-0.98 with FEWER mean steps (34.9 -> 15.3) and faster
    # p50 (42 -> 31 ms) — recovered plans early-terminate instead of
    # burning the 70-step budget; recovered trajectories are validator-
    # clean at the same rate as ordinary successes (DESIGN §3c).
    # 0 disables (reference behavior; parity runs pin 0).  Runs on the
    # goal-sharded path too: the dynamic mask is applied at the
    # post-gather finalize, leaving the sweep's collective unconditional
    # (planner/plan.py::_blacklist_enabled).
    inplan_blacklist_step: int = 12
    inplan_blacklist_every: int = 6
    inplan_blacklist_radius: float = 0.5
    # executable-state snapshot (framework extension; diagnosed r4,
    # docs/diag_full_budget_r04.json): when a plan runs past an executable
    # state (collide <= allowance AND smooth < threshold) and ends
    # NON-executable, return that snapshot instead of the final state.
    # Forced full-budget optimization UN-SOLVES scenes otherwise: the
    # multiplicative smoothness boost (x1.02/step, omg/optimizer.py:62-66)
    # keeps re-weighting the tradeoff, so 14/100 hard-suite plans that
    # were executable mid-run end with collide 6-59 at step 70 (smooth
    # never the failing criterion) — success_rate_full_budget 0.84 vs
    # 0.98 early-term.  The snapshot is selected by jnp.where in-graph
    # ([T,9] + info in the carry); plans whose final state is executable
    # (every early-terminated plan) are bit-identical with it on or off.
    # Parity runs pin False (the reference returns the final state,
    # omg/planner.py:633-648).  DESIGN §7.
    exec_snapshot: bool = True
    # grip-quality goal ranking (framework extension; VERDICT r4 item 2):
    # weight on the pinch-center-to-target-COM distance folded into the
    # goal potentials at build time.  The r4 execution failures are
    # marginal top-pinches whose pinch line sits far from the COM — the
    # object pendulums past the 0.2 m hand gate during the lift
    # (docs/phys_exec_r04_100.json, 9/98).  Preferring COM-proximal
    # pinches among otherwise-equivalent goals targets exactly that
    # class.  Units: potentials are normalized per-vector in the learner
    # finalize, so the weight trades off against the collision potential
    # spread; 0 disables (parity runs pin 0).
    grip_quality_weight: float = 0.0
    # parity-only: reproduce the reference's SHRINKING learner sample
    # density (``omg/online_learner.py:109-114``: n = timesteps - start
    # interpolation points, so late steps score goals on few samples)
    # instead of the fixed ``num_interp`` quadrature — static shapes via
    # per-step sample masking at ``timesteps`` capacity (VERDICT r4
    # item 4: the fixed density is DESIGN §7 item 2's deviation and the
    # suspected cause of the class-3 "late ranking flip" golden-parity
    # mismatches).  Production keeps the fixed density: it is a strictly
    # better quadrature of the same line integral.
    parity_density: bool = False

    def replace(self, **kw) -> "OMGConfig":
        return dataclasses.replace(self, **kw)

    def jit_key(self) -> "OMGConfig":
        """cfg with host-only fields canonicalized.

        The reporting/IO fields below never reach a jitted program; keying
        jit caches (and therefore the persistent compile cache) on this
        canonical form means flipping ``silent``/``report_*``/paths cannot
        recompile a multi-minute device program.  Every jit cache in the
        framework keys on ``cfg.jit_key()``, and the jitted functions close
        over the canonical cfg so the traced HLO is itself flag-invariant.
        """
        return dataclasses.replace(self, **HOST_ONLY_DEFAULTS)

    @property
    def total_steps(self) -> int:
        return self.optim_steps + self.extra_smooth_steps

    @property
    def num_interp(self) -> int:
        return self.learner_interp_steps or self.timesteps

    def horizon(self, timesteps: int | None = None) -> "HorizonParams":
        return get_horizon_params(
            timesteps or self.timesteps,
            self.time_interval_for(timesteps or self.timesteps),
            self.goal_set_proj,
            self.reach_tail_length,
        )

    def time_interval_for(self, steps: int) -> float:
        # reference config.py:201: dt rescales so total duration stays 3 s.
        return (0.1 * 30.0) / steps

    def dynamic_timesteps(self, start: np.ndarray, end: np.ndarray) -> int:
        """Pick horizon length from start-goal distance (core.py:64-75)."""
        n = int(np.linalg.norm(np.asarray(start) - np.asarray(end)) / self.traj_delta)
        return min(max(n, self.traj_min_step), self.traj_max_step)


# Fields that never influence device computation (host-side reporting, IO
# paths, and wall-clock policy).  See OMGConfig.jit_key.
HOST_ONLY_DEFAULTS = dict(
    silent=False, report_cost=False, report_time=False, scene_file="",
    timeout=3.0, default_lazy=True)


def get_diff_matrix(
    n: int,
    order: int,
    time_interval: float,
    with_end: bool,
) -> np.ndarray:
    """Banded finite-difference matrix, reference ``omg/util.py:165-178``.

    Returns ``(n+1, n)``; row i applies the 7-tap rule centered between
    timesteps.  ``with_end=False`` zeroes the last row's final entry (used
    when the endpoint is a free variable, i.e. ``goal_set_proj``).
    """
    rule = DIFF_RULES[order - 1]
    half = DIFF_RULE_LENGTH // 2
    d = np.zeros((n + 1, n))
    for i in range(n + 1):
        for j in range(-half, half):
            idx = i + j
            if 0 <= idx < n:
                d[i, idx] = rule[j + half]
    if not with_end:
        d[-1, -1] = 0.0
    return d / (time_interval ** order)


class HorizonParams:
    """Precomputed, horizon-dependent CHOMP operators.

    Reference recomputes these on every horizon change via
    ``get_global_param`` (``omg/config.py:199-227``).  Additions for TPU:
    the goal-set projection step

        ``update = -eta * Ainv g + eta * M C Ainv g - M b``
        (reference ``omg/optimizer.py:107-112``)

    collapses, because ``C`` selects the last ``k`` rows, into

        ``update = -eta * P_k @ g - M_k @ b``

    with ``P_k = Ainv - M_k @ Ainv[-k:]`` and
    ``M_k = Ainv[:, -k:] @ inv(Ainv[-k:, -k:])`` precomputed here for both
    ``k = 1`` and ``k = reach_tail_length``.
    """

    def __init__(self, n: int, dt: float, goal_set_proj: bool, tail: int):
        self.timesteps = n
        self.time_interval = dt
        self.goal_set_proj = goal_set_proj
        self.tail = tail
        with_end = not goal_set_proj
        self.diff_matrices = np.stack(
            [get_diff_matrix(n, o + 1, dt, with_end) for o in range(3)]
        )
        d1 = self.diff_matrices[0]
        self.A = d1.T @ d1
        self.Ainv = np.linalg.inv(self.A)
        self.proj = {}
        for k in (1, tail):
            m_k = self.Ainv[:, -k:] @ np.linalg.inv(self.Ainv[-k:, -k:])
            p_k = self.Ainv - m_k @ self.Ainv[-k:, :]
            self.proj[k] = (m_k.astype(np.float32), p_k.astype(np.float32))
        self.diff_matrices = self.diff_matrices.astype(np.float32)
        self.A = self.A.astype(np.float32)
        self.Ainv = self.Ainv.astype(np.float32)


@functools.lru_cache(maxsize=64)
def get_horizon_params(
    n: int, dt: float, goal_set_proj: bool, tail: int
) -> HorizonParams:
    return HorizonParams(n, dt, goal_set_proj, tail)


def schedule_weights(cfg: OMGConfig, step):
    """Pure cost schedule, reference ``omg/optimizer.py:59-80``.

    ``step`` may be a traced integer (1-based as in the reference, which
    increments before use).
    """
    import jax.numpy as jnp

    stepf = jnp.asarray(step, jnp.float32)
    obstacle_w = cfg.base_obstacle_weight * cfg.cost_schedule_decay ** stepf
    smooth_w = cfg.smoothness_base_weight * cfg.cost_schedule_boost ** stepf
    grasp_w = cfg.base_grasp_weight * cfg.cost_schedule_decay ** stepf
    step_size = cfg.step_decay_rate ** stepf * cfg.base_step_size
    return obstacle_w, smooth_w, grasp_w, step_size
