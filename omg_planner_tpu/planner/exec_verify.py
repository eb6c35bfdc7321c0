"""Execution-verified planning: simulate the lift, steer off bad goals.

Round-4 diagnosis of the physics-execution failures
(``docs/phys_exec_r04_100.json``, 9/98 planned grasps failed to lift)
showed they are NOT separable at build time: the suite's goal candidates
are geometrically identical relative to the target (same standoff, same
pinch-through-COM construction — ``docs/probe_goal_quality_r05.json``
records two top-down goals on the same cylinder with identical
downness/closing-width features where one lifts and one squirts out of
the closing grip).  What *does* separate them is the simulated rollout
itself — and the native stepper costs ~0.4 s per execution on host CPU
(:mod:`omg_planner_tpu.physics`), so the production policy can afford to
use it as the oracle.

:func:`plan_execute_verified` plans, executes, and on a failed lift
blacklists the converged goal's joint-space neighborhood (the cascade's
goal-blacklist machinery, ``planner/cascade.py::goal_blacklist``) and
re-plans — a pure mask swap on the staged problem, no re-staging, no
recompile.  This closes the VERDICT r4 loop "the planner doesn't use
what it knows": the same blacklist lever that lifted plan success
0.66 -> 0.98 in round 3, now driven by the execution reward instead of
the collision verdict.

The reference counterpart is the demonstration filter
(``bullet/gen_data.py:153-166`` keeps only rew > 0 rollouts) — it
discards failures; this retries them.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .cascade import BACKENDS, goal_blacklist, plan_cascade


class ExecVerifiedOut(NamedTuple):
    result: object          # PlanResult of the chosen attempt
    report: object          # PhysExecReport of that attempt (None: no exec)
    exec_attempts: int      # executions run HERE (seeded failure excluded)
    verified: bool          # True iff the returned plan's lift reward == 1
    reason: str = ""        # why report is None ("plan failed" /
    #                         "no mass model"); empty otherwise


def _exec_rank(rep) -> tuple:
    """Order failed executions: closer to the hand, then higher lift."""
    return (float(rep.hand_dist_m), -float(rep.lifted_m))


def plan_execute_verified(scene, exec_retries: int = 2, fast: bool = True,
                          cascade: bool = False, plan_retries: int = 3,
                          seed=None, **exec_kw) -> ExecVerifiedOut | None:
    """Plan ``scene``, execute the plan in the native stepper, and retry
    with the failed goal's neighborhood blacklisted until the simulated
    lift succeeds (up to ``exec_retries`` re-plans).

    ``cascade=True`` recovers plan-level failures with the backend
    escalation cascade first (``plan_cascade``); when the recovery came
    from a DIFFERENT collision backend, the retry loop runs under that
    backend's config (goal indices/masks are only meaningful against
    the goal set they were built from — a base-config rebuild would
    misalign them) and the session config is restored on exit.

    ``seed=(result, report)`` feeds an attempt the CALLER already
    executed (and observed failing): the loop starts from its blacklist
    instead of re-planning and re-rolling the known failure —
    ``exec_attempts`` then counts only executions run here.

    Returns ``None`` when no plan exists at all (IK-FAIL refusal),
    otherwise the best attempt: the first verified one, or the least-bad
    execution by (hand distance, lift height).  ``exec_kw`` forwards to
    :func:`omg_planner_tpu.physics.execute_plan` (density, params,
    pad_statics...).
    """
    base_cfg = getattr(scene, "cfg", None)
    try:
        return _verified_loop(scene, exec_retries, fast, cascade,
                              plan_retries, seed, exec_kw)
    finally:
        if base_cfg is not None and scene.cfg is not base_cfg:
            scene.cfg = base_cfg
            scene._sync_env_cfg()


def _verified_loop(scene, exec_retries, fast, cascade, plan_retries,
                   seed, exec_kw):
    from ..physics import NoMassModelError, execute_plan

    pre_rep = None
    if seed is not None:
        res, pre_rep = seed
    else:
        res = scene.step(fast=fast)
    if (res is None or not bool(np.asarray(res.flag))) and cascade:
        cr = plan_cascade(scene, fast=fast)
        if cr is not None:
            res = cr.result
            over = BACKENDS.get(getattr(cr, "backend", None), {})
            if any(getattr(scene.cfg, k) != v for k, v in over.items()):
                # pin the recovering backend for the whole retry loop:
                # res.goal_idx / goal_mask index ITS goal set, and
                # scene.step below must rebuild the same set (the caller
                # restores the session cfg)
                scene.cfg = scene.cfg.replace(**over)
                scene._sync_env_cfg()
    if res is None:
        return None
    if not bool(np.asarray(res.flag)):
        return ExecVerifiedOut(res, None, 0, False, "plan failed")

    best = None
    n_exec = 0
    mask = (np.asarray(res.goal_mask).copy() if res.goal_mask is not None
            else np.asarray(scene.goal_set.mask).copy())
    for attempt in range(exec_retries + 1):
        if attempt == 0 and pre_rep is not None:
            rep = pre_rep          # caller already rolled this one out
        else:
            try:
                rep = execute_plan(scene, np.asarray(res.traj), **exec_kw)
            except NoMassModelError:
                # no mass model: execution can neither verify nor refute
                return ExecVerifiedOut(res, None, n_exec, False,
                                       "no mass model")
            n_exec += 1
        if rep.reward == 1:
            return ExecVerifiedOut(res, rep, n_exec, True)
        if best is None or _exec_rank(rep) < _exec_rank(best.report):
            best = ExecVerifiedOut(res, rep, 0, False)
        if attempt == exec_retries:
            break
        mask = goal_blacklist(scene.goal_set, mask, int(res.goal_idx))
        # replan, steering past PLAN-level failures too (a blacklist
        # retry can land on a colliding goal — blacklist it as well and
        # keep going, the cascade's goal_retries pattern)
        res2 = None
        for _ in range(plan_retries):
            if not mask.any():
                break
            cand = scene.step(fast=fast, goal_mask=mask)
            if cand is None:
                break
            if cand.goal_mask is not None:
                mask &= np.asarray(cand.goal_mask)
            if bool(np.asarray(cand.flag)):
                res2 = cand
                break
            mask = goal_blacklist(scene.goal_set, mask,
                                  int(cand.goal_idx))
        if res2 is None:
            break  # no alternative plan: keep the least-bad execution
        res = res2
    return best._replace(exec_attempts=n_exec)
