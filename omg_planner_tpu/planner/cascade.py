"""Backend escalation cascade: cheap-first planning with verdict-gated
fallback.

The grid-free analytic backend plans ~5x faster than the exact voxel
backend (p50 57 ms vs 235 ms on the hard suite, ``docs/DESIGN.md`` §3c)
but its rounded edges cost ~9 points of standard-budget success.  Both
attempts together still finish far inside the reference's 3 s per-plan
wall-clock budget (``/root/reference/omg/config.py:130``), so the
production policy is an escalation cascade: plan with the analytic
backend, and only when the verdict is FAIL re-stage the scene on the
exact grid backend and plan again.

Measured on the 100-scene hard suite (v5e): analytic-only 0.70 success;
round 2's backend-only cascade reached 0.80 at 1.9 plans/s e2e.  Round 3
added **goal-blacklist retries** (mask the failed goal's neighborhood,
re-plan the same staged problem) after diagnosing the FAIL population
(``docs/diag_fails_r03.json``): most failures are a bad goal CHOICE, not
backend error — the cascade now reaches **0.95** (above the suite's own
0.85 generation screen) at 2.3-2.5 plans/s e2e.  Goal-set re-SAMPLING
retries do NOT help: with fewer valid goals than ``goal_set_max_num`` the
Gumbel-top-k sample is the identity, so a re-keyed rebuild replans the
identical problem (measured: 0 of 30 failures recovered over 3 retries).
Blacklisting is different — it removes the attractor the learner keeps
converging to, and the retry usually pre-terminates in 2-3 steps.

The reference has no counterpart — it plans once per scene with its one
CUDA backend (``omg/core.py:869-885``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from ..config import OMGConfig
from .scene import PlanningScene


class SuiteCascadeOut(NamedTuple):
    flag: bool
    backend: str
    attempts: int
    traj: np.ndarray
    goal_idx: int


#: cfg field overrides selecting each collision backend, cheapest first.
BACKENDS: dict[str, dict] = {
    "analytic": {"sdf_analytic": True, "sdf_fused": False},
    "exact": {"sdf_analytic": False, "sdf_fused": False},
    "fused": {"sdf_analytic": False, "sdf_fused": True},
}


class CascadeResult(NamedTuple):
    result: object        # PlanResult (numpy-mapped) of the chosen attempt
    backend: str          # backend that produced it
    attempts: int         # how many backends were tried
    success: bool         # chosen attempt's verdict


def _fail_rank(res) -> tuple:
    """Order failed attempts: fewer colliding points, then closer to the
    goal, then lower final cost (the verdict criteria, ``omg/cost.py:
    489-494``, in severity order)."""
    info = res.info
    return (float(np.asarray(info.collide)), float(np.asarray(info.reach)),
            float(np.asarray(info.cost)))


#: joint-space L2 radius (arm joints) around a failed goal inside which
#: goals are blacklisted before a retry — the reference's own goal-set
#: dedupe diversity radius (``omg/planner.py:545-560``), so one retry
#: skips a failed goal AND its near-duplicates (wrist twins fail the same
#: way).
BLACKLIST_RADIUS = 0.5


def goal_blacklist(goal_set, mask: np.ndarray, goal_idx: int,
                   radius: float = BLACKLIST_RADIUS) -> np.ndarray:
    """Clear ``mask`` entries within ``radius`` (arm-joint L2) of the
    failed goal.  Returns the new mask (all-False when nothing is left)."""
    grasps = np.asarray(goal_set.grasps)
    failed = grasps[int(goal_idx)]
    d = np.linalg.norm(grasps[:, :7] - failed[None, :7], axis=-1)
    return mask & ~(d < radius)


def plan_cascade(scene: PlanningScene,
                 backends: Sequence[str] = ("analytic", "exact"),
                 fast: bool = True,
                 goal_retries: int = 3,
                 budget_s: float | None = None) -> CascadeResult | None:
    """Plan ``scene`` escalating until one verdict is SUCCESS; on total
    failure return the least-bad attempt by :func:`_fail_rank`.

    Per backend: one plan from the full goal set, then up to
    ``goal_retries`` **goal-blacklist retries** — each FAIL's converged
    goal (plus its near-duplicates, radius 0.5 rad) is masked out and the
    same staged problem re-planned.  A retry is a pure data change (same
    compiled program, no re-staging) and usually terminates in 2-3 steps
    once the learner is steered off the blocked goal.  Measured on the
    hard suite (docs/diag_fails_r03.json): analytic-FAILs are dominated by
    a bad goal choice, not backend error — blacklist retries on the
    ANALYTIC backend alone recover 8 of the 9 exact-unrecoverable
    screened-ok failures.

    Warm-starting the fallback from the failed trajectory
    (``scene.step(traj_init=...)``) was measured and rejected: recovery
    sets and step counts were identical to cold re-plans (the failed
    trajectory is the local minimum being escaped, not progress to keep).

    Backend switches go through ``scene.cfg`` exactly like the task
    layer's explicit config overrides (``planner/tasks.py``): the staged
    caches key on ``cfg.jit_key()`` so each backend stages and compiles
    once (a backend whose fields already match the session cfg re-stages
    nothing), and the session cfg is restored afterwards.  Returns
    ``None`` only if every backend refused to plan (empty goal set — the
    IK-FAIL refusal path).  ``attempts`` counts plans that actually ran;
    an IK-FAIL refusal skips to the next backend WITHOUT counting — the
    ``continue`` (not ``break``) matters because goal-set validity is
    collision-filtered against each backend's own SDF, so a stricter
    backend can still find valid goals.

    ``budget_s`` is the operational analog of the reference's per-plan
    wall-clock timeout (``omg/planner.py:629-630``, ``cfg.timeout=3``):
    once the elapsed wall exceeds it, no FURTHER attempt launches and
    the best result so far is returned.  A single jitted plan finishes
    in milliseconds, so the in-plan break the reference needs is moot
    here; the cascade's multi-attempt spend is where a budget bites
    (DESIGN §7 item 6)."""
    import time as _time

    base_cfg: OMGConfig = scene.cfg
    best = None
    attempts = 0
    t_begin = _time.time()

    def over_budget():
        return budget_s is not None and _time.time() - t_begin > budget_s

    try:
        for name in backends:
            if over_budget():
                break
            over = BACKENDS[name]
            if any(getattr(base_cfg, k) != v for k, v in over.items()):
                scene.cfg = base_cfg.replace(**over)
            else:
                scene.cfg = base_cfg
            res = scene.step(fast=fast)
            if res is None:  # IK FAIL on this backend's goal filtering
                continue
            attempts += 1
            if bool(np.asarray(res.flag)):
                return CascadeResult(res, name, attempts, True)
            if best is None or _fail_rank(res) < _fail_rank(best[0]):
                best = (res, name)
            # each attempt's returned goal_mask already accumulates its
            # input mask plus any in-plan blacklist rejections
            # (cfg.inplan_blacklist_step) — use it as the retry baseline
            # so waves never re-try goals the plan itself rejected
            mask = (np.asarray(res.goal_mask).copy()
                    if res.goal_mask is not None
                    else np.asarray(scene.goal_set.mask).copy())
            for _ in range(goal_retries):
                if over_budget():
                    break
                mask = goal_blacklist(scene.goal_set, mask, res.goal_idx)
                if not mask.any():
                    break
                res = scene.step(fast=fast, goal_mask=mask)
                if res is None:
                    break
                attempts += 1
                if bool(np.asarray(res.flag)):
                    return CascadeResult(res, name, attempts, True)
                if _fail_rank(res) < _fail_rank(best[0]):
                    best = (res, name)
                if res.goal_mask is not None:
                    mask &= np.asarray(res.goal_mask)
    finally:
        scene.cfg = base_cfg
        scene._sync_env_cfg()
    if best is None:
        return None
    return CascadeResult(best[0], best[1], attempts, False)


def plan_cascade_suite(scenes, base_cfg: OMGConfig,
                       backends: Sequence[str] = ("analytic", "exact"),
                       goal_retries: int = 3, chunk: int = 8,
                       model=None, pad_to=None, max_obj: int | None = None,
                       log=None):
    """Wave-pipelined cascade over many scenes (the suite/production form
    of :func:`plan_cascade`).

    Per backend, scenes are processed in chunks: every pending scene's
    staging + plan is dispatched asynchronously (problems stay alive
    across retries — a blacklist retry is a mask swap on the cached
    problem, no re-staging, no goal-set rebuild), then retry WAVES run:
    wave k re-plans every still-failing scene's k-th blacklist retry
    concurrently.  Device work for different scenes overlaps exactly like
    ``plan_pipelined``; the serial per-scene fallback (round-2 bench) paid
    staging + sync per attempt instead.

    ``chunk`` bounds device memory to O(chunk) staged problems (grid
    backends hold the padded SDF stacks of every in-flight scene).

    Returns {sid: SuiteCascadeOut}.
    """
    import jax
    import jax.numpy as jnp

    from ..models import panda
    from ..ops.sdf import AnalyticScene, stage_scene_sdfs
    from ..parallel.batch import pad_objects
    from .runner import _pack_fn, _plan_one, _unpack_flat

    scenes = list(scenes)
    if model is None:
        model = panda.load_panda(
            collision_point_num=base_cfg.collision_point_num)
    if max_obj is None:
        max_obj = max(len(s.env.objects) for _, s in scenes)
    if pad_to is None:
        shapes = np.array([o.sdf.shape for _, s in scenes
                           for o in s.env.objects])
        pad_to = tuple(shapes.max(axis=0)) if len(shapes) else None
    plan_one = _plan_one()

    import time as _time

    results: dict = {}
    attempts: dict = {sid: 0 for sid, _ in scenes}
    cached_problems: dict = {}
    pending = scenes
    try:
        for bi, name in enumerate(backends):
            _t_backend = _time.time()
            over = BACKENDS[name]
            if any(getattr(base_cfg, k) != v for k, v in over.items()):
                cfg_b = base_cfg.replace(**over)
            else:
                cfg_b = base_cfg
            still_failing = []
            for lo in range(0, len(pending), chunk):
                batch = pending[lo:lo + chunk]
                probs, handles = [], []
                for sid, sc in batch:
                    sc.cfg = cfg_b
                    sc._sync_env_cfg()
                    sc._staged = None
                    sc.env._scene_sdf = None
                    if not isinstance(sc.env.scene_sdf(), AnalyticScene):
                        sc.env._scene_sdf = stage_scene_sdfs(
                            [o.sdf for o in sc.env.objects],
                            baked=cfg_b.sdf_baked, pad_to=pad_to)
                    if bi > 0 and sid in cached_problems:
                        # fallback backends REUSE the first backend's goal
                        # set (IK is backend-independent; only the
                        # collision prune differs, and the plan re-checks
                        # collision every step + blacklist retries catch
                        # bad picks) — swapping the staged scene + learner
                        # field skips the whole goal-set IK rebuild, the
                        # dominant fallback cost
                        from ..parallel.batch import pad_scene

                        pr = cached_problems[sid]._replace(
                            scene=pad_scene(sc.env.scene_sdf(), max_obj),
                            world_potential=sc._world_potential())
                    else:
                        pr = pad_objects(
                            sc.build_problem(assume_goals=True), max_obj)
                        cached_problems[sid] = pr
                    probs.append(pr)
                    h = plan_one(model, cfg_b.jit_key(), pr)
                    # pack to ONE flat buffer + async copy: each fetched
                    # array pays a full tunnel round trip (see
                    # runner.plan_pipelined.dispatch — a raw PlanResult
                    # is ~23 fetches per scene)
                    packed = _pack_fn()(h, pr.goal_set.mask)
                    packed.copy_to_host_async()
                    handles.append((packed, (h.traj.shape,
                                             h.info.cost_traj.shape,
                                             pr.goal_set.mask.shape[0])))
                    attempts[sid] += 1
                masks = [None] * len(batch)
                live = list(range(len(batch)))
                for wave in range(goal_retries + 1):
                    fetched = [_unpack_flat(handles[i][0],
                                            *handles[i][1])[0]
                               for i in live]
                    redispatch = []
                    for i, res in zip(live, fetched):
                        sid, sc = batch[i]
                        gi = int(res.goal_idx)
                        out = SuiteCascadeOut(
                            flag=bool(res.flag), backend=name,
                            attempts=attempts[sid],
                            traj=np.asarray(res.traj), goal_idx=gi)
                        if out.flag:
                            results[sid] = out
                            continue
                        # keep the latest failed attempt as the fallback
                        # result (recency is a fine tie-break here)
                        if sid not in results or not results[sid].flag:
                            results[sid] = out
                        if wave == goal_retries:
                            redispatch.append((i, None))
                            continue
                        # baseline = the attempt's own final mask, which
                        # accumulates its input mask plus any in-plan
                        # blacklist rejections (see plan_cascade)
                        if res.goal_mask is not None:
                            rm = np.asarray(res.goal_mask)
                            masks[i] = (rm.copy() if masks[i] is None
                                        else masks[i] & rm)
                        elif masks[i] is None:
                            masks[i] = np.asarray(
                                probs[i].goal_set.mask).copy()
                        masks[i] = goal_blacklist(
                            probs[i].goal_set, masks[i], gi)
                        if not masks[i].any():
                            redispatch.append((i, None))
                            continue
                        redispatch.append((i, masks[i]))
                    live = []
                    for i, mask in redispatch:
                        sid, sc = batch[i]
                        if mask is None:
                            still_failing.append((sid, sc))
                            continue
                        gs_ = probs[i].goal_set
                        pr2 = probs[i]._replace(
                            goal_set=gs_._replace(mask=jnp.asarray(mask)))
                        h = plan_one(model, cfg_b.jit_key(), pr2)
                        packed = _pack_fn()(h, pr2.goal_set.mask)
                        packed.copy_to_host_async()
                        handles[i] = (packed, (h.traj.shape,
                                               h.info.cost_traj.shape,
                                               pr2.goal_set.mask.shape[0]))
                        attempts[sid] += 1
                        live.append(i)
                    if not live:
                        break
                # (the wave loop always drains: the final wave routes every
                # failure to still_failing, so nothing stays in flight)
                for sid, sc in batch:
                    sc.env._scene_sdf = None
            if log is not None:
                log(f"[cascade] backend={name}: {len(pending)} in, "
                    f"{len(still_failing)} still failing, "
                    f"{_time.time() - _t_backend:.1f}s")
            pending = still_failing
            if not pending:
                break
    finally:
        for sid, sc in scenes:
            sc.cfg = base_cfg
            sc._sync_env_cfg()
            sc.env._scene_sdf = None
    return results
