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

Measured on the 100-scene hard suite (v5e, round 2,
``docs/bench_r02_analytic.json``): analytic-only 0.70 success at 7.0
plans/s end-to-end; the cascade reaches **0.80** — above the exact
backend's own 0.79 — at 1.8 plans/s e2e (vs exact-alone's 1.11) because
only the ~30% FAIL verdicts pay the grid fallback.  Goal-set re-sampling retries
do NOT help: with fewer valid goals than ``goal_set_max_num`` the
Gumbel-top-k sample is the identity, so a re-keyed rebuild replans the
identical problem (measured: 0 of 30 failures recovered over 3 retries).

The reference has no counterpart — it plans once per scene with its one
CUDA backend (``omg/core.py:869-885``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from ..config import OMGConfig
from .scene import PlanningScene


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


def plan_cascade(scene: PlanningScene,
                 backends: Sequence[str] = ("analytic", "exact"),
                 fast: bool = True,
                 warm_start: bool = True) -> CascadeResult | None:
    """Plan ``scene`` escalating through ``backends`` until one verdict is
    SUCCESS; on total failure return the least-bad attempt by
    :func:`_fail_rank`.

    ``warm_start`` resumes each fallback from the previous attempt's final
    trajectory (``scene.step(traj_init=...)``) instead of re-solving from
    the spline init — the cheap backend's FAIL is usually *almost* valid
    (rounded-corner clearance or residual smoothing), so the exact grid
    finishes in a fraction of the optimization steps.

    Backend switches go through ``scene.cfg`` exactly like the task
    layer's explicit config overrides (``planner/tasks.py``): the staged
    caches key on ``cfg.jit_key()`` so each backend stages and compiles
    once (a backend whose fields already match the session cfg re-stages
    nothing), and the session cfg is restored afterwards.  Returns
    ``None`` only if every backend refused to plan (empty goal set — the
    IK-FAIL refusal path).  ``attempts`` counts backends that produced a
    plan; an IK-FAIL refusal skips to the next backend WITHOUT counting —
    the ``continue`` (not ``break``) matters because goal-set validity is
    collision-filtered against each backend's own SDF, so a stricter
    backend can still find valid goals."""
    base_cfg: OMGConfig = scene.cfg
    best = None
    attempts = 0
    warm = None
    try:
        for name in backends:
            over = BACKENDS[name]
            if any(getattr(base_cfg, k) != v for k, v in over.items()):
                scene.cfg = base_cfg.replace(**over)
            else:
                scene.cfg = base_cfg
            res = scene.step(fast=fast, traj_init=warm)
            if res is None:  # IK FAIL on this backend's goal filtering
                continue
            attempts += 1
            if bool(np.asarray(res.flag)):
                return CascadeResult(res, name, attempts, True)
            if warm_start:
                warm = np.asarray(res.traj)
            if best is None or _fail_rank(res) < _fail_rank(best[0]):
                best = (res, name)
    finally:
        scene.cfg = base_cfg
        scene._sync_env_cfg()
    if best is None:
        return None
    return CascadeResult(best[0], best[1], attempts, False)
