"""Resumable batch suite runner with a manifest + per-scene result shards.

The reference's evaluation is a serial loop printing verdicts
(``omg/core.py:869-885``); failures lose all progress.  This runner
persists a manifest (which scenes are done) and one ``.npz`` result shard
per scene (SURVEY §5.4's checkpoint/resume equivalent for batch planning).

Scenes stream one at a time through per-scene jitted plans: all scenes
share one padded SDF shape, so every program compiles once, and device
memory stays O(one scene) — the suite's stacks are ~100 MB+ each, and
``lax.map`` batching over big stacked scenes has additionally been
observed to abort the v5e backend (DESIGN.md §3b).  Besides the planner's
own verdict, each scene gets an execution-validation grade
(``planner/validate.py``: fine swept collision + grasp geometry + lift
clearance — the physics harness's failure modes, kinematically).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

from ..config import OMGConfig
from ..io import scene_io


@functools.lru_cache(maxsize=2)
def _plan_one():
    import jax

    from ..planner.plan import plan_fast

    return jax.jit(plan_fast, static_argnums=(1,))


#: CostInfo scalar fields in pack order (floats then bools), followed by
#: the PlanResult's own scalars.  See _pack_result/_unpack_result.
_SCALAR_FIELDS = (
    "cost", "obs", "smooth", "weighted_obs", "weighted_smooth",
    "grad_norm", "smooth_grad_norm", "obs_grad_norm", "collide", "reach",
    "terminate", "failure_terminate", "execute", "violate_limit")


@functools.lru_cache(maxsize=2)
def _pack_fn():
    """Device-side packing of a plan_fast result into ONE flat f32 array.

    A full PlanResult fetch touches ~23 distinct leaves and EVERY
    array's host copy pays a per-fetch tunnel round trip (round-3
    profile: device_get was 55-75% of the whole pipelined pass at ~23
    fetches; the round-5 profile showed the 4-array pack still spending
    80% of the pass in 4 x ~6 ms `_value` waits per scene).  One flat
    buffer = one fetch; the host slices it back into the identical
    numpy PlanResult (``_unpack_flat``)."""
    import jax
    import jax.numpy as jnp

    def pack(res, mask):
        info = res.info
        scalars = jnp.stack(
            [getattr(info, f).astype(jnp.float32) for f in _SCALAR_FIELDS]
            + [res.goal_idx.astype(jnp.float32),
               res.steps_used.astype(jnp.float32),
               res.flag.astype(jnp.float32)])
        masks = jnp.stack([
            mask,
            mask if res.goal_mask is None else res.goal_mask])
        return jnp.concatenate([
            res.traj.reshape(-1).astype(jnp.float32),
            info.cost_traj.reshape(-1).astype(jnp.float32),
            scalars,
            masks.reshape(-1).astype(jnp.float32)])

    return jax.jit(pack)


_N_SCALARS = len(_SCALAR_FIELDS) + 3


def _unpack_flat(flat, traj_shape, ct_shape, g):
    """Slice the packed buffer back into (traj, cost_traj, scalars,
    masks) and rebuild the result (shapes recorded at dispatch)."""
    flat = np.asarray(flat)
    nt = int(np.prod(traj_shape))
    nc = int(np.prod(ct_shape))
    traj = flat[:nt].reshape(traj_shape)
    cost_traj = flat[nt:nt + nc].reshape(ct_shape)
    scalars = flat[nt + nc:nt + nc + _N_SCALARS]
    masks = flat[nt + nc + _N_SCALARS:].reshape(2, g) > 0.5
    return _unpack_result(traj, cost_traj, scalars, masks)


def _unpack_result(traj, cost_traj, scalars, masks):
    """Rebuild the numpy-mapped (PlanResult, n_valid) a harvest returns."""
    from ..ops.chomp import CostInfo
    from ..planner.plan import PlanResult

    floats = [np.float32(scalars[i]) for i in range(10)]
    bools = [bool(scalars[10 + i]) for i in range(4)]
    info = CostInfo(*floats, *bools, cost_traj=cost_traj)
    goal_idx = np.int32(scalars[14])
    steps = np.int32(scalars[15])
    flag = bool(scalars[16])
    res = PlanResult(
        traj=traj, goal_idx=goal_idx, info=info, info_history=info,
        history=traj[None], selected_goals=np.asarray([goal_idx]),
        steps_used=steps, flag=flag, goal_mask=masks[1])
    return res, int(masks[0].sum())


def prebuild_goal_sets(scenes, cfg: OMGConfig, model, batch: int,
                       max_obj: int):
    """Stage goal sets for a list of (sid, PlanningScene) in vmapped waves
    of ``batch`` scenes — ONE device dispatch builds ``batch`` goal sets
    (measured 1.58x device-time win over per-scene builds on the v5e,
    docs/probe_vmap_build_r04.json; plans stay streamed per
    docs/probe_vmap_r04.json).  Each scene's ``_staged`` cache is filled
    so its later ``build_problem`` reuses the prebuilt set.

    Only analytic-backend, non-attached, default-goal scenes batch (grid
    scenes would stack ~100 MB SDF volumes per lane); ineligible scenes
    are left untouched and stage per-scene as before.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.sdf import AnalyticScene
    from ..parallel.batch import _pad_cost_params, pad_scene
    from .scene import _goal_set_batch_fn

    canon = cfg.jit_key()
    elig = []
    for sid, sc in scenes:
        sc._sync_env_cfg()
        if (sc.cfg.jit_key() != canon or not sc.cfg.goal_set_proj
                or sc.cfg.dynamic_timestep
                or getattr(sc, "_precomputed_goals", None) is not None
                or getattr(sc, "external_grasps", None) is not None
                or sc.env.target.attached
                or not isinstance(sc.env.scene_sdf(), AnalyticScene)):
            continue
        elig.append(sc)
    if len(elig) < 2:
        return
    poses_list = [sc.env.grasp_poses_world() for sc in elig]
    max_g = max(p.shape[0] for p in poses_list)
    fn = _goal_set_batch_fn(canon, False, False, bool(cfg.y_upsample))

    for lo in range(0, len(elig), batch):
        wave = elig[lo:lo + batch]
        stack = []
        for sc, poses in zip(wave, poses_list[lo:lo + batch]):
            sc.key, sub = jax.random.split(sc.key)
            pp = np.tile(np.eye(4, dtype=np.float32), (max_g, 1, 1))
            pp[:len(poses)] = poses
            va = np.zeros(max_g, bool)
            va[:len(poses)] = True
            o = len(sc.env.objects)
            stack.append((
                pad_scene(sc.env.scene_sdf(), max_obj),
                _pad_cost_params(sc.env.cost_params(), max_obj - o),
                jnp.asarray(pp), jnp.asarray(va),
                jnp.asarray(sc.start, jnp.float32), sub,
                jnp.asarray(sc.env.target.pose_mat[:3, 3], jnp.float32)))
        while len(stack) < batch:       # pad the tail wave: one compile,
            stack.append(stack[-1])     # padded lanes discarded below
        batched = jax.tree.map(lambda *a: jnp.stack(a), *stack)
        goal_sets, ends, trajs = fn(model, *batched)
        for i, sc in enumerate(wave):
            gset = jax.tree.map(lambda a: a[i], goal_sets)
            init = (ends[i], trajs[i])
            key = (sc.env.version, tuple(sc.start), sc.cfg.jit_key())
            sc._staged = (key, gset, init)
            sc._staged_init = init
            # consume-once marker: dispatch() normally WIPES _staged so a
            # fresh pipelined pass can't silently reuse a previous pass's
            # builds (bench honesty); the marker exempts exactly this
            # prebuilt set, and is cleared on use so retries rebuild
            sc._staged_fresh = True


def plan_pipelined(scenes, cfg: OMGConfig, model=None, depth: int = 4,
                   pad_to=None, max_obj: int | None = None,
                   build_batch: int = 0):
    """Pipelined suite execution: keep up to ``depth`` scenes' staging +
    plan dispatches in flight ahead of the harvest point, so scene k+1's
    host staging (goal-set dispatch, SDF synthesis) overlaps scene k's
    device work.  This IS the production path (VERDICT r2 item 5) — the
    round-2 bench measured the overlap with a bench-only loop while
    ``SuiteRunner``/``serve`` ran strictly serially.

    ``scenes``: iterable of (sid, PlanningScene).  Yields
    ``(sid, scene, result-or-None, wall_s)`` in order; ``result`` is the
    numpy-mapped PlanResult, ``None`` = empty goal set (the reference's
    IK-FAIL "planning not run" path).  ``wall_s`` is dispatch->ready and
    overlaps neighbors by design; per-scene latency is the serial
    number, this is throughput.

    ``depth`` bounds device memory to O(depth) staged scenes (the suite's
    grid stacks are ~100 MB+ each; keeping all 100 alive — like the old
    bench-only pass — only worked grid-free).  Transient TPU faults fall
    back to a serial retried re-plan of the affected scene; later in-flight
    work is re-dispatched.

    ``build_batch`` > 1 prebuilds goal sets in vmapped waves of that many
    scenes before the pipeline starts (:func:`prebuild_goal_sets`;
    measured 1.58x device-time win per build) — analytic scenes only;
    plans still stream (vmapped plans measured 5.7x WORSE,
    docs/probe_vmap_r04.json).
    """
    import jax

    from ..models import panda
    from ..ops.sdf import AnalyticScene, stage_scene_sdfs
    from ..parallel.batch import pad_objects
    from ..utils.timing import retry_transient

    scenes = list(scenes)
    if model is None:
        model = panda.load_panda(
            collision_point_num=cfg.collision_point_num)
    if pad_to is None and scenes:
        shapes = np.array([o.sdf.shape for _, s in scenes
                           for o in s.env.objects])
        pad_to = tuple(shapes.max(axis=0)) if len(shapes) else None
    if max_obj is None and scenes:
        max_obj = max(len(s.env.objects) for _, s in scenes)
    if build_batch > 1 and scenes:
        prebuild_goal_sets(scenes, cfg, model, build_batch, max_obj)
    plan_one = _plan_one()

    def dispatch(sc):
        t0 = time.time()
        if getattr(sc, "_staged_fresh", False):
            sc._staged_fresh = False  # consumed; a retry rebuilds
        else:
            sc._staged = None
        sc.env._scene_sdf = None
        if not isinstance(sc.env.scene_sdf(), AnalyticScene):
            sc.env._scene_sdf = stage_scene_sdfs(
                [o.sdf for o in sc.env.objects], baked=sc.cfg.sdf_baked,
                pad_to=pad_to)
        # assume_goals: the empty-goal-set check is deferred to harvest
        # (a host sync on the mask here would serialize the pipeline)
        problem = pad_objects(sc.build_problem(assume_goals=True), max_obj)
        res = plan_one(model, sc.cfg.jit_key(), problem)
        # pack the result into ONE flat device array (each fetched array
        # pays a full tunnel round trip — the 4-array pack still spent
        # 80% of the pass waiting on 4 x ~6 ms copies per scene) and
        # queue the device->host copy NOW — it runs after the plan
        # finishes, overlapping later scenes' device work
        packed = _pack_fn()(res, problem.goal_set.mask)
        packed.copy_to_host_async()
        shapes = (res.traj.shape, res.info.cost_traj.shape,
                  problem.goal_set.mask.shape[0])
        return (packed, shapes), t0

    def harvest(sid, sc, handle):
        (packed, shapes), t0 = handle
        try:
            res, n_valid = _unpack_flat(packed, *shapes)
        except Exception:
            # transient fault: the whole in-flight window may be poisoned;
            # re-run this scene serially with retries
            def rerun():
                (p2, sh2), _t2 = dispatch(sc)
                return _unpack_flat(p2, *sh2)

            res, n_valid = retry_transient(rerun, f"pipelined scene {sid}")
        sc.env._scene_sdf = None  # HBM discipline
        if sc.cfg.goal_set_proj and n_valid == 0:
            return None, time.time() - t0
        return res, time.time() - t0

    window: list = []
    for sid, sc in scenes:
        window.append((sid, sc, dispatch(sc)))
        if len(window) > depth:
            s0, sc0, h0 = window.pop(0)
            yield (s0, sc0) + harvest(s0, sc0, h0)
    for s0, sc0, h0 in window:
        yield (s0, sc0) + harvest(s0, sc0, h0)


class SuiteRunner:
    def __init__(self, out_dir: str, cfg: OMGConfig | None = None,
                 n_obstacles: int = 3, scene_source: str = "synthetic",
                 suite_dir: str | None = None, validate: bool = True):
        """``scene_source``: "synthetic" | "hard" | "npz" (pinned suite in
        ``suite_dir``)."""
        self.out_dir = out_dir
        self.cfg = cfg or OMGConfig(silent=True)
        self.n_obstacles = n_obstacles
        self.scene_source = scene_source
        self.suite_dir = suite_dir
        self.validate = validate
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.json")
        self.manifest = self._load_manifest()

    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"done": {}, "config": repr(self.cfg),
                "source": self.scene_source}

    def _save_manifest(self):
        with open(self.manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=1)

    def pending(self, scene_ids) -> list:
        return [s for s in scene_ids if str(s) not in self.manifest["done"]]

    def _make_scene(self, sid: int):
        from ..planner.scene import PlanningScene

        if self.scene_source == "hard":
            return PlanningScene.hard(self.cfg, scene_id=int(sid))
        if self.scene_source == "npz":
            return PlanningScene.from_npz(
                self.cfg,
                os.path.join(self.suite_dir, f"scene_{sid}.npz"))
        return PlanningScene.synthetic(
            self.cfg, scene_id=int(sid), n_obstacles=self.n_obstacles)

    def run(self, scene_ids=range(100), pipeline_depth: int = 4) -> dict:
        """Plan all pending scenes; resume-safe.

        Execution is pipelined through :func:`plan_pipelined`
        (``pipeline_depth`` dispatches in flight): host staging of the
        next scenes overlaps device work, so suite throughput ~= the
        bench's ``pipelined_plans_per_s``, not the serial e2e rate.
        ``pipeline_depth=1`` restores strictly serial execution (one in
        flight; per-scene walls then measure true request latency)."""
        from ..models import panda
        from .validate import validate_execution

        pending = self.pending(scene_ids)
        model = panda.load_panda(
            collision_point_num=self.cfg.collision_point_num)
        wins = sum(v["success"] for v in self.manifest["done"].values())
        exec_wins = sum(v.get("exec_valid", False)
                        for v in self.manifest["done"].values())

        scenes = [(sid, self._make_scene(sid)) for sid in pending]

        for sid, sc, res, dt in plan_pipelined(
                scenes, self.cfg, model=model,
                depth=max(1, pipeline_depth)):
            if res is None:
                rec = {"success": False, "steps": 0, "no_goals": True,
                       "exec_valid": False, "wall_s": 0.0}
                self.manifest["done"][str(sid)] = rec
                self._save_manifest()
                continue

            report = None
            if self.validate:
                report = validate_execution(sc, res.traj)
                exec_wins += report.valid
            ok = bool(res.flag)
            wins += ok
            shard_info = {
                "success": ok, "steps": int(res.steps_used),
                "collide": float(res.info.collide),
                "smooth": float(res.info.smooth),
                "reach": float(res.info.reach)}
            if report is not None:
                shard_info.update(report.to_dict())
            scene_io.save_result_shard(
                os.path.join(self.out_dir, f"scene_{sid}.npz"),
                int(sid), res.traj, shard_info)
            rec = {"success": ok, "steps": int(res.steps_used),
                   "wall_s": round(dt, 3)}
            if report is not None:
                rec["exec_valid"] = bool(report.valid)
            self.manifest["done"][str(sid)] = rec
            self._save_manifest()
            sc.env._scene_sdf = None
            if not self.cfg.silent:
                extra = (f" exec={report.valid}" if report else "")
                print(f"scene {sid}: {dt:.2f}s success={ok}{extra} "
                      f"cumulative {wins}/{len(self.manifest['done'])}")
        out = {"success": wins, "total": len(self.manifest["done"])}
        if self.validate:
            out["exec_valid"] = exec_wins
        return out
