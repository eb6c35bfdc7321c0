"""Host-side scene/session layer: Env, PlanningScene.

The reference's ``Env``/``PlanningScene`` (``omg/core.py:243-779``) own
torch-CUDA SDF stacks and a mutable global config; here the Env is a thin
host container that *stages* static-shape device inputs (SceneSDF stack,
CostParams, GoalSet, PlanProblem) and the PlanningScene runs the jitted plan
program.  Scene edits (add/remove/update-pose/attach) invalidate the staged
arrays and restage on the next plan — the device never sees python objects.
"""

from __future__ import annotations

import functools
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OMGConfig
from ..io.assets import (DEFAULT_END, DEFAULT_START, SceneObject,
                         synthetic_tabletop_scene)
from ..models import panda
from ..ops.chomp import CostParams, GoalSet
from ..ops.sdf import (SceneSDF, WorldPotential, bake_world_potential,
                       stage_scene_sdfs)
from . import goal_set as gs
from . import plan as plan_mod

class Env:
    """Scene container (reference ``Env``, ``omg/core.py:243-411``)."""

    def __init__(self, cfg: OMGConfig, model: panda.PandaModel | None = None):
        self.cfg = cfg
        self.model = model if model is not None else panda.load_panda(
            collision_point_num=cfg.collision_point_num)
        self.objects: List[SceneObject] = []
        self.target_idx = 0
        self._scene_sdf: SceneSDF | None = None
        self.version = 0  # bumped on every edit; staged-state invalidation

    # -- edits ------------------------------------------------------------
    def add_object(self, obj: SceneObject):
        self.objects.append(obj)
        self._scene_sdf = None
        self.version += 1

    def remove_object(self, name: str):
        idx = self.names.index(name)
        del self.objects[idx]
        if idx == self.target_idx:
            self.target_idx = 0
        elif idx < self.target_idx:
            self.target_idx -= 1
        if self.target_idx >= len(self.objects):
            self.target_idx = 0
        self._scene_sdf = None
        self.version += 1

    def clear(self):
        self.objects = []
        self._scene_sdf = None
        self.version += 1

    def set_target(self, name: str):
        self.target_idx = self.names.index(name)
        self.objects[self.target_idx].compute_grasp = True
        self.version += 1

    def update_pose(self, name: str, pose_mat: np.ndarray):
        self.objects[self.names.index(name)].update_pose(pose_mat)
        self.version += 1

    def add_table(self, trans, extents=(1.0, 1.6, 0.36), delta=0.02):
        """Convenience: a box table (reference ``Env.add_table``,
        ``omg/core.py:294-306``)."""
        from ..io.assets import make_primitive, pose_at
        self.add_object(make_primitive(
            "table", "box", list(extents), pose_at(trans),
            compute_grasp=False, delta=delta))

    def add_plane(self, z: float = 0.0):
        """Convenience: the floor, collision-disabled by name (reference
        ``Env.add_plane``; 'floor' is skipped in the cost layer,
        ``omg/cost.py:311``)."""
        from ..io.assets import make_primitive, pose_at
        self.add_object(make_primitive(
            "floor", "box", [3.0, 3.0, 0.02], pose_at([0, 0, z - 0.01]),
            compute_grasp=False, delta=0.05))

    @property
    def names(self):
        return [o.name for o in self.objects]

    @property
    def target(self) -> SceneObject:
        return self.objects[self.target_idx]

    # -- staging ----------------------------------------------------------
    def scene_sdf(self) -> SceneSDF:
        if self._scene_sdf is None:
            # all-analytic scenes skip voxel grids entirely: collision
            # queries evaluate the true primitive SDF + closed-form
            # gradient (ops/sdf.py::AnalyticScene) — ~13 floats/object of
            # staging, zero gathers in the hot loop.  Otherwise synthesize
            # the padded stack (and the baked gradient channels) ON DEVICE
            # in one dispatch (ops/sdf.py::stage_scene_sdfs).
            if self.cfg.sdf_analytic:
                from ..ops.sdf import make_analytic_scene
                self._scene_sdf = make_analytic_scene(
                    [o.sdf for o in self.objects])
            if self._scene_sdf is None:
                self._scene_sdf = stage_scene_sdfs(
                    [o.sdf for o in self.objects], baked=self.cfg.sdf_baked)
        return self._scene_sdf

    def cost_params(self) -> CostParams:
        """Marshal per-object collision parameters
        (reference ``Cost.compute_obstacle_cost_layer``,
        ``omg/cost.py:299-335``).  Cached per (env version, cfg): staging
        calls this 3x per problem build (goal set, learner field, problem)
        and each rebuild re-pays six host->device transfers."""
        cfg = self.cfg
        cached = getattr(self, "_cost_params_cache", None)
        key = (self.version, cfg.jit_key())
        if cached is not None and cached[0] == key:
            return cached[1]
        params = self._cost_params(cfg)
        self._cost_params_cache = (key, params)
        return params

    def _cost_params(self, cfg) -> CostParams:
        n = len(self.objects)
        inv_poses = np.zeros((n, 4, 4), np.float32)
        eps = np.full(n, cfg.epsilon, np.float32)
        pad = np.ones(n, np.float32)
        clear = np.full(n, cfg.clearance, np.float32)
        disab = np.zeros(n, np.float32)
        for i, o in enumerate(self.objects):
            inv_poses[i] = np.linalg.inv(o.pose_mat)
            if o.name == "floor" or o.name in cfg.disable_collision_set:
                disab[i] = 1.0
            if i == self.target_idx:
                clear[i] = cfg.target_clearance
                eps[i] = cfg.target_epsilon
        if self.target.attached:
            # placement: soften the support surface (cost.py:325-328; the
            # reference hard-codes "the last object is the table" — we
            # soften objects named like supports, falling back to the last)
            support = [i for i, o in enumerate(self.objects)
                       if o.name.split("_")[0] in
                       ("table", "shelf", "support", "floor")]
            for i in support or [n - 1]:
                clear[i] = 0.0
                eps[i] = 0.05
                pad[i] = 0.5
        return CostParams(
            inv_poses=jnp.asarray(inv_poses), epsilons=jnp.asarray(eps),
            padding_scales=jnp.asarray(pad), clearances=jnp.asarray(clear),
            disables=jnp.asarray(disab),
            target_idx=jnp.asarray(self.target_idx))

    def grasp_poses_world(self) -> np.ndarray:
        """Target grasp DB transformed to world (``omg/planner.py:319-322``),
        with z/y upsampling for placement/antipodal tilts."""
        t = self.target
        if t.attached:
            # placement: the hand pose in the object frame is
            # inv(rel_hand_pose); composed with the object's (placement)
            # pose exactly like grasp-DB poses (planner.py:496-498 +
            # obj_coord=True composition at planner.py:319-321)
            poses = t.pose_mat[None] @ np.linalg.inv(t.rel_hand_pose)[None]
        else:
            poses = t.pose_mat[None] @ t.grasps_poses
        return poses


class PointEnv(Env):
    """Perception-mode environment: one SDF built from an observed point
    cloud (reference ``PointEnv``, ``omg/core.py:413-457``)."""

    def compute_sdf_from_points(self, points: np.ndarray,
                                resolution: float = 0.02,
                                margin: float = 0.24):
        from ..io.assets import SceneObject
        from ..ops.pointsdf import sdf_from_points

        sdf = sdf_from_points(points, resolution=resolution, margin=margin)
        obj = SceneObject("env_points", sdf, np.eye(4), target=True,
                          compute_grasp=False)
        self.objects = [obj]
        self.target_idx = 0
        self._scene_sdf = None


_hand_pose_jit = jax.jit(panda.hand_pose)
_hand_pose_batch_jit = jax.jit(panda.hand_pose_batch)


@functools.lru_cache(maxsize=64)
def _plan_fn(cfg: OMGConfig, fast: bool):
    """Jitted planner for a canonical cfg (pass ``cfg.jit_key()``).

    Module-level so every PlanningScene with equivalent planner settings
    shares one compiled program, and host-only flag flips
    (silent/report_*/paths) can never trigger a recompile (the cache key
    and the closed-over cfg are both the canonical form)."""
    fn = plan_mod.plan_fast if fast else plan_mod.plan
    return jax.jit(lambda model, problem: fn(model, cfg, problem))


@functools.lru_cache(maxsize=64)
def _bake_wp_fn(cfg: OMGConfig):
    def f(scene_sdf, params):
        return bake_world_potential(
            scene_sdf, params.inv_poses, params.epsilons,
            params.padding_scales, params.clearances, params.disables,
            resolution=cfg.world_potential_resolution)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _bake_wp_analytic_fn(cfg: OMGConfig):
    """Gather-free learner-field bake for analytic-primitive scenes (the
    nearest-cell grid read is re-derived as an analytic eval at the
    snapped cell center — ops/sdf.py::bake_world_potential_analytic)."""
    from ..ops.sdf import bake_world_potential_analytic

    def f(kinds, halfs, penals, limits, dims_actual, params):
        return bake_world_potential_analytic(
            kinds, halfs, penals, limits, params.inv_poses,
            params.epsilons, params.padding_scales, params.disables,
            dims_actual, resolution=cfg.world_potential_resolution,
            snap=False)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _bake_wf_fn(cfg: OMGConfig):
    from ..ops.sdf import BakedSceneSDF, bake_scene, bake_world_field

    def f(scene_sdf, params):
        if not isinstance(scene_sdf, BakedSceneSDF):
            scene_sdf = bake_scene(scene_sdf)
        return bake_world_field(
            scene_sdf, params.inv_poses, params.epsilons,
            params.padding_scales, params.clearances, params.disables,
            resolution=cfg.world_field_resolution)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _bake_wf_analytic_fn(cfg: OMGConfig):
    """Gather-free fused-field bake for analytic-primitive scenes
    (ops/sdf.py::bake_world_field_analytic)."""
    from ..ops.sdf import bake_world_field_analytic

    def f(kinds, halfs, penals, limits, dims_actual, params):
        return bake_world_field_analytic(
            kinds, halfs, penals, limits, params.inv_poses,
            params.epsilons, params.padding_scales, params.clearances,
            params.disables, dims_actual,
            resolution=cfg.world_field_resolution, snap=False)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _goal_init_fn(cfg: OMGConfig):
    """Goal policy + spline init fused into one dispatch (pass
    ``cfg.jit_key()``): eager ops pay a network round trip each on the
    remote-TPU tunnel."""

    def f(goal_set, start):
        gi = gs.goal_idx_policy(cfg, goal_set, start)
        end = goal_set.grasps[gi]
        return gi, end, plan_mod.init_trajectory(cfg, start, end)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _init_traj_fn(cfg: OMGConfig):
    return jax.jit(lambda s, e: plan_mod.init_trajectory(cfg, s, e))


@functools.lru_cache(maxsize=64)
def _goal_set_fn(cfg: OMGConfig, attached: bool, z_up: bool, y_up: bool):
    """Jitted goal-set builder for a (cfg, attachment) mode.

    Also returns the initial-goal choice and the spline init (reference
    ``grasp_init``, ``planner.py:188-223``) so a fresh scene stages with
    ONE device dispatch instead of two — on the remote-TPU tunnel every
    dispatch is a network round trip."""

    def f(model, scene_sdf, params, poses, start, key, obj_pos):
        if z_up:
            poses = gs.z_upsample_poses(poses, obj_pos)
        if y_up:
            poses = gs.y_upsample_poses(poses)
        valid = jnp.ones(poses.shape[0], bool)
        goal_set = gs.build_goal_set(model, cfg, scene_sdf, params, poses,
                                     valid, start, key, attached=attached,
                                     obj_pos=obj_pos)
        gi = gs.goal_idx_policy(cfg, goal_set, start)
        end = goal_set.grasps[gi]
        return goal_set, end, plan_mod.init_trajectory(cfg, start, end)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _plan_fresh_fn(cfg: OMGConfig, attached: bool, z_up: bool, y_up: bool):
    """Goal-set build + initial goal + spline + the FULL plan as ONE
    device dispatch (pass ``cfg.jit_key()``).

    The serve fresh-request path otherwise pays two dispatch+execute
    cycles on the remote tunnel (~30 ms each: build, then plan); fusing
    them halves the round trips — device time is unchanged (the two
    programs were measured back-to-back ≈ the fused program,
    docs/probe_pipeline_fetch_r05.json)."""

    def f(model, scene_sdf, params, poses, start, key, obj_pos,
          lo, hi, wp, wf):
        if z_up:
            poses = gs.z_upsample_poses(poses, obj_pos)
        if y_up:
            poses = gs.y_upsample_poses(poses)
        valid = jnp.ones(poses.shape[0], bool)
        goal_set = gs.build_goal_set(model, cfg, scene_sdf, params, poses,
                                     valid, start, key, attached=attached,
                                     obj_pos=obj_pos)
        gi = gs.goal_idx_policy(cfg, goal_set, start)
        end = goal_set.grasps[gi]
        traj0 = plan_mod.init_trajectory(cfg, start, end)
        problem = plan_mod.PlanProblem(
            start=start, end=end, traj_init=traj0, goal_set=goal_set,
            scene=scene_sdf, cost_params=params, joint_lower=lo,
            joint_upper=hi, world_potential=wp, world_field=wf)
        res = plan_mod.plan_fast(model, cfg, problem)
        return goal_set, end, traj0, res

    return jax.jit(f)


@functools.lru_cache(maxsize=16)
def _goal_set_batch_fn(cfg: OMGConfig, attached: bool, z_up: bool,
                       y_up: bool):
    """Vmapped :func:`_goal_set_fn` over a stacked scene batch, with a
    per-scene grasp-validity mask so scenes with different grasp-DB sizes
    pad to one static shape.  Measured 1.58x device-time win over
    per-scene builds on the v5e (docs/probe_vmap_build_r04.json) — unlike
    vmapped PLANS, which lose 5.7x (docs/probe_vmap_r04.json): the build
    is fixed-iteration batched Newton with no early-exit lockstep to
    forfeit.  Used by ``runner.prebuild_goal_sets``."""

    def f(model, scene_sdf, params, poses, valid, start, key, obj_pos):
        if z_up:
            bins = 50
            poses = gs.z_upsample_poses(poses, obj_pos, bins=bins)
            valid = jnp.repeat(valid, bins)
        if y_up:
            bins = 10
            poses = gs.y_upsample_poses(poses, bins=bins)
            valid = jnp.repeat(valid, bins)
        goal_set = gs.build_goal_set(model, cfg, scene_sdf, params, poses,
                                     valid, start, key, attached=attached,
                                     obj_pos=obj_pos)
        gi = gs.goal_idx_policy(cfg, goal_set, start)
        end = goal_set.grasps[gi]
        return goal_set, end, plan_mod.init_trajectory(cfg, start, end)

    return jax.jit(jax.vmap(f, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)))


class PlanningScene:
    """Session owning an Env + jitted planner (reference ``PlanningScene``,
    ``omg/core.py:459-779``, minus the GL renderer)."""

    def __init__(self, cfg: OMGConfig, env: Env | None = None,
                 seed: int = 233):
        self.cfg = cfg
        if env is None:
            # use_point_sdf selects the perception-mode environment
            # (reference core.py:468)
            env = PointEnv(cfg) if cfg.use_point_sdf else Env(cfg)
        self.env = env
        self.model = self.env.model
        self.start = np.array(DEFAULT_START)
        self.end = np.array(DEFAULT_END)
        self.key = jax.random.PRNGKey(seed)
        self.history_trajectories: list[np.ndarray] = []
        self.info = None
        self.goal_set: GoalSet | None = None
        # external grasp poses (world panda_hand frames) override the grasp
        # DB, e.g. detector outputs in perception mode
        # (reference ``load_goal_from_external``, ``omg/planner.py:176-186``)
        self.external_grasps: np.ndarray | None = None

    @classmethod
    def _from_objects(cls, cfg: OMGConfig, objects, target):
        env = Env(cfg)
        for o in objects:
            env.add_object(o)
        env.set_target(target)
        return cls(cfg, env)

    @classmethod
    def synthetic(cls, cfg: OMGConfig, scene_id: int = 0, **kw):
        objects, target = synthetic_tabletop_scene(scene_id, **kw)
        return cls._from_objects(cfg, objects, target)

    @classmethod
    def hard(cls, cfg: OMGConfig, scene_id: int = 0, **kw):
        """Difficulty-calibrated scene (clutter/shelf/far families with
        settle-and-reject placement; see ``io/scene_gen.py``)."""
        from ..io.scene_gen import synthetic_hard_scene
        objects, target = synthetic_hard_scene(scene_id, **kw)
        return cls._from_objects(cfg, objects, target)

    @classmethod
    def from_npz(cls, cfg: OMGConfig, path: str):
        """Scene from a pinned ``.npz`` artifact (the committed benchmark
        suite under ``data/suite_v2/``, or any exported scene)."""
        from ..io.scene_io import load_npz_scene, objects_from_npz
        objects, target = objects_from_npz(load_npz_scene(path))
        return cls._from_objects(cfg, objects, target)

    def set_precomputed_goals(self, goals: np.ndarray,
                              reach_grasps: np.ndarray | None = None):
        """Use precomputed goal configurations from a scene file instead of
        grasp-DB IK (reference ``load_goal_from_scene``,
        ``omg/planner.py:155-174``; standoff is off in that mode)."""
        g = self.cfg.goal_set_max_num
        n = min(len(goals), g)
        grasps = np.zeros((g, 9), np.float32)
        grasps[:n] = goals[:n]
        if reach_grasps is None:
            tails = np.repeat(grasps[:, None, :],
                              self.cfg.reach_tail_length, axis=1)
        else:
            tails = np.zeros((g, self.cfg.reach_tail_length, 9), np.float32)
            tails[:n] = reach_grasps[:n]
        mask = np.zeros(g, bool)
        mask[:n] = True
        self._precomputed_goals = GoalSet(
            grasps=jnp.asarray(grasps), reach_grasps=jnp.asarray(tails),
            mask=jnp.asarray(mask), potentials=jnp.zeros(g))

    def _sync_env_cfg(self):
        """Env staging (cost_params, sdf baking) must see the session's
        cfg — task-layer overrides (collision-disable lists, standoff mode)
        replace ``self.cfg`` (the reference mutates one global instead).
        Staged SDFs are invalidated only when a device-relevant field
        actually changed (``jit_key``): a value-equal replacement (e.g. the
        cascade re-selecting the session's own backend) must not re-pay a
        voxel re-synthesis."""
        if self.env.cfg is not self.cfg:
            invalidate = self.env.cfg.jit_key() != self.cfg.jit_key()
            self.env.cfg = self.cfg
            if invalidate:
                self.env._scene_sdf = None

    # -- staging ----------------------------------------------------------
    def build_goal_set(self) -> GoalSet:
        """Goal-set construction as ONE jitted device call (the reference
        pays process-pool pickling here; eager dispatch would pay a network
        round trip per op on remote TPU pools)."""
        self._sync_env_cfg()
        cfg = self.cfg
        env = self.env
        t = env.target
        if self.external_grasps is not None:
            poses = np.asarray(self.external_grasps)
        else:
            poses = env.grasp_poses_world()
        self.key, sub = jax.random.split(self.key)
        fn = _goal_set_fn(cfg.jit_key(), bool(t.attached),
                          bool(t.attached and cfg.z_upsample),
                          bool(cfg.y_upsample and not t.attached))
        t0 = time.time()
        goal_set, end0, traj0 = fn(
            self.model, env.scene_sdf(), env.cost_params(),
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(self.start, jnp.float32), sub,
            jnp.asarray(t.pose_mat[:3, 3], jnp.float32))
        # initial goal + spline ride the same dispatch; build_problem
        # reuses them through the staged cache
        self._staged_init = (end0, traj0)
        if not cfg.silent:
            n_valid = int(goal_set.mask.sum())
            # parity with the reference's IK-init report (planner.py:445-454)
            # reference prints a single count (planner.py:445-454); a
            # "/n_poses" denominator misleads once flip augmentation
            # doubles the candidate lanes
            print(f"{t.name} IK init time: {time.time()-t0:.3f}, "
                  f"goal set num: {n_valid}")
            if n_valid == 0:
                print(f"{t.name} IK FAIL")
        return goal_set

    def has_staged(self) -> bool:
        """True when the staged goal-set cache matches the current
        (env version, start, cfg) — a repeat request re-plans off it
        with no staging work."""
        staged = getattr(self, "_staged", None)
        return (staged is not None
                and staged[0] == (self.env.version, tuple(self.start),
                                  self.cfg.jit_key()))

    def plan_fresh(self):
        """Fresh-scene fast path: goal-set build + init + FULL plan in
        ONE device dispatch (``_plan_fresh_fn``), halving the fresh
        request's tunnel round trips vs build-then-plan.  Fills the
        staged cache so subsequent requests take the repeat path.
        Returns ``(result, goal_mask)`` device handles (the caller
        harvests), or ``None`` when this scene needs the general path
        (dynamic horizon, external/precomputed goals, goal-set off)."""
        self._sync_env_cfg()
        cfg = self.cfg
        env = self.env
        if (cfg.dynamic_timestep or not cfg.goal_set_proj
                or getattr(self, "_precomputed_goals", None) is not None
                or self.external_grasps is not None):
            return None
        t = env.target
        poses = env.grasp_poses_world()
        self.key, sub = jax.random.split(self.key)
        fn = _plan_fresh_fn(cfg.jit_key(), bool(t.attached),
                            bool(t.attached and cfg.z_upsample),
                            bool(cfg.y_upsample and not t.attached))
        lo, hi = self.model.soft_limits(cfg.soft_joint_limit_padding)
        goal_set, end0, traj0, res = fn(
            self.model, env.scene_sdf(), env.cost_params(),
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(self.start, jnp.float32), sub,
            jnp.asarray(t.pose_mat[:3, 3], jnp.float32),
            lo, hi, self._world_potential(), self._world_field())
        key = (env.version, tuple(self.start), cfg.jit_key())
        self._staged = (key, goal_set, (end0, traj0))
        self.goal_set = goal_set
        return res, goal_set.mask

    def build_problem(self, goal_set: GoalSet | None = None,
                      assume_goals: bool = False) -> plan_mod.PlanProblem:
        """``assume_goals=True`` skips the one host sync (the empty-goal-set
        check) so a caller can PIPELINE many scenes' staging + plans as
        pure async dispatches; the caller owns detecting empty goal sets
        from ``goal_set.mask`` when results come back."""
        self._sync_env_cfg()
        cfg = self.cfg
        env = self.env
        start = jnp.asarray(self.start, jnp.float32)
        end = jnp.asarray(self.end, jnp.float32)
        fused_init = None  # (end, traj0) riding the goal-set dispatch
        cached_n_valid = None
        if cfg.goal_set_proj:
            if goal_set is None and getattr(self, "_precomputed_goals",
                                            None) is not None:
                goal_set = self._precomputed_goals
            if goal_set is None:
                staged = getattr(self, "_staged", None)
                key = (env.version, tuple(self.start), cfg.jit_key())
                if staged is not None and staged[0] == key:
                    goal_set, fused_init = staged[1], staged[2]
                    # valid-goal count rides the staged cache: the
                    # host-side mask.sum() below costs one tunnel round
                    # trip per request otherwise (serve p50)
                    cached_n_valid = staged[3] if len(staged) > 3 else None
                else:
                    goal_set = self.build_goal_set()
                    fused_init = getattr(self, "_staged_init", None)
                    self._staged = (key, goal_set, fused_init)
        else:
            g = cfg.goal_set_max_num
            goal_set = GoalSet(
                grasps=jnp.zeros((g, 9)),
                reach_grasps=jnp.zeros((g, cfg.reach_tail_length, 9)),
                mask=jnp.zeros(g, bool), potentials=jnp.zeros(g))
        self.goal_set = goal_set

        # initial goal + trajectory (grasp_init, planner.py:188-223)
        if assume_goals and cfg.goal_set_proj:
            self._n_valid_goals = -1  # unknown: caller checks the mask
            have_goals = True
        else:
            if cached_n_valid is not None:
                self._n_valid_goals = cached_n_valid
            else:
                self._n_valid_goals = int(goal_set.mask.sum())  # device sync
                if (getattr(self, "_staged", None) is not None
                        and len(self._staged) == 3
                        and self._staged[1] is goal_set):
                    self._staged = self._staged + (self._n_valid_goals,)
            have_goals = cfg.goal_set_proj and self._n_valid_goals > 0
        if have_goals and not cfg.dynamic_timestep:
            if fused_init is not None:
                # goal policy + spline init rode the goal-set dispatch
                end, traj0 = fused_init
            else:
                # external/precomputed goal sets: one fused device program
                # (each eager op costs a tunnel round trip on remote TPU)
                _, end, traj0 = _goal_init_fn(cfg.jit_key())(goal_set, start)
        else:
            if have_goals:
                if fused_init is not None:
                    end = fused_init[0]
                else:
                    gi = gs.goal_idx_policy(cfg, goal_set, start)
                    end = goal_set.grasps[gi]
            if cfg.dynamic_timestep:
                # horizon from start-goal distance (core.py:64-75); changes
                # the static T -> per-T jit cache entry; needs `end` on host
                t_dyn = cfg.dynamic_timesteps(self.start, np.asarray(end))
                if t_dyn != cfg.timesteps:
                    cfg = cfg.replace(timesteps=t_dyn)
                    self.cfg = cfg
            traj0 = _init_traj_fn(cfg.jit_key())(
                jnp.asarray(start), jnp.asarray(end))
        lo, hi = self.model.soft_limits(cfg.soft_joint_limit_padding)
        return plan_mod.PlanProblem(
            start=start, end=end, traj_init=traj0, goal_set=goal_set,
            scene=env.scene_sdf(), cost_params=env.cost_params(),
            joint_lower=lo, joint_upper=hi,
            world_potential=self._world_potential(),
            world_field=self._world_field())

    def _world_field(self):
        """Scene-fused CHOMP collision field (cfg.sdf_fused), cached per
        env version like the learner's scoring field."""
        cfg = self.cfg
        if not cfg.sdf_fused:
            return None
        from ..ops.sdf import AnalyticScene
        if isinstance(self.env.scene_sdf(), AnalyticScene):
            # the grid-free analytic backend strictly dominates the fused
            # field (exact values, no bake); sdf_fused only applies to
            # data-backed scenes
            return None
        cached = getattr(self, "_wf_cache", None)
        wf_key = (self.env.version, cfg.jit_key())
        if cached is not None and cached[0] == wf_key:
            return cached[1]
        from ..ops.sdf import analytic_prim_arrays
        params = self.env.cost_params()
        prims = analytic_prim_arrays([o.sdf for o in self.env.objects])
        if prims is not None:
            kinds, halfs, pens, _, _, dims_act, limits, _ = prims
            wf = _bake_wf_analytic_fn(cfg.jit_key())(
                kinds, halfs, pens, jnp.asarray(limits), dims_act, params)
        else:
            wf = _bake_wf_fn(cfg.jit_key())(self.env.scene_sdf(), params)
        self._wf_cache = (wf_key, wf)
        return wf

    def _world_potential(self) -> WorldPotential:
        """Scene-fused learner scoring field, cached per env version.

        Under ``sdf_fused`` the learner field is a VIEW of the CHOMP world
        field's potential channel — one bake serves both consumers."""
        cfg = self.cfg
        from ..ops.sdf import AnalyticScene
        analytic = isinstance(self.env.scene_sdf(), AnalyticScene)
        if analytic or not (cfg.learner_world_potential
                            and cfg.goal_set_proj):
            # analytic scenes: the learner sweep evaluates the true SDF
            # directly (ops/learner.py::cost_vector_raw) — no scoring field
            return WorldPotential(
                data=jnp.zeros((2, 2, 2)),
                origin=jnp.zeros(3), delta=jnp.asarray(1.0))
        if cfg.sdf_fused:
            wf = self._world_field()
            return WorldPotential(data=wf.data5[..., 0], origin=wf.origin,
                                  delta=wf.delta)
        cached = getattr(self, "_wp_cache", None)
        wp_key = (self.env.version, cfg.jit_key())
        if cached is not None and cached[0] == wp_key:
            return cached[1]
        from ..ops.sdf import analytic_prim_arrays
        params = self.env.cost_params()
        prims = analytic_prim_arrays([o.sdf for o in self.env.objects])
        if prims is not None:
            kinds, halfs, pens, _, _, dims_act, limits, _ = prims
            wp = _bake_wp_analytic_fn(cfg.jit_key())(
                kinds, halfs, pens, jnp.asarray(limits), dims_act, params)
        else:
            wp = _bake_wp_fn(cfg.jit_key())(self.env.scene_sdf(), params)
        self._wp_cache = (wp_key, wp)
        return wp

    # -- planning ---------------------------------------------------------
    def _get_plan_fn(self, fast: bool):
        return _plan_fn(self.cfg.jit_key(), fast)

    def step(self, fast: bool = False,
             traj_init: np.ndarray | None = None,
             goal_mask: np.ndarray | None = None) -> plan_mod.PlanResult:
        """One full plan (reference ``PlanningScene.step``,
        ``omg/core.py:694-699``).

        ``traj_init`` warm-starts the optimization from a given [T, 9]
        trajectory instead of the start->goal spline (sets
        ``cfg.warm_start_init`` so the learner-init respline is skipped —
        without that the init is discarded, measured in
        ``docs/diag_fails_r03.json``).

        ``goal_mask`` overrides the goal set's validity mask — the
        cascade's goal-blacklist retries exclude a failed attempt's goal
        neighborhood and re-plan (pure data change: same staged problem,
        same compiled program)."""
        problem = self.build_problem()
        # read cfg AFTER build_problem: dynamic_timestep re-derives the
        # horizon there and replaces self.cfg (core.py:64-75)
        cfg = self.cfg
        if traj_init is not None and not cfg.warm_start_init:
            cfg = cfg.replace(warm_start_init=True)
        if traj_init is not None:
            ti = jnp.asarray(traj_init, jnp.float32)
            problem = problem._replace(traj_init=ti, end=ti[-1])
        n_valid = self._n_valid_goals
        if goal_mask is not None:
            gm = np.asarray(goal_mask, bool)
            problem = problem._replace(goal_set=problem.goal_set._replace(
                mask=jnp.asarray(gm)))
            n_valid = int(gm.sum())
        if cfg.goal_set_proj and n_valid == 0:
            if not cfg.silent:
                print("planning not run... (empty goal set)")
            return None
        if cfg.report_time:
            print(f"goal set num: {n_valid}")
        t0 = time.time()
        result = _plan_fn(cfg.jit_key(), fast)(self.model, problem)
        result = jax.tree.map(lambda x: np.asarray(x), result)
        if not self.cfg.silent:
            verdict = ("SUCCESS BE GENTLE" if bool(result.flag)
                       else "FAIL DONT EXECUTE")
            print(f"planning time: {time.time()-t0:.3f} PLAN {verdict} "
                  f"Length: {len(result.traj)}")
        self.history_trajectories = list(result.history)
        self.info = result
        if self.cfg.report_cost and result.info_history is not None:
            self.report_cost(result)
        return result

    def report_cost(self, result):
        """Per-iteration cost table (reference ``Optimizer.report``,
        ``omg/optimizer.py:23-57``)."""
        ih = result.info_history
        steps = int(result.steps_used)
        for t in range(min(steps, len(np.atleast_1d(ih.cost)))):
            print(
                f"step {t:3d} | obs {float(ih.obs[t]):8.3f} "
                f"smooth {float(ih.smooth[t]):8.3f} "
                f"cost {float(ih.cost[t]):8.3f} | "
                f"grad {float(ih.grad_norm[t]):7.3f} "
                f"collide {float(ih.collide[t]):4.0f} "
                f"reach {float(ih.reach[t]):6.4f} "
                f"violate {bool(ih.violate_limit[t])}")

    # -- attachment API for pick-and-place (trial.py:68-185) --------------
    def attach_target(self, hand_q: np.ndarray):
        """Attach the target to the hand at configuration ``hand_q``."""
        hand = np.array(_hand_pose_jit(
            self.model, jnp.asarray(hand_q, jnp.float32)))
        t = self.env.target
        t.rel_hand_pose = np.linalg.inv(hand) @ t.pose_mat
        t.attached = True
        self.env._scene_sdf = None
        self.env.version += 1

    def detach_target(self):
        self.env.target.attached = False
        self.env.target.rel_hand_pose = None
        self.env._scene_sdf = None
        self.env.version += 1
