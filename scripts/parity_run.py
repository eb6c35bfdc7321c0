"""Trajectory-level parity against the ACTUAL reference, in this image.

Round 3 (VERDICT r2 item 1): the reference runs HERE, on CPU, through
``omg_planner_tpu.io.ref_shims`` — tiny fakes for easydict/transforms3d/
IPython/PyKDL/renderer, a numpy port of the CUDA collision kernel
(bit-semantics of ``layers/sdf_matching_loss_kernel.cu:96-262``), and
identity-``.cuda()`` torch patches.  The fixed-goal scene path
(``omg/planner.py:155-174``) never touches PyKDL IK, so the whole
CHOMP + online-learner pipeline is the reference's own code.

Modes (composable; all default ``--ws .parity_ws``):

  prepare      build the parity workspace: robot assets + N fixture
               scenes (exact reference formats) + per-scene precomputed
               goal sets (OUR goal-set builder; both planners then consume
               the identical goal set — the controlled experiment is the
               CHOMP loop + learner).
  record-ref   run the reference's ``PlanningScene.step()`` per scene.
  record-ours  run this framework with reference-matched knobs: exact
               grid backend, no inside-penalty (the reference's penalty
               never reaches its kernel grids — see
               ``io/reference_data.py::load_reference_object``), shared
               collision points (right finger = left finger file, as the
               reference loads).
  compare      per-scene verdicts, final-config-to-goal distances,
               per-step trajectory L-inf/L2, learner goal-choice
               agreement; writes ``parity_report.json``.

Tolerances: the implementations share semantics but not arithmetic order
or learner sample density (DESIGN §7), so hard equality is wrong; the
north-star check is verdict agreement + final configuration reaching the
same goal within ``--tol-goal`` + pointwise trajectory agreement within
``--tol-traj``.

Usage:
  python scripts/parity_run.py prepare  [--n-scenes 6]
  python scripts/parity_run.py prepare-suite --ws .parity_suite_ws \
      --n-scenes 30        # export pinned suite_v2 scenes instead
  python scripts/parity_run.py record-ref
  python scripts/parity_run.py record-ours
  python scripts/parity_run.py compare
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(m, flush=True)


def _scene_mats(ws):
    paths = sorted(glob.glob(os.path.join(ws, "data/scenes/parity_scene_*.mat")))
    if not paths:
        log(f"no parity scenes under {ws}; run prepare first")
        sys.exit(1)
    return paths


def _ours_cfg():
    """Our config with every reference-deviating default switched to the
    reference-exact path (DESIGN §7 items 4/5; backends to exact grid)."""
    from omg_planner_tpu.config import OMGConfig

    return OMGConfig(
        silent=True,
        sdf_analytic=False, sdf_fused=False, sdf_baked=False,
        learner_world_potential=False,
        use_standoff=False,           # scene-goal mode (planner.py:161-162)
        ref_topk_quirks=True,         # reference top-k accumulation quirks
        learner_active_goals=0,       # reference sweeps ALL candidates
        learner_sweep_every=1,        # reference sweeps EVERY step
        # goal-set build at the reference's full IK budget: the perf caps
        # (two-stage survivor cap / chain budget) are OUR heuristics and
        # shift which near-duplicate grasps survive, which flips
        # tie-broken goal picks on symmetric goal sets mid-plan
        ik_two_stage=False, ik_chain_max_iters=0, ik_stall_window=0,
        ik_chain_fused=False,  # per-lane chain exit is OUR deviation
        # no in-plan blacklist restarts: the reference plans once and
        # reports FAIL (omg/planner.py:600-653)
        inplan_blacklist_step=0,
        # the reference returns the FINAL trajectory, never a mid-run
        # executable snapshot (omg/planner.py:633-648)
        exec_snapshot=False,
        # reference-exact shrinking learner sample density (r5, VERDICT
        # r4 item 4: DESIGN §7 item 2 eliminated as a parity deviation)
        parity_density=True,
    )


def _parity_model():
    from omg_planner_tpu.io.ref_shims import parity_collision_points
    from omg_planner_tpu.models import panda

    model = panda.load_panda(collision_point_num=15)
    import jax.numpy as jnp
    return model._replace(
        collision_points=jnp.asarray(parity_collision_points(), jnp.float32))


def prepare(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import scipy.io as sio

    from omg_planner_tpu.io import ref_fixtures, ref_shims
    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    ws = os.path.abspath(args.ws)
    ref_shims.build_ref_workspace(ws)
    mats = ref_fixtures.make_parity_tree(ws, n_scenes=args.n_scenes)
    cfg = _ours_cfg()
    model = _parity_model()
    kept = []
    for mat in mats:
        name = os.path.splitext(os.path.basename(mat))[0]
        env, _ = env_from_mat_scene(cfg, mat, ws, model=model,
                                    penalize=False)
        ps = PlanningScene(cfg, env)
        gs = ps.build_goal_set()
        mask = np.asarray(gs.mask)
        goals = np.asarray(gs.grasps)[mask]
        if len(goals) < 3:
            log(f"{name}: only {len(goals)} goals, dropping scene")
            os.remove(mat)
            continue
        d = sio.loadmat(mat)
        d["goals"] = goals.astype(np.float64)
        d["reach_grasps"] = np.zeros((len(goals), cfg.reach_tail_length, 9))
        sio.savemat(mat, d)
        kept.append(name)
        log(f"{name}: {len(goals)} precomputed goals baked")
    log(f"workspace ready: {ws} ({len(kept)} scenes)")


def prepare_suite(args):
    """Export the first ``--n-scenes`` pinned hard-suite scenes
    (``data/suite_v2``) into the reference-format workspace and bake
    per-scene precomputed goal sets (VERDICT r3 item 6: scale trajectory
    parity toward the north star's full-suite coverage).

    Geometry dirs are deduped across scenes (482 unique primitives over
    the 100-scene suite) and per-scene object NAMES stay unique via
    symlinked dirs — the reference keys ``Env`` objects and the
    ``target_name`` lookup by directory basename (``omg/core.py:258-278``).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import scipy.io as sio

    from omg_planner_tpu.io import ref_fixtures, ref_shims
    from omg_planner_tpu.io.assets import synthetic_grasp_db
    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.io.scene_io import load_npz_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    ws = os.path.abspath(args.ws)
    ref_shims.build_ref_workspace(ws)
    objs = os.path.join(ws, "data", "objects")
    grasps = os.path.join(ws, "data", "grasps", "simulated")
    scenes_dir = os.path.join(ws, "data", "scenes")
    for d in (objs, grasps, scenes_dir):
        os.makedirs(d, exist_ok=True)

    suite = os.path.join(REPO, "data", "suite_v2")
    geo_dirs = {}  # (kind, extents, delta) -> shared geometry dir name

    def geometry_dir(kind, ext, delta):
        key = (kind, tuple(np.round(ext, 5)), round(float(delta), 5))
        if key not in geo_dirs:
            gname = f"suitegeo_{len(geo_dirs):03d}"
            ref_fixtures.write_object_dir(
                os.path.join(objs, gname), kind, ext, delta=float(delta))
            geo_dirs[key] = gname
        return geo_dirs[key]

    cfg = _ours_cfg()
    model = _parity_model()
    mats = []
    for sid in range(args.n_scenes):
        d = load_npz_scene(os.path.join(suite, f"scene_{sid}.npz"))
        rels, poses = [], []
        for kind, ext, pose, nm, dl in zip(
                d["kinds"], d["extents"], d["poses"], d["names"],
                d["deltas"]):
            kind, nm = str(kind), str(nm)
            ext = np.trim_zeros(np.asarray(ext, np.float64), "b")
            gname = geometry_dir(kind, ext, dl)
            # unique per-scene object name -> symlink to the shared dir
            oname = f"s{sid}_{nm}"
            link = os.path.join(objs, oname)
            if not os.path.islink(link) and not os.path.exists(link):
                os.symlink(gname, link)
            if nm == d["target_name"]:
                ref_fixtures.write_grasp_db(
                    os.path.join(grasps, f"{oname}.npy"),
                    synthetic_grasp_db(kind, ext))
            rels.append(f"data/objects/{oname}")
            poses.append(np.asarray(pose, np.float64))
        mat = os.path.join(scenes_dir, f"parity_scene_suite{sid:03d}.mat")
        ref_fixtures.write_mat_scene(
            mat, rels, np.stack(poses),
            target_name=f"s{sid}_{d['target_name']}")

        # bake OUR goal set so both planners consume the identical set
        env, _ = env_from_mat_scene(cfg, mat, ws, model=model,
                                    penalize=False)
        ps = PlanningScene(cfg, env)
        gs = ps.build_goal_set()
        mask = np.asarray(gs.mask)
        goals = np.asarray(gs.grasps)[mask]
        if len(goals) < 3:
            log(f"scene {sid}: only {len(goals)} goals, dropping")
            os.remove(mat)
            continue
        md = sio.loadmat(mat)
        md["goals"] = goals.astype(np.float64)
        md["reach_grasps"] = np.zeros((len(goals), cfg.reach_tail_length, 9))
        sio.savemat(mat, md)
        mats.append(mat)
        log(f"scene {sid}: exported ({len(goals)} goals baked)")
    log(f"suite workspace ready: {ws} ({len(mats)} scenes, "
        f"{len(geo_dirs)} shared geometries)")


def record_ref(args):
    from omg_planner_tpu.io import ref_shims

    ws = os.path.abspath(args.ws)
    ref_shims.install(args.reference)
    ref_shims.configure_reference(ws, silent=False)
    out = os.path.join(ws, "records")
    os.makedirs(out, exist_ok=True)

    from omg.core import PlanningScene as RefScene  # noqa: after shims
    from omg import config as ref_config

    for mat in _scene_mats(ws):
        name = os.path.splitext(os.path.basename(mat))[0]
        if args.skip_existing and os.path.exists(
                os.path.join(out, f"ref_{name}.npz")):
            continue
        ref_shims.configure_reference(ws, scene_file=name)
        t0 = time.time()
        scene = RefScene(ref_config.cfg)
        scene.reset()
        t_init = time.time() - t0
        t0 = time.time()
        info = scene.step()
        t_plan = time.time() - t0
        wall = t_init + t_plan
        hist = np.stack(scene.planner.history_trajectories)
        np.savez(
            os.path.join(out, f"ref_{name}.npz"),
            traj=hist[-1], history=hist,
            flag=bool(info[-1]["terminate"]),
            steps_used=len(info),
            selected_goals=np.asarray(scene.planner.selected_goals),
            collide=float(info[-1]["collide"]),
            smooth=float(info[-1]["smooth"]),
            goals=np.asarray(scene.traj.goal_set),
            wall=wall, wall_init=t_init, wall_plan=t_plan)
        log(f"{name}: ref flag={bool(info[-1]['terminate'])} "
            f"steps={len(info)} init={t_init:.1f}s plan={t_plan:.1f}s")


def record_ours(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from omg_planner_tpu.io.reference_data import env_from_mat_scene
    from omg_planner_tpu.io.scene_io import load_mat_scene
    from omg_planner_tpu.planner.scene import PlanningScene

    ws = os.path.abspath(args.ws)
    out = os.path.join(ws, "records")
    os.makedirs(out, exist_ok=True)
    cfg = _ours_cfg()
    model = _parity_model()
    for mat in _scene_mats(ws):
        name = os.path.splitext(os.path.basename(mat))[0]
        if args.skip_existing and os.path.exists(
                os.path.join(out, f"ours_{name}.npz")):
            continue
        scene_dict = load_mat_scene(mat)
        env, _ = env_from_mat_scene(cfg, mat, ws, model=model,
                                    penalize=False)
        ps = PlanningScene(cfg, env)
        ps.set_precomputed_goals(scene_dict["goals"],
                                 scene_dict.get("reach_grasps"))
        t0 = time.time()
        res = ps.step(fast=False)
        wall = time.time() - t0
        if res is None:
            np.savez(os.path.join(out, f"ours_{name}.npz"),
                     traj=np.zeros((0, 9)), flag=False, no_goals=True)
            log(f"{name}: NO GOALS")
            continue
        np.savez(
            os.path.join(out, f"ours_{name}.npz"),
            traj=np.asarray(res.traj),
            history=np.asarray(res.history),
            flag=bool(res.flag), steps_used=int(res.steps_used),
            selected_goals=np.asarray(res.selected_goals),
            collide=float(res.info.collide), smooth=float(res.info.smooth),
            goals=scene_dict["goals"], wall=wall)
        log(f"{name}: ours flag={bool(res.flag)} "
            f"steps={int(res.steps_used)} wall={wall:.1f}s")


def compare(args):
    ws = os.path.abspath(args.ws)
    out = os.path.join(ws, "records")
    report = {"scenes": [], "tol_traj": args.tol_traj,
              "tol_goal": args.tol_goal}
    n_cmp = n_agree = 0
    for op in sorted(glob.glob(os.path.join(out, "ours_*.npz"))):
        name = os.path.basename(op)[5:-4]
        rp = os.path.join(out, f"ref_{name}.npz")
        row = {"scene": name}
        if not os.path.exists(rp):
            row["status"] = "no reference record"
            report["scenes"].append(row)
            continue
        o, r = np.load(op), np.load(rp)
        n_cmp += 1
        row["flag_ours"], row["flag_ref"] = bool(o["flag"]), bool(r["flag"])
        row["steps_ours"] = int(o["steps_used"])
        row["steps_ref"] = int(r["steps_used"])
        to, tr = o["traj"], r["traj"]
        if to.shape == tr.shape and len(to):
            row["traj_linf"] = float(np.abs(to - tr).max())
            row["traj_l2_mean"] = float(
                np.linalg.norm(to - tr, axis=-1).mean())
        # learner agreement over common steps
        so, sr = o["selected_goals"], r["selected_goals"]
        k = min(len(so), len(sr))
        if k:
            row["goal_choice_agree"] = float((so[:k] == sr[:k]).mean())
            row["final_goal_ours"] = int(so[k - 1])
            row["final_goal_ref"] = int(sr[k - 1])
        # per-step divergence curve (common prefix)
        ho, hr = o.get("history"), r.get("history")
        if ho is not None and hr is not None and ho.ndim == 3:
            m = min(len(ho), len(hr))
            row["history_linf"] = [
                round(float(np.abs(ho[i] - hr[i]).max()), 4)
                for i in range(m)]
        if row["flag_ours"] != row["flag_ref"]:
            row["status"] = "VERDICT MISMATCH"
            report["scenes"].append(row)
            continue
        if row["flag_ours"]:
            end_goal = float(np.abs(
                r["goals"][:, :7] - to[-1][None, :7]).max(-1).min()) \
                if len(r["goals"]) else float("nan")
            row["end_to_ref_goal_linf"] = end_goal
            row["goal_ok"] = end_goal <= args.tol_goal
            row["traj_ok"] = row.get("traj_linf", np.inf) <= args.tol_traj
            ok = row["goal_ok"]
        else:
            ok = True
        row["status"] = "agree" if ok else "DIVERGED"
        n_agree += ok
        report["scenes"].append(row)
    report["compared"] = n_cmp
    report["agree"] = n_agree
    path = os.path.join(out, "parity_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    log(json.dumps(report, indent=1))
    log(f"-> {path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["prepare", "prepare-suite",
                                     "record-ours", "record-ref",
                                     "compare"])
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--ws", default=os.path.join(REPO, ".parity_ws"))
    ap.add_argument("--n-scenes", type=int, default=6)
    ap.add_argument("--skip-existing", action="store_true",
                    help="record modes: skip scenes with an existing record "
                         "(resume after a partial run)")
    ap.add_argument("--tol-traj", type=float, default=0.15)
    ap.add_argument("--tol-goal", type=float, default=0.05)
    args = ap.parse_args()
    {"prepare": prepare, "prepare-suite": prepare_suite,
     "record-ours": record_ours,
     "record-ref": record_ref, "compare": compare}[args.mode](args)


if __name__ == "__main__":
    main()
