"""Run the ACTUAL reference OMG-Planner inside this (CPU, no-extras) image.

The reference (`/root/reference`) needs five things this image lacks; all
five are stub-able without touching its code:

  * ``easydict`` / ``transforms3d`` / ``IPython`` — tiny pure-python
    packages; only a handful of functions are ever called
    (``omg/util.py:8-14`` star-imports; calls are ``quat2mat``,
    ``mat2quat``, ``euler2mat``, ``mat2euler`` — default 'sxyz' axes).
  * ``PyKDL`` + the vendored URDF parser — the constructor builds KDL IK
    solvers (``robot_pykdl.py:110-146``) but the fixed-goal scene path
    (``omg/planner.py:155-174``) NEVER calls them, so constructible no-op
    fakes suffice.  The batched FK the planner actually uses
    (``robot_pykdl.py:148-215``) is pure numpy over the shipped
    ``robot_p3.pkl`` tables and runs unmodified.
  * The CUDA collision kernel — ``layers/sdf_matching_loss.py`` imports
    ``omg_cuda``; we register a fake whose ``sdf_loss_forward`` reproduces
    ``layers/sdf_matching_loss_kernel.cu:96-262`` in vectorized numpy
    (trilinear with C-truncation index math, out-of-volume -> 1.0,
    central-difference gradient of the interpolated field, CHOMP hinge,
    per-object disables, object-sum reduction).
  * A GL renderer — ``omg/core.py:6`` imports ``YCBRenderer`` at module
    level; with ``cfg.vis=False`` it is never constructed.
  * CUDA torch — every device use is a literal ``.cuda()`` call
    (``omg/core.py:374``, ``omg/cost.py:331-335``, ``omg/config.py:222``),
    so patching ``torch.Tensor.cuda`` / ``nn.Module.cuda`` to identity
    runs the whole pipeline on CPU tensors.

``install()`` registers all of the above in ``sys.modules`` (pre-seeding
beats the reference's real submodules because the import system consults
``sys.modules`` before the file system) and puts the reference on
``sys.path``.  ``configure_reference()`` then points the reference's
global cfg at a generated data workspace (``build_ref_workspace``) so
scene/robot assets resolve without the 600 MB download.

Used by ``scripts/parity_run.py`` (trajectory-level parity report) and
``tests/test_ref_parity.py`` (CI).  This module imports NOTHING from jax —
it must be usable in a process that never touches the TPU.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"

# --------------------------------------------------------------------------
# transforms3d (only what the reference calls; conventions identical:
# quaternions are wxyz, euler default axes 'sxyz')
# --------------------------------------------------------------------------

_NEXT_AXIS = [1, 2, 0, 1]
_AXES2TUPLE = {
    "sxyz": (0, 0, 0, 0), "sxyx": (0, 0, 1, 0), "sxzy": (0, 1, 0, 0),
    "sxzx": (0, 1, 1, 0), "syzx": (1, 0, 0, 0), "syzy": (1, 0, 1, 0),
    "syxz": (1, 1, 0, 0), "syxy": (1, 1, 1, 0), "szxy": (2, 0, 0, 0),
    "szxz": (2, 0, 1, 0), "szyx": (2, 1, 0, 0), "szyz": (2, 1, 1, 0),
    "rzyx": (0, 0, 0, 1), "rxyx": (0, 0, 1, 1), "ryzx": (0, 1, 0, 1),
    "rxzx": (0, 1, 1, 1), "rxzy": (1, 0, 0, 1), "ryzy": (1, 0, 1, 1),
    "rzxy": (1, 1, 0, 1), "ryxy": (1, 1, 1, 1), "ryxz": (2, 0, 0, 1),
    "rzxz": (2, 0, 1, 1), "rxyz": (2, 1, 0, 1), "rzyz": (2, 1, 1, 1),
}


def quat2mat(q):
    w, x, y, z = np.asarray(q, dtype=np.float64)
    nq = w * w + x * x + y * y + z * z
    if nq < 1e-12:
        return np.eye(3)
    s = 2.0 / nq
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    return np.array([
        [1.0 - (yY + zZ), xY - wZ, xZ + wY],
        [xY + wZ, 1.0 - (xX + zZ), yZ - wX],
        [xZ - wY, yZ + wX, 1.0 - (xX + yY)]])


def mat2quat(M):
    """Bar-Itzhack method (what transforms3d uses); w >= 0."""
    M = np.asarray(M, dtype=np.float64)
    Qxx, Qyx, Qzx = M[0, 0], M[1, 0], M[2, 0]
    Qxy, Qyy, Qzy = M[0, 1], M[1, 1], M[2, 1]
    Qxz, Qyz, Qzz = M[0, 2], M[1, 2], M[2, 2]
    K = np.array([
        [Qxx - Qyy - Qzz, 0, 0, 0],
        [Qyx + Qxy, Qyy - Qxx - Qzz, 0, 0],
        [Qzx + Qxz, Qzy + Qyz, Qzz - Qxx - Qyy, 0],
        [Qyz - Qzy, Qzx - Qxz, Qxy - Qyx, Qxx + Qyy + Qzz]]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def euler2mat(ai, aj, ak, axes="sxyz"):
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    if frame:
        ai, ak = ak, ai
    if parity:
        ai, aj, ak = -ai, -aj, -ak
    si, sj, sk = np.sin(ai), np.sin(aj), np.sin(ak)
    ci, cj, ck = np.cos(ai), np.cos(aj), np.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    M = np.eye(3)
    if repetition:
        M[i, i] = cj
        M[i, j] = sj * si
        M[i, k] = sj * ci
        M[j, i] = sj * sk
        M[j, j] = -cj * ss + cc
        M[j, k] = -cj * cs - sc
        M[k, i] = -sj * ck
        M[k, j] = cj * sc + cs
        M[k, k] = cj * cc - ss
    else:
        M[i, i] = cj * ck
        M[i, j] = sj * sc - cs
        M[i, k] = sj * cc + ss
        M[j, i] = cj * sk
        M[j, j] = sj * ss + cc
        M[j, k] = sj * cs - sc
        M[k, i] = -sj
        M[k, j] = cj * si
        M[k, k] = cj * ci
    return M


def mat2euler(mat, axes="sxyz"):
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    M = np.asarray(mat, dtype=np.float64)[:3, :3]
    eps = np.finfo(float).eps * 4.0
    if repetition:
        sy = np.sqrt(M[i, j] * M[i, j] + M[i, k] * M[i, k])
        if sy > eps:
            ax = np.arctan2(M[i, j], M[i, k])
            ay = np.arctan2(sy, M[i, i])
            az = np.arctan2(M[j, i], -M[k, i])
        else:
            ax = np.arctan2(-M[j, k], M[j, j])
            ay = np.arctan2(sy, M[i, i])
            az = 0.0
    else:
        cy = np.sqrt(M[i, i] * M[i, i] + M[j, i] * M[j, i])
        if cy > eps:
            ax = np.arctan2(M[k, j], M[k, k])
            ay = np.arctan2(-M[k, i], cy)
            az = np.arctan2(M[j, i], M[i, i])
        else:
            ax = np.arctan2(-M[j, k], M[j, j])
            ay = np.arctan2(-M[k, i], cy)
            az = 0.0
    if parity:
        ax, ay, az = -ax, -ay, -az
    if frame:
        ax, az = az, ax
    return ax, ay, az


def euler2quat(ai, aj, ak, axes="sxyz"):
    return mat2quat(euler2mat(ai, aj, ak, axes))


def axangle2mat(axis, angle, is_normalized=False):
    x, y, z = np.asarray(axis, dtype=np.float64)
    if not is_normalized:
        n = np.sqrt(x * x + y * y + z * z)
        x, y, z = x / n, y / n, z / n
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    return np.array([
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c]])


def qmult(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def qinverse(q):
    q = np.asarray(q, dtype=np.float64)
    return q * np.array([1.0, -1, -1, -1]) / np.dot(q, q)


# --------------------------------------------------------------------------
# The CUDA kernel, in numpy (layers/sdf_matching_loss_kernel.cu:96-262)
# --------------------------------------------------------------------------

def _interp_trilinear(vol, pg, dims):
    """``getValueInterpolated`` (kernel.cu:37-64): C-truncation of
    ``pGrid - 0.5`` (NOT floor — trunc-toward-zero, reproduced with
    ``np.trunc``), unit-cube lerp, out-of-support -> 1.0."""
    q = pg - np.float32(0.5)
    i0 = np.trunc(q).astype(np.int64)
    f = (q - i0).astype(np.float32)
    i1 = i0 + 1
    valid = ((i0[:, 0] >= 0) & (i1[:, 0] < dims[0])
             & (i0[:, 1] >= 0) & (i1[:, 1] < dims[1])
             & (i0[:, 2] >= 0) & (i1[:, 2] < dims[2]))
    x0 = np.clip(i0[:, 0], 0, dims[0] - 1)
    y0 = np.clip(i0[:, 1], 0, dims[1] - 1)
    z0 = np.clip(i0[:, 2], 0, dims[2] - 1)
    x1 = np.clip(i1[:, 0], 0, dims[0] - 1)
    y1 = np.clip(i1[:, 1], 0, dims[1] - 1)
    z1 = np.clip(i1[:, 2], 0, dims[2] - 1)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    c000 = vol[x0, y0, z0]
    c100 = vol[x1, y0, z0]
    c010 = vol[x0, y1, z0]
    c110 = vol[x1, y1, z0]
    c001 = vol[x0, y0, z1]
    c101 = vol[x1, y0, z1]
    c011 = vol[x0, y1, z1]
    c111 = vol[x1, y1, z1]
    dx00 = c000 + fx * (c100 - c000)
    dx01 = c001 + fx * (c101 - c001)
    dx10 = c010 + fx * (c110 - c010)
    dx11 = c011 + fx * (c111 - c011)
    dxy0 = dx00 + fy * (dx10 - dx00)
    dxy1 = dx01 + fy * (dx11 - dx01)
    v = dxy0 + fz * (dxy1 - dxy0)
    return np.where(valid, v, np.float32(1.0)).astype(np.float32)


def sdf_loss_forward_np(poses, grids, limits, points, epsilons,
                        padding_scales, clearances, disables):
    """Numpy port of ``sdf_loss_cuda_forward``.  All inputs numpy; returns
    (top_potentials [P], top_potential_grads [P, 3], top_collides [P]),
    float32, summed over objects (the kernel's ``sum_gradients`` /
    ``atomicAdd``, deterministic order here)."""
    poses = np.asarray(poses, np.float32)
    grids = np.asarray(grids, np.float32)
    limits = np.asarray(limits, np.float32)
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    eps = np.asarray(epsilons, np.float32)
    pad = np.asarray(padding_scales, np.float32)
    clr = np.asarray(clearances, np.float32)
    dis = np.asarray(disables, np.float32)
    P, O = pts.shape[0], poses.shape[0]
    top_pot = np.zeros(P, np.float32)
    top_grad = np.zeros((P, 3), np.float32)
    top_col = np.zeros(P, np.float32)
    for o in range(O):
        if dis[o] > 0:
            continue
        R, t = poses[o, :3, :3], poses[o, :3, 3]
        x = pts @ R.T + t
        mn, mx = limits[o, 0:3], limits[o, 3:6]
        dims = limits[o, 6:9].astype(np.int64)
        delta = limits[o, 9]
        vol = grids[o]
        pg = ((x - mn) / (mx - mn) * dims.astype(np.float32)).astype(
            np.float32)
        val = _interp_trilinear(vol, pg, dims)
        top_col += (val < clr[o]).astype(np.float32)
        g = np.empty((P, 3), np.float32)
        for ax in range(3):
            e = np.zeros(3, np.float32)
            e[ax] = 1.0
            g[:, ax] = (_interp_trilinear(vol, pg + e, dims)
                        - _interp_trilinear(vol, pg - e, dims)) \
                * np.float32(0.5 / delta)
        inside = val <= 0
        band = (val > 0) & (val <= eps[o])
        pot = np.where(
            inside, -val + np.float32(0.5) * eps[o],
            np.where(band,
                     (val - eps[o]) ** 2 * np.float32(0.5 / eps[o]) * pad[o],
                     np.float32(0.0))).astype(np.float32)
        scale = np.where(
            inside, np.float32(-1.0),
            np.where(band, (val - eps[o]) / eps[o] * pad[o],
                     np.float32(0.0))).astype(np.float32)
        top_pot += pot
        # updatedGrad = R^T @ (scale * grad); row-vector form: vg @ R
        top_grad += (g * scale[:, None]) @ R
    return top_pot, top_grad, top_col


# --------------------------------------------------------------------------
# Fake modules
# --------------------------------------------------------------------------

def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _EasyDict(dict):
    """Attribute-style dict (the few behaviors ``omg/config.py`` uses)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in dict(d, **kwargs).items():
                setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, _EasyDict):
            value = _EasyDict(value)
        super().__setattr__(name, value)
        super().__setitem__(name, value)

    __setitem__ = __setattr__

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


def _make_pykdl():
    class JntArray:
        def __init__(self, n):
            self._d = [0.0] * int(n)

        def __setitem__(self, i, v):
            self._d[i] = float(v)

        def __getitem__(self, i):
            return self._d[i]

        def rows(self):
            return len(self._d)

    class _NoOp:
        def __init__(self, *a, **k):
            pass

    class Frame(_NoOp):
        pass

    return _module(
        "PyKDL", JntArray=JntArray, Frame=Frame,
        ChainFkSolverPos_recursive=_NoOp, ChainIkSolverVel_pinv=_NoOp,
        ChainIkSolverPos_NR_JL=_NoOp, Tree=_NoOp, Chain=_NoOp)


def _make_kdl_parser():
    class _FakeTree:
        def getChain(self, base, tip):
            return object()

        def getNrOfSegments(self):
            return 0

    def kdl_tree_from_urdf_model(urdf):
        return _FakeTree(), 0

    return _module("ycb_render.robotPose.kdl_parser",
                   kdl_tree_from_urdf_model=kdl_tree_from_urdf_model)


def _make_urdf_parser():
    class URDF:
        @staticmethod
        def from_xml_string(s):
            return URDF()

    pkg = _module("ycb_render.robotPose.urdf_parser_py")
    mod = _module("ycb_render.robotPose.urdf_parser_py.urdf", URDF=URDF)
    pkg.urdf = mod
    return pkg, mod


def _make_omg_cuda():
    import torch

    def sdf_loss_forward(pose_init, sdf_grids, sdf_limits, points, epsilons,
                         padding_scales, clearances, disables):
        pot, grad, col = sdf_loss_forward_np(
            pose_init.detach().cpu().numpy(),
            sdf_grids.detach().cpu().numpy(),
            sdf_limits.detach().cpu().numpy(),
            points.detach().cpu().numpy(),
            epsilons.detach().cpu().numpy(),
            padding_scales.detach().cpu().numpy(),
            clearances.detach().cpu().numpy(),
            disables.detach().cpu().numpy())
        return [torch.from_numpy(pot), torch.from_numpy(grad),
                torch.from_numpy(col)]

    return _module("omg_cuda", sdf_loss_forward=sdf_loss_forward)


def _make_renderer():
    class YCBRenderer:
        def __init__(self, *a, **k):
            raise RuntimeError(
                "YCBRenderer is stubbed in the parity shim; run the "
                "reference with cfg.vis=False")

    return _module("ycb_render.ycb_renderer", YCBRenderer=YCBRenderer)


_installed = False


def install(reference: str = REFERENCE) -> None:
    """Register fakes + patches and put the reference on ``sys.path``.
    Idempotent; call BEFORE importing anything from ``omg``."""
    global _installed
    if _installed:
        return
    import torch

    # numpy removed-alias patches (omg/cost.py:88 np.bool exists again in
    # numpy 2; omg/sdf_tools.py:48 np.int does not)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        for _name, _py in (("int", int), ("float", float),
                           ("object", object)):
            try:
                getattr(np, _name)
            except AttributeError:
                setattr(np, _name, _py)

    # CPU torch: .cuda() -> identity, torch.load -> full unpickling (the
    # reference's .pth files carry plain floats; torch>=2.6 defaults to
    # weights_only=True which rejects them)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not getattr(torch.load, "_ref_shim", False):
        _orig_load = torch.load

        def _load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _load._ref_shim = True
        torch.load = _load

    t3d = _module("transforms3d")
    t3d_q = _module("transforms3d.quaternions", quat2mat=quat2mat,
                    mat2quat=mat2quat, qmult=qmult, qinverse=qinverse)
    t3d_e = _module("transforms3d.euler", euler2mat=euler2mat,
                    mat2euler=mat2euler, euler2quat=euler2quat)
    t3d_a = _module("transforms3d.axangles", axangle2mat=axangle2mat)
    t3d.quaternions, t3d.euler, t3d.axangles = t3d_q, t3d_e, t3d_a

    urdf_pkg, urdf_mod = _make_urdf_parser()
    fakes = {
        "easydict": _module("easydict", EasyDict=_EasyDict),
        # get_ipython: matplotlib probes any sys.modules["IPython"] entry
        # for it (pyplot.py REPL-hook detection) — returning None keeps it
        # on the plain displayhook instead of AttributeError-ing every
        # later matplotlib user in the same process (xdist workers run
        # shimmed and unshimmed tests back to back)
        "IPython": _module("IPython", embed=lambda *a, **k: None,
                           get_ipython=lambda *a, **k: None,
                           version_info=(99, 0, 0)),
        "transforms3d": t3d,
        "transforms3d.quaternions": t3d_q,
        "transforms3d.euler": t3d_e,
        "transforms3d.axangles": t3d_a,
        "PyKDL": _make_pykdl(),
        "omg_cuda": _make_omg_cuda(),
        "ycb_render.ycb_renderer": _make_renderer(),
        "ycb_render.robotPose.kdl_parser": _make_kdl_parser(),
        "ycb_render.robotPose.urdf_parser_py": urdf_pkg,
        "ycb_render.robotPose.urdf_parser_py.urdf": urdf_mod,
    }
    for name, mod in fakes.items():
        sys.modules.setdefault(name, mod)
    if reference not in sys.path:
        sys.path.insert(0, reference)
    _installed = True


# --------------------------------------------------------------------------
# Data workspace (replaces the 600 MB download for robot assets)
# --------------------------------------------------------------------------

def parity_collision_points() -> np.ndarray:
    """The [10, 15, 3] per-link body points BOTH planners use in a parity
    run.  Derived from our asset exactly as ``load_panda`` strides it, with
    the right finger forced to the left finger's points — the reference
    loads one ``finger.xyz`` for both finger links (``omg/core.py:170-190``)."""
    asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                         "panda_collision_points.npz")
    pts = np.load(asset)["points"]  # [10, 64, 3]
    stride = max(pts.shape[1] // 15, 1)
    pts = pts[:, ::stride, :][:, :15, :].copy()
    pts[9] = pts[8]
    return pts.astype(np.float64)


def build_ref_workspace(root: str,
                        collision_points: np.ndarray | None = None) -> str:
    """Write ``data/robots/*`` so ``Robot.__init__`` (``omg/core.py:146-190``)
    resolves against ``root`` instead of the download."""
    robots = os.path.join(root, "data", "robots")
    os.makedirs(robots, exist_ok=True)
    with open(os.path.join(robots, "panda_arm_hand.urdf"), "w") as f:
        # parsed only by the fake URDF parser; content irrelevant
        f.write('<robot name="panda"/>\n')
    # extents -> Robot.sphere_size, defined but never consumed (core.py:148)
    np.savetxt(os.path.join(robots, "extents.txt"), np.ones((10, 3)))
    pts = (parity_collision_points() if collision_points is None
           else np.asarray(collision_points))
    names = ["link1", "link2", "link3", "link4", "link5", "link6", "link7",
             "hand", "finger"]
    for i, n in enumerate(names):
        np.savetxt(os.path.join(robots, n + ".xyz"), pts[i])
    return root


def configure_reference(data_root: str, scene_file: str = "", **overrides):
    """Point the reference's global cfg at ``data_root`` and select the
    deterministic fixed-goal path.  Returns the cfg.  ``install()`` first."""
    import random

    from omg import config  # noqa: deferred until shims are installed

    cfg = config.cfg
    cfg.root_dir = data_root.rstrip("/") + "/"
    cfg.robot_model_path = cfg.root_dir + "data/robots"
    cfg.grasp_path = cfg.root_dir + "data/grasps/"
    cfg.scene_path = cfg.root_dir + "data/scenes/"
    cfg.vis = False
    cfg.traj_init = "scene"      # load_goal_from_scene (planner.py:155-174)
    cfg.timeout = -1             # wall-clock-free (we run CPU, it ran GPU)
    cfg.ik_parallel = False
    cfg.report_time = False
    cfg.scene_file = scene_file
    for k, v in overrides.items():
        setattr(cfg, k, v)
    # collision-point sampling uses the unseeded global `random`
    # (core.py:184-187); with exactly 15 points per .xyz the sample is a
    # permutation (order-invariant downstream), but seed anyway.
    random.seed(233)
    np.random.seed(233)
    return cfg
