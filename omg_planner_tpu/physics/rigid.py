"""Single-dynamic-body rigid physics: SDF contacts + projected impulses.

Role parity: the reference's integration test is open-loop execution in
PyBullet (``bullet/panda_scene.py:450-465`` steps the world,
``:486-504`` scores the lift).  This module is the TPU-native stepper
behind :mod:`omg_planner_tpu.physics.executor`: the grasp target is the
one dynamic body (6-DOF), everything else — scene objects, table, the
position-controlled robot — is kinematic, exactly the regime the
harness's reward exercises (nothing in the reference's reward depends on
obstacle dynamics; objects other than the target only matter as
collision geometry).

TPU-first design decisions (vs translating a Bullet-style engine):

* **SDF contact generation, not convex pair tests.**  Two fixed-shape
  batched queries per substep: robot collision-point spheres against the
  target's analytic SDF, and target surface samples against every static
  primitive's SDF (closed-form gradients give contact normals).  No
  broad-phase, no shape-pair dispatch, no dynamic contact lists — XLA
  sees two dense elementwise pipelines plus a ``top_k`` compaction to a
  static contact count.
* **Projected-Jacobi impulse solver.**  Per iteration every contact
  computes its impulse correction in parallel from the same (v, w),
  accumulators are clamped (normal >= 0, friction inside the Coulomb
  disc), and the relaxed sum is applied — a ``fori_loop`` of vector ops
  instead of Bullet's sequential Gauss-Seidel sweep (a 100+-step scalar
  scan per substep would serialize the whole chip).  With one dynamic
  body and <=64 contacts, relaxed Jacobi converges in ~16 iterations.
* **Position-control emulation by penetration-bias clamping.**  Fingers
  replay a precomputed kinematic track; the Baumgarte bias is capped
  (``v_depen_max``) so deep kinematic squeeze yields bounded steady
  contact force, the same observable behavior as PyBullet's
  position-control ``maxForce`` stall without simulating actuator DOFs.
* **The whole rollout is one ``lax.scan``** over substeps (static trip
  count), so a plan executes as a single device program — and vmaps over
  a batch of plans.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.sdf import _analytic_sdf_grad
from ..utils.pose import quat_to_mat


class NoMassModelError(ValueError):
    """The target has no buildable mass model (no interior voxels / no
    surface points) — execution is impossible, the planner verdict
    stands alone.  Drivers catch exactly this (ADVICE r4 #2: a bare
    ``except ValueError`` also swallowed shape/validation bugs inside
    the rollout)."""


class PhysParams(NamedTuple):
    """Solver constants (a pytree of scalars; changing values does not
    recompile)."""

    dt: jnp.ndarray             # substep, s
    mu: jnp.ndarray             # Coulomb friction coefficient
    beta: jnp.ndarray           # position-projection factor (pseudo pass)
    slop: jnp.ndarray           # penetration allowance, m
    v_depen_max: jnp.ndarray    # position-projection velocity cap, m/s
    damp_lin: jnp.ndarray       # linear velocity damping, 1/s
    damp_ang: jnp.ndarray       # angular velocity damping, 1/s
    sphere_radius: jnp.ndarray  # robot collision-point contact radius, m
    pinch_force: jnp.ndarray    # finger motor stall force, N
    stall_pen: jnp.ndarray      # pad penetration that stalls the finger
    #                             motor (also the engagement ramp scale)
    finger_rate: jnp.ndarray    # finger joint speed toward command, m/s
    gravity: jnp.ndarray        # [3]


def default_params(dt: float = 1.0 / 240.0) -> PhysParams:
    f = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
    return PhysParams(
        dt=f(dt), mu=f(0.8), beta=f(0.2), slop=f(5e-4), v_depen_max=f(0.05),
        damp_lin=f(0.3), damp_ang=f(0.6), sphere_radius=f(0.006),
        pinch_force=f(20.0), stall_pen=f(3.5e-3), finger_rate=f(0.12),
        gravity=jnp.asarray([0.0, 0.0, -9.81], jnp.float32))


class RigidBodySpec(NamedTuple):
    """The dynamic target body: its SDF (analytic primitive OR a baked
    voxel grid for mesh-pipeline objects), mass properties, and
    body-frame surface samples (contact candidates against statics).
    The body frame is COM-CENTERED (``x`` in :class:`BodyState` is the
    center of mass); :func:`body_spec_from_grid` records the original
    frame's COM offset in ``com`` for the executor's pose conversions.

    ``grid4`` selects the SDF backend STATICALLY (shape is a trace-time
    constant): empty -> analytic closed form; non-empty -> 4-channel
    trilinear query of baked value+gradient (the same scheme the
    planner's ``BakedSceneSDF`` uses, ``ops/sdf.py::bake_scene``)."""

    kind: jnp.ndarray        # [] int32 (0 box, 1 sphere, 2 cylinder)
    half: jnp.ndarray        # [3]
    round: jnp.ndarray       # [] edge rounding for stable contact normals
    inv_mass: jnp.ndarray    # []
    inv_inertia: jnp.ndarray  # [3, 3] body frame
    surf: jnp.ndarray        # [S, 3] body-frame surface samples
    com: jnp.ndarray         # [3] COM in the object's ORIGINAL frame
    grid4: jnp.ndarray       # [X*Y*Z, 4] baked SDF, or [0, 4] (analytic)
    grid_limits: jnp.ndarray  # [10] mn/mx/dims/delta (COM-centered)


def _body_phi_grad(spec: "RigidBodySpec", rel: jnp.ndarray):
    """Body SDF value + gradient at body-frame points ``rel [..., 3]`` —
    analytic closed form or baked-grid trilinear, chosen at trace time."""
    flat = rel.reshape(-1, 3)
    if spec.grid4.shape[0]:
        from ..ops.sdf import _query_one_object_baked

        phi, g = _query_one_object_baked(spec.grid4, spec.grid_limits, flat)
    else:
        phi, g = _analytic_sdf_grad(
            spec.kind[None], spec.half[None], jnp.ones((1,), jnp.float32),
            flat[None], rounds=spec.round[None])
        phi, g = phi[0], g[0]
    return phi.reshape(rel.shape[:-1]), g.reshape(rel.shape)


class StaticWorld(NamedTuple):
    """Kinematic scene colliders (target excluded): analytic primitives,
    plus optional DATA-BACKED grid colliders for mesh-pipeline obstacles
    (baked 4-channel SDFs, same scheme as the grid body).  ``grid4`` is
    ``None`` when the scene has no mesh obstacles — the grid query is
    then statically absent from the compiled rollout."""

    kinds: jnp.ndarray      # [O] int32
    halfs: jnp.ndarray      # [O, 3]
    rounds: jnp.ndarray     # [O]
    inv_poses: jnp.ndarray  # [O, 4, 4] world -> object
    mask: jnp.ndarray       # [O] 1 = active collider
    grid4: jnp.ndarray | None = None        # [Og, N, 4] flat baked SDFs
    grid_limits: jnp.ndarray | None = None  # [Og, 10]
    grid_inv_poses: jnp.ndarray | None = None  # [Og, 4, 4]


class BodyState(NamedTuple):
    x: jnp.ndarray  # [3] position
    q: jnp.ndarray  # [4] wxyz orientation
    v: jnp.ndarray  # [3] linear velocity
    w: jnp.ndarray  # [3] angular velocity (world frame)


class Contacts(NamedTuple):
    """Fixed-size compacted contact set (masked)."""

    p: jnp.ndarray        # [C, 3] world contact point
    n: jnp.ndarray        # [C, 3] impulse direction on the body (unit)
    pen: jnp.ndarray      # [C] penetration depth (>= 0 where active)
    v_other: jnp.ndarray  # [C, 3] kinematic collider velocity at contact
    active: jnp.ndarray   # [C] float mask
    finger: jnp.ndarray   # [C] 1 = finger-pad contact (gets motor floor)
    src: jnp.ndarray      # [C] source index in the candidate pool (warm
    #                       start identity across substeps)


def _primitive_mass_inertia(kind: int, half, density: float):
    """Closed-form solid mass + body-frame inertia for the 3 primitives."""
    a, b, c = [float(h) for h in half]
    if kind == 0:     # box, half extents a,b,c
        vol = 8.0 * a * b * c
        m = vol * density
        ix = m / 3.0 * (b * b + c * c)
        iy = m / 3.0 * (a * a + c * c)
        iz = m / 3.0 * (a * a + b * b)
    elif kind == 1:   # sphere radius a
        vol = 4.0 / 3.0 * np.pi * a ** 3
        m = vol * density
        ix = iy = iz = 0.4 * m * a * a
    else:             # cylinder radius a, half-height c (axis z)
        h = 2.0 * c
        vol = np.pi * a * a * h
        m = vol * density
        ix = iy = m * (3.0 * a * a + h * h) / 12.0
        iz = 0.5 * m * a * a
    return m, np.diag([ix, iy, iz])


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi), np.cos(phi)], -1)


def box_face_grid(half, m: int) -> np.ndarray:
    """``m x m`` sample grid on each face of the box [-half, half]
    (6 m^2 points, centered frame).  Shared by the body's surface
    sampler and the executor's finger-pad geometry."""
    half = np.asarray(half, np.float64).ravel()[:3]
    pts = []
    for ax in range(3):
        u, v = [i for i in range(3) if i != ax]
        gu, gv = np.meshgrid(np.linspace(-half[u], half[u], m),
                             np.linspace(-half[v], half[v], m),
                             indexing="ij")
        for s in (-1.0, 1.0):
            p = np.zeros((m, m, 3))
            p[..., ax] = s * half[ax]
            p[..., u] = gu
            p[..., v] = gv
            pts.append(p.reshape(-1, 3))
    return np.concatenate(pts)


def primitive_surface_samples(kind: int, half, n: int = 96) -> np.ndarray:
    """Canonical body-frame surface samples for an analytic primitive.

    The dynamic body IS the analytic primitive, so its contact candidates
    against the static world come from the primitive's own surface — NOT
    a strided subsample of the object's point cloud, whose coverage is
    incidental: an upright cylinder whose cloud thins out at the bottom
    face rests on 1-2 sample points, a degenerate support polygon, and
    tips over unprovoked (measured on suite scene 5: the free-standing
    bottle fell with zero robot contacts).  Support features (bottom
    face/rim) are guaranteed here by construction."""
    half = np.asarray(half, np.float64).ravel()[:3]
    if kind == 1:                                 # sphere
        pts = _fibonacci_sphere(n) * half[0]
    elif kind == 2:                               # cylinder r, r, hh
        r, hh = half[0], half[2]
        pts = []
        n_rim = 14
        ang = np.linspace(0.0, 2 * np.pi, n_rim, endpoint=False)
        ring = np.stack([np.cos(ang), np.sin(ang), np.zeros(n_rim)], -1)
        for s in (-1.0, 1.0):                     # caps: rim + r/2 + center
            for rr in (r, 0.5 * r):
                p = ring.copy() * rr
                p[:, 2] = s * hh
                pts.append(p)
            pts.append(np.array([[0.0, 0.0, s * hh]]))
        for z in np.linspace(-hh, hh, 3 + 2)[1:-1]:   # side rings
            p = ring.copy() * r
            p[:, 2] = z
            pts.append(p)
        pts = np.concatenate(pts)
    else:                                         # box: 6 face grids
        m = max(int(np.ceil(np.sqrt(n / 6.0))), 2)
        pts = box_face_grid(half, m)
    # pad/trim to exactly n (static shape across scenes)
    if len(pts) < n:
        pts = np.concatenate([pts, pts[np.arange(n - len(pts)) % len(pts)]])
    return pts[:n].astype(np.float32)


def body_spec_from_primitive(kind: int, half, surf_pts: np.ndarray = None,
                             density: float = 300.0,
                             n_surf: int = 96,
                             round_r: float = 0.004) -> RigidBodySpec:
    """Build the dynamic-body spec from a scene primitive.

    ``half`` is the analytic SDF's half-extent triple (``sdf.analytic[1]``
    — box: half extents; sphere: radius; cylinder: radius/radius/half
    height), so the physics body is EXACTLY the collision geometry the
    planner optimized against.  Contact candidates against the statics
    are canonical samples of the primitive's own surface
    (:func:`primitive_surface_samples`); ``surf_pts`` is accepted for
    API compatibility and ignored.  ``density`` defaults to a light
    tabletop object (~YCB mass scale).
    """
    half = np.asarray(half, np.float32).ravel()[:3]
    m, inertia = _primitive_mass_inertia(kind, half, density)
    pts = primitive_surface_samples(kind, half, n_surf)
    return RigidBodySpec(
        kind=jnp.asarray(kind, jnp.int32),
        half=jnp.asarray(half, jnp.float32),
        round=jnp.asarray(round_r, jnp.float32),
        inv_mass=jnp.asarray(1.0 / m, jnp.float32),
        inv_inertia=jnp.asarray(np.linalg.inv(inertia), jnp.float32),
        surf=jnp.asarray(pts, jnp.float32),
        com=jnp.zeros(3, jnp.float32),
        grid4=jnp.zeros((0, 4), jnp.float32),
        grid_limits=jnp.zeros(10, jnp.float32))


def bake_grid_sdf(field, inside_penalty: float = 5.0):
    """Bake a data-backed :class:`SignedDensityField` into the 4-channel
    (value + central-difference gradient) flat layout
    ``_query_one_object_baked`` consumes.  ``inside_penalty`` undoes the
    pipeline's inside scaling (``core.py:110`` parity) so penetration
    depths are metric.  Returns ``(data [X,Y,Z], grid4 [X*Y*Z, 4],
    limits [10])`` in the field's own frame."""
    data = np.asarray(field.data, np.float32)
    data = np.where(data < 0, data / float(inside_penalty), data)
    delta = float(field.delta)
    origin = np.asarray(field.origin, np.float64)
    g = np.zeros(data.shape + (3,), np.float32)
    g[1:-1, :, :, 0] = (data[2:] - data[:-2]) / (2 * delta)
    g[:, 1:-1, :, 1] = (data[:, 2:] - data[:, :-2]) / (2 * delta)
    g[:, :, 1:-1, 2] = (data[:, :, 2:] - data[:, :, :-2]) / (2 * delta)
    grid4 = np.concatenate([data[..., None], g], -1).reshape(-1, 4)
    mn = origin
    mx = mn + delta * np.asarray(data.shape)
    limits = np.concatenate(
        [mn, mx, np.asarray(data.shape, np.float64), [delta]])
    return data, grid4, limits


def body_spec_from_grid(field, surf_pts: np.ndarray,
                        density: float = 300.0,
                        inside_penalty: float = 5.0,
                        n_surf: int = 96) -> RigidBodySpec:
    """Build the dynamic-body spec from a DATA-BACKED SDF (the mesh
    pipeline's voxelized objects, ``io/meshsdf.py`` — the reference
    executes exactly these YCB meshes in PyBullet).

    Mass, COM and inertia come from voxel integration of the inside
    region; the frame is re-centered at the COM (grid limits and surface
    samples shifted) so the solver stays COM-frame like the primitives —
    the original-frame offset is recorded in ``com`` for the executor's
    pose conversions.  Contact queries use the planner's baked 4-channel
    scheme (value + central-difference gradient, trilinearly
    interpolated; ``ops/sdf.py::bake_scene`` semantics).
    ``inside_penalty`` undoes the pipeline's x5 inside scaling
    (``core.py:110`` parity) so penetration depths are metric.
    """
    data, grid4, limits = bake_grid_sdf(field, inside_penalty)
    delta = float(field.delta)
    origin = np.asarray(field.origin, np.float64)
    inside = data < 0.0
    n_in = int(inside.sum())
    if n_in == 0:
        raise NoMassModelError(
            "grid SDF has no interior voxels: no mass model")
    idx = np.argwhere(inside)
    pos = origin[None] + (idx + 0.5) * delta     # voxel centers
    dv = delta ** 3
    m = density * dv * n_in
    com = pos.mean(0)
    rp = pos - com[None]
    r2 = np.einsum("na,na->n", rp, rp)
    inertia = density * dv * (
        r2.sum() * np.eye(3) - np.einsum("na,nb->ab", rp, rp))
    # thin shells can have near-singular inertia along one axis
    inertia += np.eye(3) * max(1e-8, 1e-4 * np.trace(inertia))

    limits = limits.copy()
    limits[0:3] -= com            # COM-centered body frame
    limits[3:6] -= com
    mn, mx = limits[0:3], limits[3:6]

    pts = np.asarray(surf_pts, np.float32)[:, :3] - com[None].astype(
        np.float32)
    # evenly-spaced subsample over the WHOLE cloud: a stride+truncate
    # (pts[::stride][:n]) silently drops a contiguous trailing chunk
    # (e.g. 97-191 points -> only the first 96 survive), starving whole
    # faces of world-contact candidates — the same degenerate-support
    # failure primitive_surface_samples exists to prevent
    idx = np.linspace(0, len(pts) - 1, min(n_surf, len(pts))).astype(int)
    pts = pts[idx]
    if len(pts) < n_surf:
        pts = np.concatenate(
            [pts, pts[np.arange(n_surf - len(pts)) % len(pts)]])

    half = ((mx - mn) / 2.0).astype(np.float32)
    return RigidBodySpec(
        kind=jnp.asarray(0, jnp.int32),
        half=jnp.asarray(half, jnp.float32),
        round=jnp.asarray(0.0, jnp.float32),
        inv_mass=jnp.asarray(1.0 / m, jnp.float32),
        inv_inertia=jnp.asarray(np.linalg.inv(inertia), jnp.float32),
        surf=jnp.asarray(pts, jnp.float32),
        com=jnp.asarray(com, jnp.float32),
        grid4=jnp.asarray(grid4, jnp.float32),
        grid_limits=jnp.asarray(limits, jnp.float32))


def _quat_integrate(q, w, dt):
    wq = jnp.concatenate([jnp.zeros((1,), q.dtype), w])
    # quaternion product wq * q (w,x,y,z)
    w1, x1, y1, z1 = wq
    w2, x2, y2, z2 = q
    dq = jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])
    qn = q + 0.5 * dt * dq
    return qn / jnp.maximum(jnp.linalg.norm(qn), 1e-9)


def _topk_contacts(p, n, pen, v_other, active, finger, k):
    """Compact a candidate set to the k deepest active contacts."""
    score = jnp.where(active > 0.5, pen, -jnp.inf)
    _, idx = jax.lax.top_k(score, min(k, score.shape[0]))
    take = lambda a: a[idx]  # noqa: E731
    act = (take(score) > -jnp.inf).astype(jnp.float32)
    return Contacts(p=take(p), n=take(n), pen=jnp.maximum(take(pen), 0.0),
                    v_other=take(v_other), active=act,
                    finger=take(finger) * act, src=idx)


def _robot_contacts(spec: RigidBodySpec, state: BodyState,
                    sph: jnp.ndarray, sph_v: jnp.ndarray,
                    is_finger: jnp.ndarray, radius, k: int) -> Contacts:
    """Robot collision-point spheres vs the target's analytic SDF.

    Normal convention: the impulse direction on the BODY points from the
    body surface toward its interior at the contact (the finger presses
    the object away from itself)."""
    r = quat_to_mat(state.q)
    rel = (sph - state.x) @ r                  # body frame [K, 3]
    phi, g = _body_phi_grad(spec, rel)         # [K], [K, 3]
    n_out = g @ r.T
    n_out = n_out / jnp.maximum(
        jnp.linalg.norm(n_out, axis=-1, keepdims=True), 1e-9)
    pen = radius - phi
    cp = sph - n_out * phi[..., None]          # on the body surface
    # finger-link spheres are EXCLUDED here: the pads contact through
    # their box colliders (_pad_contacts); double-counting them as
    # spheres would double the motor force budget
    act = (pen > 0.0).astype(jnp.float32) * (1.0 - is_finger)
    return _topk_contacts(cp, -n_out, pen, sph_v, act,
                          jnp.zeros_like(pen), k)


def _pad_pose(base: jnp.ndarray, axis: jnp.ndarray,
              dv: jnp.ndarray) -> jnp.ndarray:
    """Finger-pad pose at joint offset ``dv`` from the reference value the
    track was built with: prismatic joints translate the pad along a
    fixed link-frame ``axis`` — a translation, so it composes with the
    baked-in pad-center shift commutatively.  ``base [2,4,4]``,
    ``axis [2,3]``, ``dv [2]``."""
    shift = jnp.einsum("fab,fb->fa", base[:, :3, :3], axis * dv[:, None])
    return base.at[:, :3, 3].add(shift)


def _pad_probe_pen(spec: RigidBodySpec, state: BodyState,
                   pad_pose: jnp.ndarray,
                   pad_samples: jnp.ndarray) -> jnp.ndarray:
    """Max pad-sample penetration per pad ([2]) — the finger motor's
    stall signal."""
    r = quat_to_mat(state.q)
    sp_w = jnp.einsum("fab,fsb->fsa", pad_pose[:, :3, :3], pad_samples) \
        + pad_pose[:, None, :3, 3]                       # [2, Sp, 3]
    rel = jnp.einsum("fsb,ba->fsa", sp_w - state.x, r)
    phi, _ = _body_phi_grad(spec, rel)
    pen = 1e-3 - phi
    return pen.max(-1)


def _pad_contacts(spec: RigidBodySpec, state: BodyState,
                  pad_pose: jnp.ndarray, pad_next: jnp.ndarray,
                  pad_samples: jnp.ndarray, dt, k: int) -> Contacts:
    """Finger pads as densely-sampled surfaces against the body's SDF.

    Sphere-point fingers give a pinch only 3-6 marginal contacts and
    their discreteness shoves the object around during the close
    (measured ~9 mm drift); and sampling the OBJECT's surface against a
    pad box is just as sparse (the pad face subtends ~1-2 of the body's
    96 samples; measured).  The resolution has to live on the PAD: a
    fixed sample grid over the pad surface queries the body's analytic
    SDF — dense contact exactly where the pinch happens, independent of
    object size.  Pad material-point velocities are exact (each sample
    pushed through this substep's pad transform delta).

    ``pad_pose/pad_next [2, 4, 4]``: pad frames at the substep
    boundaries; ``pad_samples [2, Sp, 3]``: pad-frame surface samples.
    """
    r = quat_to_mat(state.q)
    sp_w = jnp.einsum("fab,fsb->fsa", pad_pose[:, :3, :3], pad_samples) \
        + pad_pose[:, None, :3, 3]                       # [2, Sp, 3]
    nxt = jnp.einsum("fab,fsb->fsa", pad_next[:, :3, :3], pad_samples) \
        + pad_next[:, None, :3, 3]
    v_pad = (nxt - sp_w) / dt
    flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
    sp_w, v_pad = flat(sp_w), flat(v_pad)
    rel = (sp_w - state.x) @ r                           # body frame
    phi, g = _body_phi_grad(spec, rel)
    n_out = g @ r.T
    n_out = n_out / jnp.maximum(
        jnp.linalg.norm(n_out, axis=-1, keepdims=True), 1e-9)
    pen = 1e-3 - phi           # contact once a pad sample grazes 1 mm
    cp = sp_w - n_out * phi[..., None]
    # finger value = pad index + 1: each pad is its OWN motor (the solver
    # pins each pad's normal impulses at that pad's stall share — a
    # single shared budget splits asymmetrically when one pad has more
    # contacts and the imbalance extrudes the object; measured)
    pad_id = 1.0 + (jnp.arange(pen.shape[0]) >= pad_samples.shape[1]
                    ).astype(jnp.float32)
    return _topk_contacts(cp, -n_out, pen, v_pad,
                          (pen > 0.0).astype(jnp.float32),
                          pad_id, k)


def _world_contacts(spec: RigidBodySpec, world: StaticWorld,
                    state: BodyState, k: int) -> Contacts:
    """Target surface samples vs every static collider: per-sample min
    over objects (analytic primitives AND baked-grid mesh obstacles),
    normal = that object's outward SDF gradient (pushes the body out of
    the obstacle)."""
    r = quat_to_mat(state.q)
    pw = state.x + spec.surf @ r.T             # [S, 3] world
    ro = world.inv_poses[:, :3, :3]
    to = world.inv_poses[:, :3, 3]
    po = jnp.einsum("oab,sb->osa", ro, pw) + to[:, None, :]
    phi, g = _analytic_sdf_grad(
        world.kinds, world.halfs, jnp.ones_like(world.rounds), po,
        rounds=world.rounds)                   # [O, S], [O, S, 3]
    phi = jnp.where(world.mask[:, None] > 0.5, phi, jnp.inf)
    o_idx = jnp.argmin(phi, axis=0)            # [S]
    s_idx = jnp.arange(pw.shape[0])
    phi_min = phi[o_idx, s_idx]
    g_obj = g[o_idx, s_idx]                    # object-frame gradient
    n_w = jnp.einsum("sba,sb->sa", ro[o_idx], g_obj)  # R_o^T (inv rot)
    if world.grid4 is not None and world.grid4.shape[0]:
        from ..ops.sdf import _query_one_object_baked

        rg = world.grid_inv_poses[:, :3, :3]
        tg = world.grid_inv_poses[:, :3, 3]
        pg = jnp.einsum("oab,sb->osa", rg, pw) + tg[:, None, :]
        phi_g, g_g = jax.vmap(_query_one_object_baked)(
            world.grid4, world.grid_limits, pg)        # [Og, S], [Og, S, 3]
        gi = jnp.argmin(phi_g, axis=0)
        phi_gm = phi_g[gi, s_idx]
        n_g = jnp.einsum("sba,sb->sa", rg[gi], g_g[gi, s_idx])
        closer = phi_gm < phi_min
        phi_min = jnp.where(closer, phi_gm, phi_min)
        n_w = jnp.where(closer[:, None], n_g, n_w)
    n_w = n_w / jnp.maximum(
        jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
    pen = -phi_min
    return _topk_contacts(pw, n_w, pen, jnp.zeros_like(pw),
                          (pen > 0.0).astype(jnp.float32),
                          jnp.zeros_like(pen), k)


def _solve_contacts(spec: RigidBodySpec, state: BodyState, c: Contacts,
                    pp: PhysParams, iters: int, warm=None):
    """Relaxed projected-Jacobi impulse solve.

    ``warm`` (optional) = (ln0, l10, l20) accumulator init from the
    previous substep's converged solve (persistent-contact warm start):
    the warm impulses are applied to (v, w) up front, so the iteration
    only has to find the CHANGE since last substep — near-stick grip
    convergence in a handful of iterations instead of ~100 (without it
    a pinched object slips ~4%/substep at 48 iterations; measured).
    Returns (v, w, (ln, l1, l2), pv, pw)."""
    r_mat = quat_to_mat(state.q)
    i_inv = r_mat @ spec.inv_inertia @ r_mat.T
    rarm = c.p - state.x                       # [C, 3]

    # orthonormal tangent basis per contact
    ref = jnp.where(jnp.abs(c.n[:, 2:3]) < 0.9,
                    jnp.asarray([0.0, 0.0, 1.0])[None],
                    jnp.asarray([1.0, 0.0, 0.0])[None])
    t1 = jnp.cross(c.n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(c.n, t1)

    def eff_k(d):
        rxd = jnp.cross(rarm, d)
        return spec.inv_mass + jnp.einsum(
            "ca,ca->c", jnp.cross(rxd @ i_inv.T, rarm), d)

    # direction-aware mass splitting: a Jacobi (parallel) application of
    # all contact corrections overshoots by the number of contacts pushing
    # the SAME way (N aligned table contacts each cancel the full approach
    # velocity -> N x overshoot -> divergence), but contacts with
    # orthogonal normals (the two pinch sides + the table) barely couple.
    # Scale each contact's effective mass by the alignment-weighted count
    # sum_j (n_i . n_j)^2 — aligned sets split the correction between
    # them, orthogonal sets converge at full Gauss-Seidel-like rate
    # (uniform 1/N splitting needs ~N iterations and never reaches
    # friction stick on a 90-contact pinch; measured: the grasp slips)
    align = jnp.square(c.n @ c.n.T) * c.active[None, :]
    split = jnp.maximum(align.sum(-1), 1.0)
    k_n = jnp.maximum(eff_k(c.n), 1e-6) * split
    k_1 = jnp.maximum(eff_k(t1), 1e-6) * split
    k_2 = jnp.maximum(eff_k(t2), 1e-6) * split
    omega = jnp.asarray(0.9, jnp.float32)

    # finger motor floor: the reference's gripper is position control
    # with a stall force (PyBullet maxForce; commanded to 0 at
    # panda_scene.py:427-428) — a stalled motor keeps PRESSING.  Model it
    # as a lower bound on the normal impulse of finger-pad contacts:
    # pinch_force * dt split over the active pad contacts.  No
    # penetration-bias term enters the velocity solve (a Baumgarte bias
    # on a deep DOUBLE-SIDED pinch pumps opposing impulses without bound
    # — measured: unbounded ln, lateral drift, launch at phase changes);
    # penetration is fixed by the momentum-free pseudo pass below.
    # engagement ramp: a position controller develops stall force only
    # when BLOCKED — a grazing first touch must not get the full motor
    # force (20 N on a ~100 g object is a 200 m/s^2 kick that ejects it
    # before the opposite pad arrives; measured).  Penetration depth is
    # the stall signal: the commanded finger track deliberately overlaps
    # the object by the squeeze depth, so only the held squeeze (not the
    # approach) reaches full force.
    engage = jnp.clip(c.pen / pp.stall_pen, 0.0, 1.0)
    # Finger motor model: each finger is its own motor pressing at stall
    # force when blocked (PyBullet maxForce position control commanded
    # past the surface, panda_scene.py:427-428).  Three measured failure
    # modes shaped this:
    #  * pure complementarity: the kinematic squeeze approaches at only
    #    ~5 mm/s, so a cold contact's impulse RATCHETS toward the stall
    #    share at ~2e-4 N s/iteration (~800 iterations to get there) —
    #    any contact churn (the object sliding a few mm along the pads)
    #    resets the warm start and grip force collapses 10-30x: lifts
    #    drop the object.
    #  * per-contact pinning at the stall share: the two pads' pinned
    #    force centroids form a COUPLE with nothing to rebalance it —
    #    the object spins out of the pinch (tilt ramps from lift onset,
    #    omega to 7 rad/s, pen 6.6 mm -> 0).
    #  * one shared budget over both pads: asymmetric contact counts
    #    give asymmetric side totals and extrude the object laterally.
    # The model that works: pin each PAD's TOTAL normal impulse at its
    # (engagement-ramped) stall share, and distribute it across that
    # pad's contacts by complementarity — each iteration the plain
    # projected update shapes the distribution (approaching samples gain
    # share, separating ones lose it, resisting rotation), then a
    # simplex rescale restores the pad total.  Engagement gates grazing
    # first touches so the approach doesn't eject the object.
    is_f = c.finger > 0.5
    pad_w = [(jnp.abs(c.finger - pad_val) < 0.25) * c.active * engage
             for pad_val in (1.0, 2.0)]
    # opposition gating: a position-controlled finger pushing a FREE
    # object never stalls (the object accelerates away) — stall force
    # needs the opposing pad.  Without it, the first finger to touch
    # presses one-sided at 20 N and shoves the object ~8 mm across the
    # gripper before the second pad catches (measured), seeding a
    # twisted, marginal grip.
    eng = [jnp.minimum(w.sum(), 1.0) for w in pad_w]
    pad_tot = [pp.pinch_force * pp.dt * e * eng[1 - i]
               for i, e in enumerate(eng)]

    def pin_pad_totals(ln):
        """Rescale each pad's normal impulses to sum to the pad's stall
        share, keeping the iteration's relative distribution (seeded by
        engagement so a fresh contact set still splits sensibly)."""
        out = ln
        for w, tot in zip(pad_w, pad_tot):
            m = w > 0.0
            d = jnp.where(m, ln + 1e-3 * tot * w, 0.0)
            out = jnp.where(m, tot * d / jnp.maximum(d.sum(), 1e-12), out)
        return out

    ln_cap = jnp.inf

    # Patch-level angular friction.  Per-point Coulomb friction converges
    # the translational modes in a few relaxed parallel iterations, but
    # the COUPLE mode (counter-rotating tangential pairs across the
    # patch) converges far too slowly — measured: gravity's ~0.01 N m
    # pendulum torque on a pinched cylinder out-paces the solve by
    # ~0.08 rad/s per substep and the object spins out of the grasp.  A
    # gripped patch is physically a SURFACE contact: give it an angular
    # Coulomb budget (cap = mu * sum(ln_finger) * r_patch, the exact
    # torque capacity of the distributed point friction it stands in
    # for) braking the object's angular velocity relative to the HAND's
    # rigid motion (least-squares twist fit of the pad sample
    # velocities).  No engagement => zero budget: closing on air still
    # fails honestly.  (PyBullet ships spinning/rolling friction for the
    # same reason, btConeTwist-style.)
    w_pat = jnp.stack(pad_w).sum(0)                       # [C]
    W_pat = w_pat.sum()
    inv_w = 1.0 / jnp.maximum(W_pat, 1e-9)
    pbar = (w_pat[:, None] * c.p).sum(0) * inv_w
    vbar = (w_pat[:, None] * c.v_other).sum(0) * inv_w
    r_pat = c.p - pbar
    r2 = jnp.einsum("ca,ca->c", r_pat, r_pat)
    A = (w_pat[:, None, None]
         * (r2[:, None, None] * jnp.eye(3)
            - jnp.einsum("ca,cb->cab", r_pat, r_pat))).sum(0)
    bvec = (w_pat[:, None]
            * jnp.cross(r_pat, c.v_other - vbar)).sum(0)
    w_hand = jnp.linalg.solve(A + 1e-8 * jnp.eye(3), bvec)
    w_hand = jnp.where(W_pat > 1e-6, w_hand, jnp.zeros(3))
    r_patch = jnp.sqrt((w_pat * r2).sum() * inv_w)        # RMS patch radius
    i_world = jnp.linalg.inv(i_inv + 1e-12 * jnp.eye(3))

    # Patch-level LINEAR friction (the translational sibling of the
    # angular brake above).  The pinch's ~50 contacts all share the same
    # tangent directions, so the alignment split divides each per-contact
    # friction correction by ~50 and the BULK slip mode (the object
    # sliding down the pads under gravity) needs ~50 Jacobi iterations
    # per substep — at 96 most grips converge, but marginal ones still
    # creep (suite scene 61: held object slips to 0.28 m below the hand
    # at 96 iterations, holds at 192; measured).  Solve that single 3-DOF
    # mode exactly: one aggregate impulse at the patch centroid braking
    # the body's velocity there to the pads' mean motion, accumulator
    # clamped to the SAME per-iteration Coulomb budget the per-point
    # friction it stands in for would give (mu * total finger normal).
    # The pinch-axis component is projected out so the brake never
    # fights the motor squeeze or the normal complementarity.
    a_pinch = (pad_w[0][:, None] * c.n).sum(0)
    a_pinch = a_pinch / jnp.maximum(jnp.linalg.norm(a_pinch), 1e-9)
    rbar = (w_pat[:, None] * rarm).sum(0) * inv_w
    S = jnp.cross(jnp.eye(3), rbar[None])           # crossmat(rbar) rows
    K_pat = spec.inv_mass * jnp.eye(3) - S @ i_inv @ S
    K_inv = jnp.linalg.inv(K_pat + 1e-8 * jnp.eye(3))

    def body(_, carry):
        v, w, ln, l1, l2, la, ll = carry
        v_rel = v[None] + jnp.cross(w[None], rarm) - c.v_other
        vn = jnp.einsum("ca,ca->c", c.n, v_rel)
        ln_new = pin_pad_totals(
            jnp.clip(ln - omega * vn / k_n, 0.0, ln_cap) * c.active)
        d_n = ln_new - ln
        v1 = jnp.einsum("ca,ca->c", t1, v_rel)
        v2 = jnp.einsum("ca,ca->c", t2, v_rel)
        cap = pp.mu * ln_new
        l1_new = jnp.clip(l1 - omega * v1 / k_1, -cap, cap) * c.active
        l2_new = jnp.clip(l2 - omega * v2 / k_2, -cap, cap) * c.active
        imp = (d_n[:, None] * c.n + (l1_new - l1)[:, None] * t1
               + (l2_new - l2)[:, None] * t2)
        p_tot = imp.sum(0)
        tau = jnp.cross(rarm, imp).sum(0)
        v, w = v + spec.inv_mass * p_tot, w + i_inv @ tau
        ln_f_tot = jnp.where(is_f, ln_new, 0.0).sum()
        # patch linear brake (see header comment): exact one-step solve
        # of the bulk tangential stick mode at the patch centroid.  The
        # budget is the SHARED Coulomb budget minus what the per-point
        # finger friction already spends in the patch plane — combined
        # capacity stays mu * ln_tot, so an overweight object still
        # slips honestly (a naive additive cap doubled the capacity and
        # magically carried the 40x test mass; measured).
        v_pat = v + jnp.cross(w, rbar) - vbar
        v_t = v_pat - a_pinch * jnp.dot(a_pinch, v_pat)
        ll_new = ll - omega * (K_inv @ v_t)
        ll_new = ll_new - a_pinch * jnp.dot(a_pinch, ll_new)
        f_pt = (jnp.where(is_f[:, None],
                          l1_new[:, None] * t1 + l2_new[:, None] * t2,
                          0.0)).sum(0)
        f_pt = f_pt - a_pinch * jnp.dot(a_pinch, f_pt)
        cap_lin = jnp.maximum(
            pp.mu * ln_f_tot - jnp.linalg.norm(f_pt), 0.0)
        nrm_l = jnp.linalg.norm(ll_new)
        ll_new = ll_new * jnp.minimum(
            cap_lin / jnp.maximum(nrm_l, 1e-12), 1.0)
        d_l = ll_new - ll
        v = v + spec.inv_mass * d_l
        w = w + i_inv @ jnp.cross(rbar, d_l)
        # patch angular brake (see header comment): exact one-step solve
        # of the angular stick constraint, accumulator clamped to the
        # patch's Coulomb torque budget
        cap_ang = pp.mu * ln_f_tot * r_patch
        la_new = la - omega * (i_world @ (w - w_hand))
        nrm = jnp.linalg.norm(la_new)
        la_new = la_new * jnp.minimum(
            cap_ang / jnp.maximum(nrm, 1e-12), 1.0)
        w = w + i_inv @ (la_new - la)
        return (v, w, ln_new, l1_new, l2_new, la_new, ll_new)

    zero = jnp.zeros(c.pen.shape, jnp.float32)
    v0, w0 = state.v, state.w
    ln0 = pin_pad_totals(zero)
    l10 = l20 = zero
    if warm is not None:
        ln0 = pin_pad_totals(jnp.maximum(warm[0], 0.0) * c.active)
        cap0 = pp.mu * ln0
        l10 = jnp.clip(warm[1], -cap0, cap0) * c.active
        l20 = jnp.clip(warm[2], -cap0, cap0) * c.active
        imp0 = ln0[:, None] * c.n + l10[:, None] * t1 + l20[:, None] * t2
        v0 = v0 + spec.inv_mass * imp0.sum(0)
        w0 = w0 + i_inv @ jnp.cross(rarm, imp0).sum(0)
    v, w, ln, l1, l2, _, _ = jax.lax.fori_loop(
        0, iters, body, (v0, w0, ln0, l10, l20,
                         jnp.zeros(3, jnp.float32),
                         jnp.zeros(3, jnp.float32)))

    # pseudo pass: positional projection out of penetration with impulses
    # that move the BODY POSE but never enter its momentum (split-impulse
    # scheme).  Capped so deep penetration translates to at most
    # v_depen_max of positional creep per second of simulation.  FINGER
    # contacts are excluded: their penetration is the COMMANDED squeeze
    # (the motor model presses through it deliberately), and projecting
    # it out pushes the object along the net pad normal with nothing
    # opposing (the pseudo pass has no friction) — measured ~0.2 mm per
    # substep of unopposed tangential drift (= v_depen_max scale on the
    # pinch asymmetry) that walks the object out of the grip mid-lift.
    bias = jnp.minimum(pp.beta / pp.dt * jnp.maximum(c.pen - pp.slop, 0.0),
                       pp.v_depen_max) * (1.0 - c.finger.clip(0.0, 1.0))

    def pbody(_, carry):
        pv, pw, pl = carry
        vrel = pv[None] + jnp.cross(pw[None], rarm)
        vn = jnp.einsum("ca,ca->c", c.n, vrel)
        pl_new = jnp.maximum(pl + omega * (bias - vn) / k_n, 0.0) * c.active
        d = (pl_new - pl)[:, None] * c.n
        return (pv + spec.inv_mass * d.sum(0),
                pw + i_inv @ jnp.cross(rarm, d).sum(0), pl_new)

    pv, pw, _ = jax.lax.fori_loop(
        0, max(iters // 4, 4), pbody,
        (jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32), zero))
    return v, w, (ln, l1, l2), pv, pw


def _substep(spec: RigidBodySpec, world: StaticWorld, pp: PhysParams,
             state: BodyState, sph: jnp.ndarray, sph_v: jnp.ndarray,
             is_finger: jnp.ndarray, pad_base, pad_base_next, pad_axis,
             pad_samples, jv, jv_cmd, jv_ref,
             warm_pools, k_robot: int, k_pad: int, k_world: int,
             iters: int):
    rc = _robot_contacts(spec, state, sph, sph_v, is_finger,
                         pp.sphere_radius, k_robot)
    # finger position control with stall (the reference commands the
    # fingers to 0 and lets the motor stall on the object,
    # panda_scene.py:427-428): the joint value is DYNAMIC state — it
    # advances toward the command at the motor rate while its pad is
    # unopposed, and freezes once the pad penetrates to the stall depth.
    # Precomputed stops can't do this: the object drifts a few mm during
    # playback and a stop sweep against its original pose leaves one pad
    # hovering 1 mm short (measured on suite scene 0) — the grip must
    # close on the object WHERE IT IS.  Opening (jv_cmd > jv) is never
    # blocked.  No FK enters the scan: the pad pose is its precomputed
    # track composed with a link-frame translation by (jv - jv_ref).
    pad_pose = _pad_pose(pad_base, pad_axis, jv - jv_ref)
    pen2 = _pad_probe_pen(spec, state, pad_pose, pad_samples)
    step = jnp.clip(jv_cmd - jv, -pp.finger_rate * pp.dt,
                    pp.finger_rate * pp.dt)
    stalled = (pen2 >= pp.stall_pen) & (step < 0.0)
    jv_next = jnp.where(stalled, jv, jv + step)
    pad_next = _pad_pose(pad_base_next, pad_axis, jv_next - jv_ref)
    pc = _pad_contacts(spec, state, pad_pose, pad_next, pad_samples,
                       pp.dt, k_pad)
    wc = _world_contacts(spec, world, state, k_world)
    parts = (rc, pc, wc)
    c = Contacts(*[jnp.concatenate(fields) for fields in zip(*parts)])
    kr, kp = rc.active.shape[0], pc.active.shape[0]
    lane_of = (slice(0, kr), slice(kr, kr + kp), slice(kr + kp, None))
    # gather warm impulses by contact identity (sphere index / (pad,
    # sample) index / surface sample index) — lanes churn under top-k,
    # identities don't
    warm = tuple(
        jnp.concatenate([warm_pools[j][i][parts[j].src] for j in range(3)])
        for i in range(3))
    v = state.v + pp.gravity * pp.dt
    st = state._replace(v=v)
    v, w, lams, pv, pw = _solve_contacts(spec, st, c, pp, iters, warm)
    new_pools = tuple(
        tuple(jnp.zeros_like(warm_pools[j][i]).at[parts[j].src].set(
            lams[i][lane_of[j]] * parts[j].active) for i in range(3))
        for j in range(3))
    decay_l = jnp.exp(-pp.damp_lin * pp.dt)
    decay_a = jnp.exp(-pp.damp_ang * pp.dt)
    v, w = v * decay_l, w * decay_a
    # pseudo velocities advance the pose but are NOT kept in the state
    x = state.x + (v + pv) * pp.dt
    q = _quat_integrate(state.q, w + pw, pp.dt)
    diag = {"robot_impulse": lams[0][:kr + kp].sum(),  # grasp-force signal
            "robot_contacts": rc.active.sum() + pc.active.sum(),
            "world_contacts": wc.active.sum(),
            "pad_pen_max": jnp.max(pc.pen * pc.active),
            "jv": jv_next, "q": q, "w": w}
    return BodyState(x=x, q=q, v=v, w=w), new_pools, jv_next, diag


@functools.partial(jax.jit, static_argnums=(11, 12, 13, 14))
def rollout(spec: RigidBodySpec, world: StaticWorld, pp: PhysParams,
            state0: BodyState, sph_track: jnp.ndarray,
            is_finger: jnp.ndarray | None = None,
            pad_track: jnp.ndarray | None = None,
            pad_samples: jnp.ndarray | None = None,
            pad_axis: jnp.ndarray | None = None,
            jv_track: jnp.ndarray | None = None,
            jv_ref: jnp.ndarray | None = None,
            k_robot: int = 48, k_pad: int = 32, k_world: int = 48,
            iters: int = 48):
    """Simulate the full substep track in one scan.

    ``sph_track [T+1, K, 3]``: world positions of the robot's collision
    points at each substep boundary (precomputed by batched FK — the arm
    is kinematic, so its whole motion is known up front and the scan body
    contains no FK).  ``is_finger [K]`` marks finger-link spheres (those
    contact through the sampled pad surfaces instead).  ``pad_track
    [T+1, 2, 4, 4]``: the finger-pad frames per substep boundary, built
    at the fixed joint values ``jv_ref [2]``; ``pad_samples [2, Sp, 3]``:
    fixed pad-frame surface sample grids (contact candidates against the
    body's SDF — see ``_pad_contacts`` for why the resolution lives on
    the pad, not the object).  ``pad_axis [2, 3]``: each finger's
    prismatic axis in its pad frame; ``jv_track [T+1, 2]``: COMMANDED
    finger joint values — the realized joint value is dynamic state with
    motor-stall semantics (see ``_substep``).
    Returns (final BodyState, traces) where traces hold the body
    position/velocity/orientation, realized finger joints, the summed
    robot-contact normal impulse (the grasp-force signal), and contact
    counts per substep.
    """
    sph_a = sph_track[:-1]
    sph_v = (sph_track[1:] - sph_track[:-1]) / pp.dt
    if is_finger is None:
        is_finger = jnp.zeros(sph_track.shape[1], jnp.float32)
    if pad_track is None:
        far = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(1e3)
        pad_track = jnp.broadcast_to(
            far, (sph_track.shape[0], 2, 4, 4))
    if pad_samples is None:   # independent default: a caller may pass a
        pad_samples = jnp.zeros((2, 1, 3), jnp.float32)  # pad_track alone
    if pad_axis is None:
        pad_axis = jnp.zeros((2, 3), jnp.float32)
    if jv_track is None:
        jv_track = jnp.zeros((sph_track.shape[0], 2), jnp.float32)
    if jv_ref is None:
        jv_ref = jnp.zeros(2, jnp.float32)
    zr = lambda m: tuple(jnp.zeros(m, jnp.float32) for _ in range(3))  # noqa: E731
    pools0 = (zr(sph_track.shape[1]), zr(2 * pad_samples.shape[1]),
              zr(spec.surf.shape[0]))

    def step(carry, inp):
        state, pools, jv = carry
        sph, sv, pad, pad_nxt, jv_cmd = inp
        nxt, pools, jv, diag = _substep(
            spec, world, pp, state, sph, sv, is_finger, pad, pad_nxt,
            pad_axis, pad_samples, jv, jv_cmd, jv_ref,
            pools, k_robot, k_pad, k_world, iters)
        diag["x"] = nxt.x
        diag["v"] = nxt.v
        return (nxt, pools, jv), diag

    (final, _, _), traces = jax.lax.scan(
        step, (state0, pools0, jv_track[0]),
        (sph_a, sph_v, pad_track[:-1], pad_track[1:], jv_track[1:]))
    return final, traces
