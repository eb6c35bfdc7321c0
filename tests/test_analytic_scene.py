"""Grid-free analytic collision backend (ops/sdf.py::AnalyticScene).

The backend evaluates the TRUE primitive SDF + closed-form gradient at
query points instead of gathering from voxel stacks.  Semantics target:
the same hinge/reduce pipeline as the voxel query (which itself oracles
against ``layers/sdf_matching_loss_kernel.cu:96-195``), with the
voxelization + trilinear interpolation error removed.
"""

import numpy as np
import jax
import jax.numpy as jnp

from omg_planner_tpu.ops.sdf import (
    AnalyticScene, SignedDensityField, _analytic_sdf_grad,
    _analytic_sdf_points, combine_sdfs, make_analytic_scene, sdf_potentials)


def _fields():
    return [
        SignedDensityField.from_analytic("box", [0.12, 0.09, 0.2],
                                         delta=0.004),
        SignedDensityField.from_analytic("sphere", [0.06], delta=0.004),
        SignedDensityField.from_analytic("cylinder", [0.05, 0.05, 0.11],
                                         delta=0.004),
    ]


def _rand_inv_poses(rng, n):
    out = []
    for _ in range(n):
        a = rng.normal(size=3)
        theta = np.linalg.norm(a)
        a = a / theta
        k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                      [-a[1], a[0], 0]])
        r = np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * k @ k
        m = np.eye(4)
        m[:3, :3] = r
        m[:3, 3] = rng.normal(scale=0.1, size=3)
        out.append(np.linalg.inv(m))
    return np.asarray(out, np.float32)


def test_closed_form_grad_matches_autodiff():
    """_analytic_sdf_grad == jax.grad(_analytic_sdf_points) at random
    points for every primitive kind, inside and outside."""
    rng = np.random.default_rng(3)
    kinds = jnp.asarray([0, 1, 2], jnp.int32)
    halfs = jnp.asarray([[0.12, 0.09, 0.2], [0.06, 0.06, 0.06],
                         [0.05, 0.05, 0.11]], jnp.float32)
    penals = jnp.asarray([1.0, 5.0, 2.0], jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 200, 3)), jnp.float32)

    d, g = _analytic_sdf_grad(kinds, halfs, penals, pts)

    def val_one(p, k, h, pen):
        return _analytic_sdf_points(k[None], h[None], pen[None],
                                    p[None, None])[0, 0]

    g_ad = jax.vmap(
        lambda k, h, pen, ps: jax.vmap(
            lambda p: jax.grad(val_one)(p, k, h, pen))(ps)
    )(kinds, halfs, penals, pts)
    d_ref = _analytic_sdf_points(kinds, halfs, penals, pts)

    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-6)
    # autodiff NaNs at interior points (sqrt(0) through the outside
    # branch); the closed form must be finite EVERYWHERE and match where
    # autodiff is defined
    g, g_ad = np.asarray(g), np.asarray(g_ad)
    assert np.isfinite(g).all()
    ok = np.isfinite(g_ad).all(axis=-1)
    assert ok.mean() > 0.5  # most random points are smooth
    np.testing.assert_allclose(g[ok], g_ad[ok], atol=1e-4)


def test_analytic_matches_fine_voxel_query():
    """Potential/gradient/collide from the grid-free backend match the
    fine-grid voxel query to interpolation-error tolerance."""
    rng = np.random.default_rng(11)
    fields = _fields()
    voxel = combine_sdfs(fields)
    analytic = make_analytic_scene(fields)
    assert isinstance(analytic, AnalyticScene)

    inv_poses = jnp.asarray(_rand_inv_poses(rng, 3))
    # keep the epsilon band inside the voxel volume's 48 mm margin
    # (12 pad cells x 4 mm): OUTSIDE it the voxel query truncates to 0
    # while the analytic backend gives the true band value — a documented
    # improvement, not a parity target
    eps = jnp.asarray([0.04, 0.03, 0.035], jnp.float32)
    pad = jnp.asarray([1.0, 0.5, 2.0], jnp.float32)
    clear = jnp.asarray([0.01, 0.0, 0.0], jnp.float32)
    disab = jnp.zeros(3, jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (400, 3)), jnp.float32)

    pv, gv, cv = sdf_potentials(voxel, inv_poses, pts, eps, pad, clear,
                                disab)
    pa, ga, ca = sdf_potentials(analytic, inv_poses, pts, eps, pad, clear,
                                disab)
    # value error bounded by the 4 mm grid + hinge slope; gradient by the
    # one-cell central difference of the voxel path
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pv), atol=0.02)
    assert float(jnp.abs(ga - gv).mean()) < 0.05
    # collide flags agree except within a cell of the surface
    assert float(jnp.abs(ca - cv).mean()) < 0.05


def test_make_analytic_scene_rejects_data_backed():
    f = SignedDensityField.from_analytic("box", [0.1, 0.1, 0.1],
                                         delta=0.01)
    data = SignedDensityField(
        np.asarray(f.data), np.asarray(f.origin, np.float64),
        float(f.delta))
    assert make_analytic_scene([f, data]) is None
    assert make_analytic_scene([]) is None


def test_disable_and_penalty_semantics():
    """Disabled objects contribute nothing; inside-penalty scales the
    inside distance exactly like the voxel bake does."""
    f = SignedDensityField.from_analytic("sphere", [0.1], delta=0.01)
    f.penalize_inside(5.0)
    scene = make_analytic_scene([f])
    assert float(scene.penals[0]) == 5.0
    pts = jnp.zeros((1, 3))
    inv = jnp.eye(4)[None]
    args = (jnp.asarray([0.2]), jnp.asarray([1.0]), jnp.asarray([0.0]))
    pot_on, _, col_on = sdf_potentials(scene, inv, pts, *args,
                                       jnp.asarray([0.0]))
    pot_off, _, col_off = sdf_potentials(scene, inv, pts, *args,
                                         jnp.asarray([1.0]))
    # inside: pot = -d*pen + eps/2 = 0.5 + 0.1
    assert abs(float(pot_on[0]) - 0.6) < 1e-5
    assert float(col_on[0]) == 1.0
    assert float(pot_off[0]) == 0.0 and float(col_off[0]) == 0.0


def test_pad_objects_analytic_is_noop_on_potentials():
    from omg_planner_tpu.config import OMGConfig
    from omg_planner_tpu.parallel.batch import pad_objects
    import __graft_entry__ as ge

    cfg = OMGConfig(optim_steps=2, extra_smooth_steps=1, timesteps=10,
                    goal_set_max_num=8, ik_seed_num=2, ik_max_iters=10,
                    learner_interp_steps=5, silent=True)
    model, problem = ge._tiny_problem(cfg)
    assert isinstance(problem.scene, AnalyticScene)
    padded = pad_objects(problem, problem.scene.num_objects + 3)
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)), jnp.float32)

    def q(p):
        return sdf_potentials(
            p.scene, p.cost_params.inv_poses, pts, p.cost_params.epsilons,
            p.cost_params.padding_scales, p.cost_params.clearances,
            p.cost_params.disables)

    for a, b in zip(q(problem), q(padded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rounding_preserves_faces_and_interior():
    """Edge rounding (ops/sdf.py::_analytic_sdf_points) must equal the
    sharp field at face-normal lines and in the deep interior — only
    edge/corner neighborhoods may differ (DESIGN.md 3c)."""
    import numpy as np
    import jax.numpy as jnp
    from omg_planner_tpu.ops.sdf import (_analytic_sdf_grad,
                                         _analytic_sdf_points)

    kind = jnp.asarray([0])                     # box
    half = jnp.asarray([[0.05, 0.08, 0.03]])
    pen = jnp.asarray([5.0])
    r = jnp.asarray([0.0075])
    # points along each face normal (outside + inside), plus deep interior
    pts = []
    for ax in range(3):
        for s in (1, -1):
            for t in (0.02, 0.005, -0.005, -0.02):
                p = np.zeros(3)
                p[ax] = s * (float(half[0, ax]) + t)
                pts.append(p)
    pts.append([0.0, 0.0, 0.0])
    pts = jnp.asarray(np.asarray(pts))[None]    # [1, N, 3]

    sharp = _analytic_sdf_points(kind, half, pen, pts)
    round_ = _analytic_sdf_points(kind, half, pen, pts, rounds=r)
    np.testing.assert_allclose(np.asarray(round_), np.asarray(sharp),
                               atol=1e-6)
    ds, gs_ = _analytic_sdf_grad(kind, half, pen, pts)
    dr, gr = _analytic_sdf_grad(kind, half, pen, pts, rounds=r)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(ds), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gs_), atol=1e-6)

    # a corner point DOES differ (that's the point of the rounding) and
    # its rounded gradient is the smooth diagonal, not an axis vector
    corner = jnp.asarray([[[0.055, 0.085, 0.035]]])
    d_sharp = _analytic_sdf_points(kind, half, pen, corner)
    d_round = _analytic_sdf_points(kind, half, pen, corner, rounds=r)
    assert float(d_round[0, 0]) > float(d_sharp[0, 0]) - 1e-9
    assert abs(float(d_round[0, 0]) - float(d_sharp[0, 0])) > 1e-4
