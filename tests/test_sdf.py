"""SDF container / stack / hinge-potential query tests.

The query oracle is an independent numpy implementation of the semantics
documented for ``layers/sdf_matching_loss_kernel.cu:96-195`` (trilinear with
C-truncation indexing, out-of-volume => 1.0, one-grid-cell central
differences, hinge potential, world-frame gradient rotation, per-object sum).
"""

import numpy as np
import jax.numpy as jnp

from omg_planner_tpu.ops.sdf import (
    SceneSDF, SignedDensityField, combine_sdfs, sdf_potentials)


def np_trilinear(data, limits, p):
    d0, d1, d2 = (int(limits[6]), int(limits[7]), int(limits[8]))
    mn, mx = limits[0:3], limits[3:6]
    pg = (p - mn) / (mx - mn) * np.array([d0, d1, d2])
    c = np.trunc(pg - 0.5).astype(int)
    f = (pg - 0.5) - c
    x0, y0, z0 = c
    if not (x0 >= 0 and x0 + 1 < d0 and y0 >= 0 and y0 + 1 < d1
            and z0 >= 0 and z0 + 1 < d2):
        return 1.0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1])
                     * (f[2] if dz else 1 - f[2]))
                out += w * data[x0 + dx, y0 + dy, z0 + dz]
    return out


def np_query(data, limits, inv_pose, point, eps, pad, clear):
    p_obj = inv_pose[:3, :3] @ point + inv_pose[:3, 3]
    d0, d1, d2 = (int(limits[6]), int(limits[7]), int(limits[8]))
    mn, mx = limits[0:3], limits[3:6]
    delta = limits[9]
    val = np_trilinear(data, limits, p_obj)
    # gradient: +- one grid cell in object grid coords
    cell = (mx - mn) / np.array([d0, d1, d2])
    g = np.zeros(3)
    for a in range(3):
        dp = np.zeros(3); dp[a] = cell[a]
        g[a] = 0.5 * (np_trilinear(data, limits, p_obj + dp)
                      - np_trilinear(data, limits, p_obj - dp)) / delta
    collide = 1.0 if val < clear else 0.0
    if val <= 0:
        pot = -val + 0.5 * eps
        vg = -g
    elif val <= eps:
        pot = (val - eps) ** 2 / (2 * eps) * pad
        vg = g * (val - eps) / eps * pad
    else:
        return 0.0, np.zeros(3), collide
    return pot, inv_pose[:3, :3].T @ vg, collide


def test_analytic_box_sdf_values():
    f = SignedDensityField.from_analytic("box", [0.1, 0.2, 0.3], delta=0.01)
    # cell-center at origin should be deep inside: -min(half) approx
    assert abs(f.get_distance(np.zeros(3)) - (-0.05)) < 0.011
    # far corner outside
    assert f.get_distance(np.array([0.2, 0.2, 0.3])) > 0.05


def test_analytic_sphere_gradient_direction():
    f = SignedDensityField.from_analytic("sphere", [0.08], delta=0.005)
    scene = combine_sdfs([f])
    pts = jnp.asarray(np.array([[0.1, 0.0, 0.0], [0.0, 0.12, 0.0]]), jnp.float32)
    inv = jnp.eye(4)[None]
    pot, grad, col = sdf_potentials(
        scene, inv, pts, jnp.asarray([0.2]), jnp.asarray([1.0]),
        jnp.asarray([0.01]), jnp.asarray([0.0]))
    g = np.array(grad)
    # in the epsilon band, grad points along (d - eps) * outward normal < 0
    # i.e. towards the obstacle -> negative x for the first point
    assert g[0, 0] < 0 and abs(g[0, 1]) < 1e-2
    assert float(pot[0]) > 0
    assert float(col[0]) == 0.0


def test_query_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    f1 = SignedDensityField.from_analytic("box", [0.12, 0.09, 0.2], delta=0.008)
    f2 = SignedDensityField.from_analytic("sphere", [0.06], delta=0.006)
    scene = combine_sdfs([f1, f2])
    limits = np.array(scene.limits)
    data = np.array(scene.data)

    # random rigid poses
    def rand_pose():
        a = rng.normal(size=3)
        theta = np.linalg.norm(a); a = a / theta
        k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        r = np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * k @ k
        m = np.eye(4); m[:3, :3] = r; m[:3, 3] = rng.normal(scale=0.1, size=3)
        return m

    poses = [rand_pose(), rand_pose()]
    inv_poses = np.array([np.linalg.inv(p) for p in poses], np.float32)
    eps = np.array([0.2, 0.1], np.float32)
    pad = np.array([1.0, 0.5], np.float32)
    clear = np.array([0.01, 0.0], np.float32)
    disab = np.array([0.0, 0.0], np.float32)

    pts = rng.uniform(-0.25, 0.25, (50, 3)).astype(np.float32)
    pot, grad, col = sdf_potentials(
        scene, jnp.asarray(inv_poses), jnp.asarray(pts), jnp.asarray(eps),
        jnp.asarray(pad), jnp.asarray(clear), jnp.asarray(disab))
    pot, grad, col = np.array(pot), np.array(grad), np.array(col)

    for i in range(50):
        ep = np.zeros(1)
        p_ref, g_ref, c_ref = 0.0, np.zeros(3), 0.0
        for o in range(2):
            po, go, co = np_query(data[o], limits[o], inv_poses[o], pts[i],
                                  eps[o], pad[o], clear[o])
            p_ref += po; g_ref += go; c_ref += co
        assert abs(pot[i] - p_ref) < 1e-4, i
        np.testing.assert_allclose(grad[i], g_ref, atol=1e-3)
        assert col[i] == c_ref


def test_disable_mask():
    f = SignedDensityField.from_analytic("sphere", [0.1], delta=0.01)
    scene = combine_sdfs([f])
    pts = jnp.zeros((1, 3))
    inv = jnp.eye(4)[None]
    pot, grad, col = sdf_potentials(
        scene, inv, pts, jnp.asarray([0.2]), jnp.asarray([1.0]),
        jnp.asarray([0.01]), jnp.asarray([1.0]))
    assert float(pot[0]) == 0.0 and float(col[0]) == 0.0


def test_combine_padding_preserves_cell_size():
    f1 = SignedDensityField.from_analytic("box", [0.1, 0.1, 0.1], delta=0.01)
    f2 = SignedDensityField.from_analytic("box", [0.3, 0.3, 0.3], delta=0.01)
    scene = combine_sdfs([f1, f2])
    lim = np.array(scene.limits)
    for o, f in enumerate([f1, f2]):
        d = lim[o, 3:6] - lim[o, 0:3]
        cells = lim[o, 6:9]
        np.testing.assert_allclose(d / cells, f.delta, rtol=1e-5)


def test_penalize_inside_and_resize():
    f = SignedDensityField.from_analytic("sphere", [0.1], delta=0.01)
    inside_before = f.get_distance(np.zeros(3))
    f.penalize_inside(5.0)
    assert abs(f.get_distance(np.zeros(3)) - 5 * inside_before) < 1e-6
    d0 = f.delta
    f.resize(2.0)
    assert abs(f.delta - 2 * d0) < 1e-9


def test_baked_matches_exact_interior():
    """The 4-channel baked query must match the exact 7-trilinear query away
    from the outermost cells (see BakedSceneSDF docstring)."""
    import jax
    from omg_planner_tpu.ops.sdf import bake_scene

    rng = np.random.default_rng(9)
    f1 = SignedDensityField.from_analytic("box", [0.1, 0.08, 0.12],
                                          delta=0.008)
    f2 = SignedDensityField.from_analytic("sphere", [0.06], delta=0.006)
    scene = combine_sdfs([f1, f2])
    baked = jax.jit(bake_scene)(scene)
    pose = np.eye(4)
    pose[:3, 3] = [0.05, -0.02, 0.01]
    inv = jnp.asarray(np.stack([np.linalg.inv(pose), np.eye(4)]), jnp.float32)
    eps = jnp.asarray([0.2, 0.1])
    pad = jnp.asarray([1.0, 1.0])
    clear = jnp.asarray([0.01, 0.0])
    dis = jnp.asarray([0.0, 0.0])
    # probes comfortably inside BOTH volumes (the smaller sphere volume has
    # half-extent 0.132; OOB-boundary gradients differ by design — the
    # reference's out-of-volume => 1.0 convention makes them artifacts in
    # either path)
    pts = jnp.asarray(rng.uniform(-0.07, 0.07, (300, 3)), jnp.float32)
    p1, g1, c1 = sdf_potentials(scene, inv, pts, eps, pad, clear, dis)
    p2, g2, c2 = sdf_potentials(baked, inv, pts, eps, pad, clear, dis)
    np.testing.assert_allclose(np.array(p1), np.array(p2), atol=1e-5)
    np.testing.assert_allclose(np.array(c1), np.array(c2), atol=0)
    np.testing.assert_allclose(np.array(g1), np.array(g2), atol=1e-3)


def test_device_synth_matches_host_combine():
    """Device-side analytic stack synthesis (stage_scene_sdfs) must
    reproduce the host combine_sdfs+bake path: same limits, same padded
    volumes (f32-rounding tolerance), same baked gradient channels."""
    import jax
    from omg_planner_tpu.ops.sdf import bake_scene, stage_scene_sdfs

    fields = [
        SignedDensityField.from_analytic("box", [0.1, 0.24, 0.06],
                                         delta=0.008),
        SignedDensityField.from_analytic("sphere", [0.05], delta=0.006),
        SignedDensityField.from_analytic("cylinder", [0.03, 0.14],
                                         delta=0.0075),
    ]
    fields[0].penalize_inside(5.0)
    fields[1].penalize_inside(5.0).resize(1.5)

    ref = jax.jit(bake_scene)(combine_sdfs(fields, pad_to=(64, 64, 64)))
    out = stage_scene_sdfs(fields, baked=True, pad_to=(64, 64, 64))
    np.testing.assert_allclose(np.array(out.limits), np.array(ref.limits),
                               rtol=1e-6)
    np.testing.assert_allclose(np.array(out.data4), np.array(ref.data4),
                               atol=2e-5)
    # unbaked variant + fallback parity when one field is data-backed
    out2 = stage_scene_sdfs(fields, baked=False)
    ref2 = combine_sdfs(fields)
    np.testing.assert_allclose(np.array(out2.data), np.array(ref2.data),
                               atol=5e-6)
    grid = SignedDensityField(fields[1].data.copy(), fields[1].origin,
                              fields[1].delta)
    mixed = stage_scene_sdfs([fields[0], grid], baked=False)
    refm = combine_sdfs([fields[0], grid])
    np.testing.assert_array_equal(np.array(mixed.data), np.array(refm.data))


def test_lazy_analytic_grid_is_deferred():
    f = SignedDensityField.from_analytic("box", [0.1, 0.1, 0.1], delta=0.01)
    assert f._data is None and f.analytic is not None
    assert f.shape == (f.nx, f.ny, f.nz)
    _ = f.data  # materializes
    assert f._data is not None and f._data.shape == f.shape
