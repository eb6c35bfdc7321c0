"""Unit tests for config-derived operators, splines, derivatives, poses.

Golden values come from independent numpy evaluations of the reference
formulas (``omg/config.py:199-227``, ``omg/util.py:165-178,238-290``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from omg_planner_tpu.config import (
    OMGConfig, get_diff_matrix, get_horizon_params, schedule_weights)
from omg_planner_tpu.utils import pose, spline
from omg_planner_tpu.utils.diff import get_derivative


def ref_diff_matrix(n, order, dt, with_end):
    # independent construction of the banded FD matrix (util.py:165-178)
    rules = np.array([
        [0, 0, -1, 1, 0, 0, 0],
        [0, 0, 1, -2, 1, 0, 0],
        [0, -0.5, 1, 0, -1, 0.5, 0],
    ], dtype=float)
    rule = rules[order - 1]
    half = 3
    d = np.zeros((n + 1, n))
    for i in range(n + 1):
        for j in range(-half, half):
            if 0 <= i + j < n:
                d[i, i + j] = rule[j + half]
    if not with_end:
        d[-1, -1] = 0
    return d / dt**order


def test_diff_matrix_matches_reference_formula():
    for order in (1, 2, 3):
        for with_end in (True, False):
            mine = get_diff_matrix(30, order, 0.1, with_end)
            ref = ref_diff_matrix(30, order, 0.1, with_end)
            np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_horizon_params_A_and_projection():
    hp = get_horizon_params(30, 0.1, True, 5)
    d1 = get_diff_matrix(30, 1, 0.1, False)
    np.testing.assert_allclose(hp.A, d1.T @ d1, rtol=1e-5)
    np.testing.assert_allclose(hp.Ainv @ hp.A, np.eye(30), atol=1e-3)
    # projection operators: P_k g must equal Ainv g - M C Ainv g
    rng = np.random.default_rng(0)
    g = rng.normal(size=(30, 9)).astype(np.float32)
    for k in (1, 5):
        m_k, p_k = hp.proj[k]
        c = np.zeros((k, 30)); c[:, -k:] = np.eye(k)
        ainv = hp.Ainv.astype(np.float64)
        m_ref = ainv @ c.T @ np.linalg.inv(c @ ainv @ c.T)
        np.testing.assert_allclose(m_k, m_ref, atol=1e-4)
        upd_ref = ainv @ g - m_ref @ (c @ ainv @ g)
        np.testing.assert_allclose(p_k @ g, upd_ref, atol=1e-3)


def test_schedule_weights():
    cfg = OMGConfig()
    ow, sw, gw, ss = schedule_weights(cfg, 10)
    assert np.isclose(float(ow), 1.0)
    assert np.isclose(float(sw), 0.1 * 1.02**10, rtol=1e-5)
    assert np.isclose(float(ss), 0.1)


def test_cubic_interpolate_matches_scipy_clamped():
    scipy_interp = pytest.importorskip("scipy.interpolate")
    start = np.array([0.0, -1.2, 0.5])
    end = np.array([1.0, 0.3, -0.7])
    n = 30
    mine = np.array(spline.cubic_interpolate(jnp.array(start), jnp.array(end), n))
    x = np.linspace(0, 1, 2)
    t = np.linspace(0, 1, n + 2)[1:-1]
    for i in range(3):
        f = scipy_interp.CubicSpline(x, [start[i], end[i]], bc_type="clamped")
        np.testing.assert_allclose(mine[:, i], f(t), atol=1e-6)


def test_get_derivative_matches_reference_semantics():
    hp = get_horizon_params(10, 0.1, True, 5)
    rng = np.random.default_rng(1)
    data = rng.normal(size=(10, 4))
    start, end = rng.normal(size=4), rng.normal(size=4)
    for order in (1, 2):
        mine = np.array(get_derivative(hp, jnp.array(data, jnp.float32),
                                       jnp.array(start, jnp.float32),
                                       jnp.array(end, jnp.float32), order))
        # independent reference evaluation (config.py:134-159)
        rules = np.array([[0, 0, -1, 1, 0, 0, 0], [0, 0, 1, -2, 1, 0, 0],
                          [0, -0.5, 1, 0, -1, 0.5, 0]], dtype=float)
        dmat = ref_diff_matrix(10, order, 0.1, False)[:11, :10]
        dd = dmat @ data
        dd[0] += rules[order - 1][2] * start / 0.1**order
        dd[-2] += rules[order - 1][4] * end / 0.1**order
        dd[-1] += rules[order - 1][3] * end / 0.1**order
        np.testing.assert_allclose(mine, dd[:-1], rtol=1e-3, atol=1e-3)


def test_pose_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        p7 = np.concatenate([rng.normal(size=3), q]).astype(np.float32)
        mat = pose.unpack_pose(jnp.array(p7))
        back = np.array(pose.pack_pose(mat))
        np.testing.assert_allclose(back, p7, atol=1e-5)
        inv = np.array(pose.se3_inverse(mat))
        np.testing.assert_allclose(inv @ np.array(mat), np.eye(4), atol=1e-5)


def test_rotations():
    np.testing.assert_allclose(
        np.array(pose.rot_z(np.pi / 2))[:3, :3],
        np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]]), atol=1e-6)
    np.testing.assert_allclose(
        np.array(pose.rot_y(np.pi / 2))[:3, :3],
        np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]]), atol=1e-6)


def test_solve_spd_unrolled_matches_linalg_solve():
    from omg_planner_tpu.utils.linalg import solve_spd_unrolled

    rng = np.random.RandomState(7)
    for n in (3, 6):
        j = rng.randn(64, n, 9).astype(np.float32)
        a = jnp.einsum("bij,bkj->bik", j, j) + 1e-4 * jnp.eye(n)
        b = jnp.asarray(rng.randn(64, n).astype(np.float32))
        x = solve_spd_unrolled(a, b)
        ref = jnp.linalg.solve(a, b[..., None])[..., 0]
        np.testing.assert_allclose(np.array(x), np.array(ref),
                                   rtol=2e-4, atol=2e-5)
    # unbatched path (used by ik_single under vmap-free call)
    a1 = a[0]
    b1 = b[0]
    np.testing.assert_allclose(
        np.array(solve_spd_unrolled(a1, b1)),
        np.array(jnp.linalg.solve(a1, b1[..., None])[..., 0]),
        rtol=2e-4, atol=2e-5)


def test_take_rows_matches_fancy_indexing():
    from omg_planner_tpu.utils.linalg import take_rows

    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.permutation(40)[:17].astype(np.int32))
    for shape in ((40,), (40, 9), (40, 5, 4, 4)):
        a = jnp.asarray(rng.randn(*shape).astype(np.float32))
        np.testing.assert_array_equal(np.array(take_rows(a, idx)),
                                      np.array(a[idx]))
