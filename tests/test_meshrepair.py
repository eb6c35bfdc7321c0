"""Topology repair (io/meshrepair.py — the geometry part of the
reference's blender preprocessing, ``real_world/blender_process.py:53-63``:
remove_doubles + normals_make_consistent(inside=False))."""

import numpy as np

from omg_planner_tpu.io.meshrepair import (orient_faces, remove_doubles,
                                           repair_mesh)


def _cube():
    """Unit cube, outward-wound triangles."""
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                  for z in (0, 1)], np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2],          # x=0 (inward -x)
        [4, 6, 7], [4, 7, 5],          # x=1
        [0, 4, 5], [0, 5, 1],          # y=0
        [2, 3, 7], [2, 7, 6],          # y=1
        [0, 2, 6], [0, 6, 4],          # z=0
        [1, 5, 7], [1, 7, 3],          # z=1
    ])
    return v, f


def _signed_volume(v, f):
    tri = v[f]
    return np.einsum("fi,fi->f", tri[:, 0],
                     np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0


def test_cube_fixture_is_outward():
    v, f = _cube()
    assert _signed_volume(v, f) > 0.99


def test_remove_doubles_merges_and_culls():
    v, f = _cube()
    # duplicate every vertex with sub-eps jitter; faces reference the dups
    v2 = np.concatenate([v, v + 1e-9])
    f2 = np.concatenate([f, f + 8])        # duplicate faces on dup verts
    f2 = np.concatenate([f2, [[0, 0, 1]]])  # collapsed face
    nv, nf = remove_doubles(v2, f2, eps=1e-6)
    assert len(nv) == 8
    assert len(nf) == 12  # duplicates + degenerate dropped
    assert abs(_signed_volume(nv.astype(np.float64), nf)) > 0.99


def test_orient_faces_fixes_random_flips_outward():
    rng = np.random.default_rng(0)
    v, f = _cube()
    for _ in range(5):
        bad = f.copy()
        flips = rng.random(len(f)) < 0.5
        bad[flips] = bad[flips][:, ::-1]
        fixed = orient_faces(v, bad)
        # coherent AND outward: signed volume restored to +1
        assert _signed_volume(v, fixed) > 0.99
        # every shared edge traversed once in each direction
        seen = {}
        for a, b, c in fixed:
            for u, w in ((a, b), (b, c), (c, a)):
                seen[(u, w)] = seen.get((u, w), 0) + 1
        for (u, w), n in seen.items():
            assert n == 1 and seen.get((w, u), 0) == 1


def test_orient_faces_inverted_component_flips_back():
    v, f = _cube()
    inside_out = f[:, ::-1]  # coherent but inward
    fixed = orient_faces(v, inside_out)
    assert _signed_volume(v, fixed) > 0.99


def test_repair_two_components():
    v, f = _cube()
    v2 = np.concatenate([v, v + 5.0])
    f_far = f + len(v)
    bad = np.concatenate([f[:, ::-1], f_far])   # one inverted component
    rv, rf, stats = repair_mesh(v2, bad)
    assert stats["faces_out"] == 24
    assert _signed_volume(rv.astype(np.float64), rf) > 1.99  # both outward
