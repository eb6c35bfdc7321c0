"""Native mesh->SDF voxelizer tests (builds the C++ library with g++)."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain")


def unit_cube_mesh(size=0.1):
    h = size / 2
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    # 12 triangles, outward winding irrelevant for distance/parity
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def test_mesh_sdf_cube():
    from omg_planner_tpu.io.meshsdf import mesh_to_sdf
    v, f = unit_cube_mesh(0.1)
    sdf = mesh_to_sdf(v, f, delta=0.005, padding=10)
    # center is inside: signed distance approx -0.05
    assert abs(sdf.get_distance(np.zeros(3)) - (-0.05)) < 0.01
    # outside point: positive, approx correct
    d = sdf.get_distance(np.array([0.1, 0.0, 0.0]))
    assert abs(d - 0.05) < 0.012
    # compare against the analytic box SDF over a probe set
    from omg_planner_tpu.ops.sdf import SignedDensityField
    ref = SignedDensityField.from_analytic("box", [0.1, 0.1, 0.1],
                                           delta=0.005)
    rng = np.random.default_rng(0)
    probes = rng.uniform(-0.08, 0.08, (200, 3))
    d_mesh = sdf.get_distance(probes)
    d_ref = ref.get_distance(probes)
    np.testing.assert_allclose(d_mesh, d_ref, atol=0.012)


def test_surface_points():
    from omg_planner_tpu.io.meshsdf import surface_points
    v, f = unit_cube_mesh(0.1)
    pts = surface_points(v, f, max_points=50)
    assert len(pts) == 20  # 12 centroids + 8 vertices
    # all points on the cube surface
    assert np.all(np.abs(pts).max(axis=1) <= 0.05 + 1e-6)


def test_process_mesh(tmp_path):
    from omg_planner_tpu.io.meshsdf import process_mesh
    v, f = unit_cube_mesh(0.08)
    obj = tmp_path / "cube.obj"
    with open(obj, "w") as fh:
        for vv in v:
            fh.write(f"v {vv[0]} {vv[1]} {vv[2]}\n")
        for ff in f:
            fh.write(f"f {ff[0]+1} {ff[1]+1} {ff[2]+1}\n")
    sdf, pts, extents = process_mesh(str(obj), out_dir=str(tmp_path),
                                     delta=0.005, padding=8)
    np.testing.assert_allclose(extents, 0.08, atol=1e-6)
    assert (tmp_path / "cube_chomp.pkl").exists()
    assert (tmp_path / "cube.xyz").exists()


def lshape_mesh():
    """A non-convex L-shaped solid (two cuboids): decomposition needs
    more than one piece."""
    from omg_planner_tpu.viz.raster import primitive_mesh

    v1, f1 = primitive_mesh("box", [0.2, 0.1, 0.1])
    v2, f2 = primitive_mesh("box", [0.1, 0.1, 0.2])
    v2 = v2 + np.array([0.05, 0.0, 0.15])  # stands on one end of the slab
    v = np.concatenate([v1, v2]).astype(np.float32)
    f = np.concatenate([f1, f2 + len(v1)]).astype(np.int32)
    return v, f


def test_convex_decompose_cube_is_one_box():
    from omg_planner_tpu.io.meshsdf import convex_decompose
    v, f = unit_cube_mesh(0.1)
    boxes = convex_decompose(v, f, voxel=0.01)
    assert len(boxes) == 1
    c, h = boxes[0, :3], boxes[0, 3:]
    assert np.abs(c).max() < 0.01
    assert np.abs(h - 0.05).max() < 0.011, boxes


def test_convex_decompose_lshape():
    from omg_planner_tpu.io.meshsdf import convex_decompose
    v, f = lshape_mesh()
    boxes = convex_decompose(v, f, voxel=0.01)
    assert 2 <= len(boxes) <= 8, len(boxes)
    # the pieces must cover both lobes
    def covers(p):
        p = np.asarray(p)
        return any(np.all(np.abs(p - b[:3]) <= b[3:] + 1e-6) for b in boxes)
    assert covers([-0.08, 0.0, 0.0])   # slab lobe
    assert covers([0.05, 0.0, 0.2])    # tower lobe
    # nothing covers free space beside the tower
    assert not covers([-0.08, 0.0, 0.2])


def test_compound_obj_round_trip(tmp_path):
    from omg_planner_tpu.io.meshsdf import (
        convex_decompose, load_obj, save_compound_obj)
    v, f = lshape_mesh()
    boxes = convex_decompose(v, f, voxel=0.01)
    p = str(tmp_path / "l_convex.obj")
    save_compound_obj(p, boxes)
    verts, faces = load_obj(p)
    assert len(verts) == 8 * len(boxes)
    assert len(faces) == 12 * len(boxes)  # 6 quads -> 12 tris per piece
