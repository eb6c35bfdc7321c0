"""Software RGB rasterizer: geometry, occlusion, and camera consistency
with the point-splat observation path."""

import numpy as np

from omg_planner_tpu.config import OMGConfig
from omg_planner_tpu.io.assets import make_primitive, pose_at
from omg_planner_tpu.viz.camera import render_point_observation
from omg_planner_tpu.viz.raster import primitive_mesh, render_rgb


def test_primitive_meshes_are_closed():
    for kind, ext in (("box", [0.1, 0.2, 0.3]), ("cylinder", [0.05, 0.2]),
                      ("sphere", [0.08])):
        v, f = primitive_mesh(kind, ext)
        assert f.min() >= 0 and f.max() < len(v)
        # every edge shared by exactly two triangles => watertight
        edges = {}
        for tri in f:
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]),
                         (tri[2], tri[0])):
                e = (min(a, b), max(a, b))
                edges[e] = edges.get(e, 0) + 1
        counts = set(edges.values())
        assert counts == {2}, (kind, counts)


def _scene():
    return [
        make_primitive("table", "box", [0.9, 1.2, 0.04],
                       pose_at([0.5, 0.0, -0.02]), compute_grasp=False),
        make_primitive("mug", "cylinder", [0.045, 0.1],
                       pose_at([0.5, 0.1, 0.05]), target=True,
                       compute_grasp=False),
        make_primitive("ball", "sphere", [0.05],
                       pose_at([0.45, -0.25, 0.05]), compute_grasp=False),
    ]


def test_render_rgb_shapes_and_content():
    objs = _scene()
    rgb, depth, seg = render_rgb(objs)
    assert rgb.shape == (120, 160, 3) and rgb.dtype == np.uint8
    # all three objects visible
    assert set(np.unique(seg)) >= {0, 1, 2}
    # the target renders in the highlight color family (yellowish)
    tgt = rgb[seg == 1].astype(float)
    assert tgt[:, 0].mean() > tgt[:, 2].mean()  # red > blue
    # lit pixels vary (shading, not flat fill)
    assert np.unique(rgb[seg == 0], axis=0).shape[0] > 1


def test_depth_consistent_with_point_splat():
    objs = _scene()
    _, depth_r, seg_r = render_rgb(objs)
    _, _, depth_p, seg_p = render_point_observation(objs)
    both = np.isfinite(depth_r) & np.isfinite(depth_p)
    assert both.mean() > 0.03
    # same camera convention: depths agree to splat noise
    d = np.abs(depth_r[both] - depth_p[both])
    assert np.median(d) < 0.04, np.median(d)


def test_occlusion():
    # a large box in front of a sphere: sphere must lose the z-test
    objs = [
        make_primitive("wall", "box", [0.02, 0.8, 0.8],
                       pose_at([0.45, 0.0, 0.3]), compute_grasp=False),
        make_primitive("ball", "sphere", [0.1],
                       pose_at([0.8, 0.0, 0.3]), compute_grasp=False),
    ]
    rgb, depth, seg = render_rgb(objs)
    # camera sits at +x looking back: wall (object 0) should dominate
    n_wall = (seg == 0).sum()
    n_ball = (seg == 1).sum()
    assert n_wall > 0
    assert n_ball < n_wall * 0.2, (n_wall, n_ball)


def test_textured_mesh_samples_texture():
    """A textured wall (left half red, right half blue in UV space) must
    render both colors on the correct sides, modulated by shading only."""
    wall = make_primitive("wall", "box", [0.02, 0.6, 0.6],
                          pose_at([0.6, 0.0, 0.3]), compute_grasp=False)
    # replace the proxy with an explicit two-triangle quad facing the
    # camera (+x normal), spanning y/z
    v = np.array([
        [0.0, -0.3, -0.3], [0.0, 0.3, -0.3],
        [0.0, 0.3, 0.3], [0.0, -0.3, 0.3]])
    f = np.array([[0, 1, 2], [0, 2, 3]])
    uv = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    wall.mesh = (v, f)
    wall.mesh_uv = uv[f]  # per-corner [F, 3, 2]
    tex = np.zeros((8, 8, 3))
    tex[:, :4] = [1.0, 0.0, 0.0]   # u < 0.5 -> red
    tex[:, 4:] = [0.0, 0.0, 1.0]   # u >= 0.5 -> blue
    wall.texture = tex
    rgb, depth, seg = render_rgb([wall])
    hit = seg == 0
    assert hit.sum() > 200
    px = rgb[hit].astype(float)
    reds = px[:, 0] > px[:, 2] * 2 + 10
    blues = px[:, 2] > px[:, 0] * 2 + 10
    assert reds.sum() > 50 and blues.sum() > 50
    # red and blue regions are horizontally separated
    cols = np.nonzero(hit)[1]
    assert abs(np.median(cols[reds[: len(cols)]]) -
               np.median(cols[blues[: len(cols)]])) > 5


def test_load_obj_uv_roundtrip(tmp_path):
    from omg_planner_tpu.io.meshsdf import load_obj
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n")
    v, f, fuv = load_obj(str(p), with_uv=True)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert fuv.shape == (2, 3, 2)
    np.testing.assert_allclose(fuv[0], [[0, 0], [1, 0], [1, 1]])
    # files without vt still load, uv None
    p2 = tmp_path / "plain.obj"
    p2.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    v2, f2, fuv2 = load_obj(str(p2), with_uv=True)
    assert fuv2 is None and f2.shape == (1, 3)
    v3, f3 = load_obj(str(p2))
    assert f3.shape == (1, 3)
