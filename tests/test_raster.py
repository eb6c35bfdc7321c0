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
