"""Delaunay / TIN linear interpolation / concave hull."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo.delaunay import concave_hull, delaunay, interpolate_linear
from gdal_ray.stages.grid import grid_points
from gdal_ray.util import to_arrow


def test_delaunay_properties():
    rng = np.random.RandomState(11)
    pts = rng.uniform(0, 10, (120, 2))
    tris = delaunay(pts)
    # Euler: for a triangulation of the convex hull, T = 2n - 2 - h
    from gdal_ray.vector.geomfuncs import convex_hull_points

    hull = convex_hull_points(pts)
    h = len(hull) - 1  # closed ring
    # the internal robustness jitter can move a near-collinear hull vertex
    # on/off the hull: allow +-2 around the Euler count
    assert abs(len(tris) - (2 * len(pts) - 2 - h)) <= 2
    # empty-circumcircle property on a sample of triangles
    for t in tris[:: max(1, len(tris) // 25)]:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        a2, b2, c2 = (a * a).sum(), (b * b).sum(), (c * c).sum()
        ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
        uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        inside = d2 < r2 * (1 - 1e-6)
        inside[list(t)] = False
        assert not inside.any()


def test_linear_interpolation_exact_on_plane():
    # TIN interpolation reproduces ANY affine field exactly (triangles are
    # planes), regardless of the triangulation
    rng = np.random.RandomState(4)
    pts = rng.uniform(0, 10, (200, 2))
    vals = 3.0 * pts[:, 0] - 2.0 * pts[:, 1] + 7.0
    qx = rng.uniform(1, 9, 500)
    qy = rng.uniform(1, 9, 500)
    got = interpolate_linear(pts, vals, qx, qy)
    assert np.isnan(got).sum() == 0
    assert np.abs(got - (3.0 * qx - 2.0 * qy + 7.0)).max() < 1e-9
    # outside the hull -> nodata
    out = interpolate_linear(pts, vals, np.array([50.0]), np.array([50.0]))
    assert np.isnan(out).all()


def test_grid_linear_ray_stage():
    rng = np.random.RandomState(9)
    n = 300
    t = pa.table({
        "x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n),
        "value": np.zeros(n),
    })
    vals = 2.0 * t["x"].to_numpy() + t["y"].to_numpy()
    t = t.set_column(2, "value", pa.array(vals))
    out = to_arrow(grid_points(
        rd.from_arrow(t), extent=(0, 0, 10, 10), cell=0.5, radius=1.0,
        method="linear", value_col="value",
    )).to_pandas()
    assert len(out) > 300  # most of the 20x20 grid is inside the hull
    cx = (out["gx"].to_numpy() + 0.5) * 0.5
    cy = (out["gy"].to_numpy() + 0.5) * 0.5
    assert np.abs(out["value"].to_numpy() - (2.0 * cx + cy)).max() < 1e-9


def test_concave_hull():
    # a C-shape: concave hull must exclude the notch the convex hull spans
    rng = np.random.RandomState(2)
    theta = rng.uniform(0.25 * np.pi, 1.75 * np.pi, 400)
    r = rng.uniform(4, 5, 400)
    pts = np.column_stack([r * np.cos(theta), r * np.sin(theta)])
    rings = concave_hull(pts, ratio=0.1)
    assert rings, "no hull ring"
    ring = max(rings, key=len)

    def area(rr):
        x, y = rr[:, 0], rr[:, 1]
        return abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])) / 2.0

    from gdal_ray.vector.geomfuncs import convex_hull_points

    convex = convex_hull_points(pts)
    assert area(ring) < 0.75 * area(convex)  # the notch is carved out
    # ratio=1 falls back to (approximately) the convex hull
    rings_cvx = concave_hull(pts, ratio=1.0)
    assert abs(area(max(rings_cvx, key=len)) - area(convex)) / area(convex) < 0.05
