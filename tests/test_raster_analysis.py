"""Contour / sieve / proximity kernels."""

import numpy as np

from gdal_ray.raster.analysis import contour, contour_segments, proximity, sieve


def test_contour_circle():
    # radial field: the level-5 contour of distance-from-center is a circle
    h = w = 21
    y, x = np.mgrid[0:h, 0:w]
    field = np.hypot(x - 10, y - 10)
    lines = contour(field, [5.0])
    assert lines
    pts = np.vstack([ln for _, ln in lines])
    # all contour points are ~5 pixels from the center (+0.5 sample offset)
    d = np.hypot(pts[:, 0] - 10.5, pts[:, 1] - 10.5)
    assert abs(d.mean() - 5.0) < 0.15 and d.std() < 0.1


def test_contour_conservation():
    rng = np.random.RandomState(5)
    a = rng.uniform(0, 10, (12, 12))
    segs = contour_segments(a, 5.0)
    # segment crossing count parity: every 2x2 cell contributes 0 or 2
    # boundary crossings -> every segment endpoint lies on a cell edge with
    # value straddling the level
    for (x1, y1), (x2, y2) in segs:
        assert 0 <= x1 <= 12 and 0 <= y1 <= 12


def test_sieve():
    a = np.zeros((10, 10), np.uint8)
    a[2:8, 2:8] = 5
    a[4, 4] = 9          # 1-px speck inside the 5-region
    a[0, 0] = 7          # 1-px speck in the 0 background
    out = sieve(a, threshold=3)
    assert out[4, 4] == 5
    assert out[0, 0] == 0
    # the big regions survive untouched
    assert (out[2:8, 2:8] == 5).all()
    assert out.sum() == 5 * 36


def test_proximity_exact():
    rng = np.random.RandomState(3)
    mask = np.zeros((24, 24), bool)
    ys, xs = rng.randint(0, 24, 5), rng.randint(0, 24, 5)
    mask[ys, xs] = True
    d = proximity(mask)
    # brute force
    yy, xx = np.mgrid[0:24, 0:24]
    brute = np.min(
        [np.hypot(yy - y0, xx - x0) for y0, x0 in zip(ys, xs)], axis=0
    )
    assert np.allclose(d, brute)
    assert (d[mask] == 0).all()


def test_clean_collar():
    from gdal_ray.raster.analysis import clean_collar

    arr = np.full((20, 20), 50, dtype=np.int64)
    arr[:3, :] = 1          # top collar
    arr[:, :2] = 1          # left collar (connected)
    arr[10:12, 10:12] = 1   # interior dark patch — must SURVIVE
    out = clean_collar(arr, threshold=1, nodata=0)
    assert (out[:3, :] == 0).all() and (out[:, :2] == 0).all()
    assert (out[10:12, 10:12] == 1).all()
    assert (out[5:9, 5:9] == 50).all()


def test_viewshed_wall_shadow():
    from gdal_ray.raster.analysis import viewshed

    dem = np.zeros((60, 60), np.float64)
    dem[:, 30] = 50.0  # a tall north-south wall at x=30
    vis = viewshed(dem, ox=10, oy=30, obs_height=2.0)
    assert vis[30, 10]            # observer
    assert vis[30, 20]            # open ground before the wall
    assert vis[30, 30]            # the wall face itself is visible
    assert not vis[30, 45]        # shadowed behind the wall
    assert not vis[30, 55]
    # flat plane with no wall: everything visible
    flat = np.zeros((40, 40), np.float64)
    v2 = viewshed(flat, 20, 20)
    assert v2.mean() > 0.98
