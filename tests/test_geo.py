"""Geo kernels: tiles, hilbert, S2, hex cells, WKB, STRtree, PIP."""

import numpy as np
import pytest

from gdal_ray.geo import hexcell, hilbert, pip, s2, webmercator as wm, wkb as W


def test_tile_math_known_values():
    # lon=0,lat=0 at z=1 -> tile (1,0)? (0,0) is the NW corner; (1,1) quadrant SE
    tx, ty = wm.lonlat_to_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (tx[0], ty[0]) == (1, 1)
    tx, ty = wm.lonlat_to_tile(np.array([-180.0, 179.999]), np.array([85.0, -85.0]), 2)
    assert tx.tolist() == [0, 3] and ty.tolist() == [0, 3]
    # round trip through bounds
    lo, la_min, hi, la_max = wm.tile_bounds(2, 1, 2)
    assert lo == 0.0 and hi == 90.0 and la_max > 60 and la_min == 0.0


def test_tile_parent_consistency():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-84, 84, 500)
    x9, y9 = wm.lonlat_to_tile(lon, lat, 9)
    x8, y8 = wm.lonlat_to_tile(lon, lat, 8)
    px, py = wm.parent_tile(x9, y9)
    assert (px == x8).all() and (py == y8).all()


def test_hilbert_locality_and_bijection():
    order = 4
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert.hilbert_d(xs.ravel(), ys.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))  # bijective
    # consecutive codes are adjacent cells (hilbert property)
    inv = np.empty(n * n, dtype=np.int64)
    inv[d] = np.arange(n * n)
    px, py = xs.ravel()[inv], ys.ravel()[inv]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()


def test_s2_structure():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89, 89, 2000)
    leaf = s2.lonlat_to_cell(lon, lat, 30)
    assert (leaf & np.uint64(1)).all()  # leaf ids end in 1
    assert (s2.cell_level(leaf) == 30).all()
    l16 = s2.lonlat_to_cell(lon, lat, 16)
    assert (s2.cell_level(l16) == 16).all()
    # parent of leaf at 16 == direct level-16 cell
    assert (s2.parent(leaf, 16) == l16).all()
    # face bits match longitude/zones: points near lon 0 lat 0 are on face 0
    f = (s2.lonlat_to_cell(np.array([0.0]), np.array([0.0]), 30) >> np.uint64(61))
    assert f[0] == 0
    f = (s2.lonlat_to_cell(np.array([90.0]), np.array([0.0]), 30) >> np.uint64(61))
    assert f[0] == 1
    f = (s2.lonlat_to_cell(np.array([0.0]), np.array([89.9]), 30) >> np.uint64(61))
    assert f[0] == 2


def test_s2_locality():
    # nearby points share coarse ancestors
    base = s2.lonlat_to_cell(np.array([10.0]), np.array([45.0]), 10)
    near = s2.lonlat_to_cell(np.array([10.0001]), np.array([45.0001]), 10)
    assert base[0] == near[0]


def test_hexcell_hierarchy():
    rng = np.random.RandomState(11)
    lon = rng.uniform(-170, 170, 3000)
    lat = rng.uniform(-80, 80, 3000)
    c9 = hexcell.lonlat_to_cell(lon, lat, 9)
    c5 = hexcell.lonlat_to_cell(lon, lat, 5)
    assert (hexcell.cell_res(c9) == 9).all()
    # determinism
    assert (hexcell.lonlat_to_cell(lon, lat, 9) == c9).all()
    # nearest-center property: reconstructed center within circumradius
    cx, cy = hexcell.cell_center(c9)
    R9 = hexcell._GRIDS[9][0]
    assert np.hypot(cx - lon, cy - lat).max() <= R9 * 1.0000001
    # aperture-7 coset property: parent center within one unit child step
    p8 = hexcell.cell_to_parent(c9, 8)
    pcx, pcy = hexcell.cell_center(p8)
    assert np.hypot(pcx - cx, pcy - cy).max() <= np.sqrt(3.0) * R9 * 1.0000001
    # truncated ancestor agrees with the directly computed coarse cell for
    # the vast majority of points (boundary strips excepted — same caveat
    # as H3's geoToH3 vs h3ToParent)
    agree = (hexcell.cell_to_parent(c9, 5) == c5).mean()
    assert agree > 0.9
    # same fine cell => same ancestors (definitional, exercised end-to-end)
    cdup = hexcell.lonlat_to_cell(lon[:1].repeat(5) + 1e-9, lat[:1].repeat(5), 9)
    assert len(set(hexcell.cell_to_parent(cdup, 3).tolist())) == 1


def test_wkb_point_roundtrip():
    lon = np.array([1.5, -77.25, 179.0])
    lat = np.array([-3.25, 40.0, -89.5])
    bufs = W.encode_points(lon, lat)
    lo, la = W.decode_points(bufs)
    assert np.array_equal(lo, lon) and np.array_equal(la, lat)
    kind, pts = W.parse_wkb(bufs[1])
    assert kind == "point" and pts[0][0] == -77.25


def test_wkt_roundtrip():
    cases = [
        "POLYGON ((1 2,1 3,3 3,3 2,1 2))",
        "LINESTRING (0 0,1 1)",
        "POINT (0.5 0.5)",
        "MULTIPOINT ((0.5 0.5))",
        "MULTIPOLYGON (((0 0,0 1,1 1,0 0)),((5 5,5 6,6 6,5 5)))",
        "POLYGON ((0 0,0 10,10 10,10 0,0 0),(4 4,4 6,6 6,6 4,4 4))",
    ]
    for wkt in cases:
        g = W.wkt_to_geom(wkt)
        g2 = W.parse_wkb(W.geom_to_wkb(g))
        assert W.geom_to_wkt(g2) == W.geom_to_wkt(g)


def test_strtree_matches_bruteforce():
    rng = np.random.RandomState(5)
    boxes = np.zeros((300, 4))
    boxes[:, 0] = rng.uniform(0, 90, 300)
    boxes[:, 1] = rng.uniform(0, 90, 300)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(0.5, 8, 300)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(0.5, 8, 300)
    tree = pip.STRtree(boxes)
    px = rng.uniform(-5, 100, 500)
    py = rng.uniform(-5, 100, 500)
    qi, bi = tree.query_points(px, py)
    got = set(zip(qi.tolist(), bi.tolist()))
    exp = set()
    for q in range(500):
        inside = (
            (px[q] >= boxes[:, 0]) & (px[q] <= boxes[:, 2])
            & (py[q] >= boxes[:, 1]) & (py[q] <= boxes[:, 3])
        )
        for b in np.nonzero(inside)[0]:
            exp.add((q, int(b)))
    assert got == exp


def test_pip_with_holes():
    donut = W.wkt_to_geom("POLYGON ((0 0,0 10,10 10,10 0,0 0),(4 4,4 6,6 6,6 4,4 4))")
    px = np.array([5.0, 2.0, 11.0, 4.5])
    py = np.array([5.0, 2.0, 5.0, 4.5])
    inside = pip.point_in_polygon(px, py, donut[1])
    assert inside.tolist() == [False, True, False, False]


def test_polygonset_locate():
    polys = [
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((0 0,0 10,10 10,10 0,0 0))")),
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((5 5,5 15,15 15,15 5,5 5))")),
    ]
    ps = pip.PolygonSet(polys)
    qi, bi = ps.locate(np.array([1.0, 7.0, 12.0, 20.0]), np.array([1.0, 7.0, 12.0, 20.0]))
    pairs = sorted(zip(qi.tolist(), bi.tolist()))
    assert pairs == [(0, 0), (1, 0), (1, 1), (2, 1)]


def test_s2_cell_to_lonlat_roundtrip():
    rng = np.random.RandomState(9)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    leaf = s2.lonlat_to_cell(lon, lat, 30)
    lo, la = s2.cell_to_lonlat(leaf)
    # leaf cells are ~ centimeter scale: centers within ~1e-5 degrees
    assert np.abs(lo - lon).max() < 1e-5
    assert np.abs(la - lat).max() < 1e-5
    # coarser cells decode to a point still inside the cell
    c10 = s2.lonlat_to_cell(lon, lat, 10)
    lo10, la10 = s2.cell_to_lonlat(c10)
    back = s2.lonlat_to_cell(lo10, la10, 10)
    assert (back == c10).all()


def test_hexcell_children_neighbors():
    lon = np.array([12.3, -77.1, 139.9])
    lat = np.array([45.6, 38.2, -35.0])
    c5 = hexcell.lonlat_to_cell(lon, lat, 5)
    kids = hexcell.cell_children(c5)
    assert kids.shape == (3, 7)
    # every child's parent (by truncation) is the original cell
    for col in range(7):
        assert (hexcell.cell_to_parent(kids[:, col], 5) == c5).all()
    # the center child (digit 0) shares the parent's center
    px, py = hexcell.cell_center(c5)
    kx, ky = hexcell.cell_center(kids[:, 0])
    assert np.allclose(px, kx) and np.allclose(py, ky)
    nbrs = hexcell.cell_neighbors(c5)
    assert nbrs.shape == (3, 6)
    # neighbors are distinct, at the same res, one grid-step away
    R5 = hexcell._GRIDS[5][0]
    for col in range(6):
        assert (hexcell.cell_res(nbrs[:, col]) == 5).all()
        nx, ny = hexcell.cell_center(nbrs[:, col])
        d = np.hypot(nx - px, ny - py)
        assert np.allclose(d, np.sqrt(3.0) * R5, rtol=1e-9)
