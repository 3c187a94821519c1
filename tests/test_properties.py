"""Property-based tests (hypothesis) for the deterministic kernels —
SURVEY §7.2.2's 'property-tested for determinism and consistency' mandate."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_ray.geo import hexcell, hilbert, s2, webmercator as wm, wkb as W
from gdal_ray.vector import algebra as ALG

finite_lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
finite_lat = st.floats(min_value=-83.9, max_value=83.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(finite_lon, finite_lat)
def test_hexcell_determinism_and_hierarchy(lon, lat):
    a = np.array([lon])
    b = np.array([lat])
    c9 = hexcell.lonlat_to_cell(a, b, 9)
    assert hexcell.lonlat_to_cell(a, b, 9)[0] == c9[0]
    # every truncation level yields a valid cell with the right res field
    for r in (7, 5, 3, 0):
        p = hexcell.cell_to_parent(c9, r)
        assert hexcell.cell_res(p)[0] == r
    # nearest-center property
    cx, cy = hexcell.cell_center(c9)
    assert np.hypot(cx[0] - lon, cy[0] - lat) <= hexcell._GRIDS[9][0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(finite_lon, finite_lat, st.integers(min_value=1, max_value=29))
def test_s2_parent_chain(lon, lat, level):
    a, b = np.array([lon]), np.array([lat])
    leaf = s2.lonlat_to_cell(a, b, 30)
    direct = s2.lonlat_to_cell(a, b, level)
    assert s2.parent(leaf, level)[0] == direct[0]
    assert s2.cell_level(direct)[0] == level


@settings(max_examples=200, deadline=None)
@given(finite_lon, finite_lat, st.integers(min_value=1, max_value=12))
def test_tile_parent_chain(lon, lat, zoom):
    a, b = np.array([lon]), np.array([lat])
    x, y = wm.lonlat_to_tile(a, b, zoom)
    x1, y1 = wm.lonlat_to_tile(a, b, zoom - 1)
    px, py = wm.parent_tile(x, y)
    assert px[0] == x1[0] and py[0] == y1[0]
    # tile bounds contain the point
    lo, la0, hi, la1 = wm.tile_bounds(int(x[0]), int(y[0]), zoom)
    assert lo - 1e-9 <= lon <= hi + 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(
    st.floats(-1e5, 1e5, allow_nan=False), st.floats(-1e5, 1e5, allow_nan=False)
), min_size=1, max_size=20))
def test_wkb_roundtrip_points_lines(pts):
    arr = np.array(pts, dtype=np.float64)
    lon, lat = arr[:, 0].copy(), arr[:, 1].copy()
    lo, la = W.decode_points(W.encode_points(lon, lat))
    assert np.array_equal(lo, lon) and np.array_equal(la, lat)
    if len(pts) >= 2:
        g = ("linestring", arr)
        g2 = W.parse_wkb(W.geom_to_wkb(g))
        assert g2[0] == "linestring" and np.array_equal(g2[1], arr)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**20 - 1),
       st.integers(min_value=0, max_value=2**20 - 1))
def test_hilbert_injective_neighbors(x, y):
    order = 20
    xs = np.array([x, x], dtype=np.uint64)
    ys = np.array([y, y], dtype=np.uint64)
    d = hilbert.hilbert_d(xs, ys, order)
    assert d[0] == d[1]  # deterministic
    if x + 1 < 2**20:
        d2 = hilbert.hilbert_d(np.array([x + 1], dtype=np.uint64),
                               np.array([y], dtype=np.uint64), order)
        assert d2[0] != d[0]  # injective on neighbors


_grid8 = st.integers(min_value=0, max_value=64).map(lambda i: i / 8.0)
_grid8pos = st.integers(min_value=8, max_value=48).map(lambda i: i / 8.0)


@settings(max_examples=60, deadline=None)
@given(_grid8, _grid8, _grid8pos, _grid8pos)
def test_algebra_area_conservation(ox, oy, w, h):
    """area(A) == area(A∩B) + area(A−B) for overlapping rectangles,
    including exact shared-edge/corner degeneracies. Offsets are grid-
    aligned: the float clipper's on-boundary tolerance (1e-7) makes
    offsets AT tolerance scale ill-conditioned by design (exact predicates
    are documented out of scope, vector/algebra.py docstring)."""
    A = ("polygon", [np.array([(0, 0), (5, 0), (5, 5), (0, 5), (0, 0)], float)])
    B = ("polygon", [np.array(
        [(ox, oy), (ox + w, oy), (ox + w, oy + h), (ox, oy + h), (ox, oy)], float)])

    def area(g):
        if g is None:
            return 0.0
        from gdal_ray.vector.geomfuncs import area as garea

        return garea(g)

    inter = ALG.intersection_geom(A, B, keep_lower_dim=False)
    diff = ALG.difference_geom(A, B)
    total = area(inter) + area(diff)
    assert abs(total - 25.0) < 1e-6


def test_wkb_rejects_zm_and_ewkb_flags():
    import struct

    import pytest as _pytest

    # EWKB Z point (0x80000000 flag) and ISO 1001 — both must raise, not
    # silently misparse Z doubles as coordinates
    ewkb_z = struct.pack("<BIddd", 1, 0x80000001, 1.0, 2.0, 3.0)
    iso_z = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 3.0)
    with _pytest.raises(ValueError, match="EWKB"):
        W.parse_wkb(ewkb_z)
    with _pytest.raises(ValueError, match="ISO"):
        W.parse_wkb(iso_z)
