"""ST_* geometry function catalogue for the SQL compiler — the engine's
analog of the reference's SQLite-dialect spatial functions
(doc/source/user/sql_sqlite_dialect.rst:214-249): geometry kernels that
already exist as pipeline steps (vector/geomfuncs, vector/algebra,
geo/pip) become callable inside SELECT/WHERE expressions.

Registered on import by ops.sql. All functions take/return WKB binary
columns (the repo's geometry encoding); ST_GEOMFROMTEXT lifts WKT
literals, so predicates like

    SELECT fid FROM t WHERE ST_INTERSECTS(geometry,
        ST_GEOMFROMTEXT('POLYGON((0 0,10 0,10 10,0 10,0 0))'))

work with no special-casing in the compiler. Evaluation is per-row Python
over the batch (geometry kernels are per-feature, same as the reference's
per-feature OGR calls); everything around them stays Arrow.

Semantics notes (documented approximations):
- ST_INTERSECTS: exact bbox prefilter + pairwise intersection_geom
  (boundary touches count, like the reference).
- ST_CONTAINS/ST_WITHIN: exact for point operands (ray-cast PIP,
  boundary inclusive); for area operands uses the covers-style area test
  area(a n b) == area(b) — boundary contact is allowed, i.e. closer to
  ST_Covers for degenerate boundary-only cases.
- ST_DISTANCE: exact min over segment/vertex pairs; 0 when intersecting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.geo import wkb as W
from gdal_ray.vector import geomfuncs as GF


def _as_pylist(v, n_hint=None):
    """Evaluated SQL argument -> (python list, length, was_scalar)."""
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if isinstance(v, pa.Array):
        return v.to_pylist(), len(v), False
    if isinstance(v, pa.Scalar):
        v = v.as_py()
    return [v], 1, True


def _pairwise(fn, a, b, out_type):
    """Broadcast a per-pair python fn over two evaluated args."""
    la, na, sa = _as_pylist(a)
    lb, nb, sb = _as_pylist(b)
    n = max(na, nb)
    out = []
    for i in range(n):
        x = la[0] if sa else la[i]
        y = lb[0] if sb else lb[i]
        out.append(None if x is None or y is None else fn(x, y))
    if sa and sb:
        return pa.scalar(out[0], out_type)
    return pa.array(out, out_type)


def _unary(fn, a, out_type):
    la, na, sa = _as_pylist(a)
    out = [None if x is None else fn(x) for x in la]
    if sa:
        return pa.scalar(out[0], out_type)
    return pa.array(out, out_type)


def _geom(b):
    return W.parse_wkb(b)


# ---- constructors / accessors ---------------------------------------------


def st_geomfromtext(wkt):
    return _unary(lambda s: W.geom_to_wkb(W.wkt_to_geom(s)), wkt, pa.binary())


def st_astext(g):
    return _unary(lambda b: W.geom_to_wkt(_geom(b)), g, pa.string())


def st_area(g):
    return _unary(lambda b: GF.area(_geom(b)), g, pa.float64())


def st_length(g):
    return _unary(lambda b: GF.length(_geom(b)), g, pa.float64())


def st_x(g):
    def f(b):
        kind, data = _geom(b)
        return float(data[0][0]) if kind == "point" else None

    return _unary(f, g, pa.float64())


def st_y(g):
    def f(b):
        kind, data = _geom(b)
        return float(data[0][1]) if kind == "point" else None

    return _unary(f, g, pa.float64())


def st_npoints(g):
    return _unary(lambda b: int(len(GF._geom_points(_geom(b)))), g, pa.int64())


def st_centroid(g):
    def f(b):
        cx, cy = GF.centroid(_geom(b))
        return W.encode_point(cx, cy)

    return _unary(f, g, pa.binary())


def st_envelope(g):
    def f(b):
        pts = GF._geom_points(_geom(b))
        x0, y0 = pts[:, 0].min(), pts[:, 1].min()
        x1, y1 = pts[:, 0].max(), pts[:, 1].max()
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return W.geom_to_wkb(("polygon", [ring]))

    return _unary(f, g, pa.binary())


# ---- transforms ------------------------------------------------------------


def st_buffer(g, dist):
    def f(b, d):
        return W.geom_to_wkb(GF.buffer(_geom(b), float(d)))

    return _pairwise(f, g, dist, pa.binary())


def st_convexhull(g):
    return _unary(lambda b: W.geom_to_wkb(GF.convex_hull(_geom(b))), g, pa.binary())


def st_simplify(g, tol):
    def f(b, d):
        return W.geom_to_wkb(GF.simplify(_geom(b), float(d)))

    return _pairwise(f, g, tol, pa.binary())


# ---- predicates / measures -------------------------------------------------


def _rings_of(geom):
    kind, data = geom
    if kind == "polygon":
        return [data]
    if kind == "multipolygon":
        return [p[1] for p in data]
    return []


def _pt_in_area(px, py, geom) -> bool:
    from gdal_ray.geo.pip import point_in_polygon

    for rings in _rings_of(geom):
        if bool(point_in_polygon(np.array([px]), np.array([py]), rings)[0]):
            return True
    return False


def _intersects(ga, gb) -> bool:
    from gdal_ray.vector.algebra import _bbox, _bbox_overlap, intersection_geom

    if not _bbox_overlap(_bbox(ga), _bbox(gb)):
        return False
    if ga[0] == "point":
        return _pt_on_geom(ga, gb)
    if gb[0] == "point":
        return _pt_on_geom(gb, ga)
    inter = intersection_geom(ga, gb, keep_lower_dim=True)
    return inter is not None and not (
        inter[0] == "geometrycollection" and not inter[1])


def _pt_on_geom(pt, g) -> bool:
    px, py = float(pt[1][0][0]), float(pt[1][0][1])
    kind = g[0]
    if kind in ("polygon", "multipolygon"):
        return _pt_in_area(px, py, g)
    if kind == "point":
        return px == float(g[1][0][0]) and py == float(g[1][0][1])
    if kind in ("multipoint", "multilinestring", "geometrycollection"):
        return any(_pt_on_geom(pt, p) for p in g[1])
    if kind == "linestring":
        d = _pt_segs_dist(px, py, g[1])
        return d < 1e-9
    return False


def _pt_segs_dist(px, py, pts: np.ndarray) -> float:
    a = pts[:-1]
    b = pts[1:]
    if len(pts) == 1:
        return float(np.hypot(px - pts[0, 0], py - pts[0, 1]))
    ab = b - a
    ap = np.column_stack([px - a[:, 0], py - a[:, 1]])
    denom = (ab * ab).sum(axis=1)
    t = np.clip(np.divide((ap * ab).sum(axis=1), denom,
                          out=np.zeros_like(denom), where=denom > 0), 0, 1)
    proj = a + t[:, None] * ab
    return float(np.hypot(px - proj[:, 0], py - proj[:, 1]).min())


def st_intersects(a, b):
    return _pairwise(lambda x, y: _intersects(_geom(x), _geom(y)), a, b, pa.bool_())


def _contains(ga, gb) -> bool:
    from gdal_ray.vector.algebra import intersection_geom

    if gb[0] == "point":
        return _pt_on_geom(gb, ga)
    if gb[0] == "multipoint":
        return all(_pt_on_geom(p, ga) for p in gb[1])
    if ga[0] not in ("polygon", "multipolygon"):
        return False
    if gb[0] in ("polygon", "multipolygon"):
        inter = intersection_geom(ga, gb, keep_lower_dim=False)
        if inter is None:
            return False
        return abs(GF.area(inter) - GF.area(gb)) <= 1e-9 * max(GF.area(gb), 1.0)
    # line operand: every vertex inside + midpoints inside (approximation)
    pts = GF._geom_points(gb)
    mids = (pts[:-1] + pts[1:]) / 2.0 if len(pts) > 1 else pts
    chk = np.vstack([pts, mids])
    return all(_pt_in_area(float(x), float(y), ga) for x, y in chk)


def st_contains(a, b):
    return _pairwise(lambda x, y: _contains(_geom(x), _geom(y)), a, b, pa.bool_())


def st_within(a, b):
    return _pairwise(lambda x, y: _contains(_geom(y), _geom(x)), a, b, pa.bool_())


def _segments(geom):
    kind, data = geom
    if kind == "linestring":
        return [data]
    if kind == "polygon":
        return list(data)
    if kind in ("multilinestring", "multipolygon", "multipoint", "geometrycollection"):
        out = []
        for p in data:
            out.extend(_segments(p))
        return out
    return []


def _distance(ga, gb) -> float:
    if _intersects(ga, gb):
        return 0.0
    a_pts = GF._geom_points(ga)
    b_pts = GF._geom_points(gb)
    best = np.inf
    segs_a = _segments(ga)
    segs_b = _segments(gb)
    # min distance between non-intersecting geometries is attained at a
    # vertex of one against a segment (or vertex) of the other
    for x, y in a_pts:
        for s in segs_b:
            best = min(best, _pt_segs_dist(float(x), float(y), s))
    for x, y in b_pts:
        for s in segs_a:
            best = min(best, _pt_segs_dist(float(x), float(y), s))
    if not segs_a and not segs_b:
        d = np.hypot(a_pts[:, None, 0] - b_pts[None, :, 0],
                     a_pts[:, None, 1] - b_pts[None, :, 1])
        best = min(best, float(d.min()))
    return float(best)


def st_distance(a, b):
    return _pairwise(lambda x, y: _distance(_geom(x), _geom(y)), a, b, pa.float64())


CATALOGUE = {
    "st_geomfromtext": st_geomfromtext,
    "st_astext": st_astext,
    "st_area": st_area,
    "st_length": st_length,
    "st_x": st_x,
    "st_y": st_y,
    "st_npoints": st_npoints,
    "st_centroid": st_centroid,
    "st_envelope": st_envelope,
    "st_buffer": st_buffer,
    "st_convexhull": st_convexhull,
    "st_simplify": st_simplify,
    "st_intersects": st_intersects,
    "st_contains": st_contains,
    "st_within": st_within,
    "st_distance": st_distance,
}


def register_all(register):
    for name, fn in CATALOGUE.items():
        register(name, fn)
