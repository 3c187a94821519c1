"""Per-geometry functions — the `gdal vector <step>` / OGRGeometry method
surface (SURVEY.md §2.2), from scratch in numpy.

Mappings (cites into /root/reference):
  convex_hull     apps/gdalalg_vector_convex_hull.cpp; ogrgeometry.cpp:4449
  simplify        apps/gdalalg_vector_simplify.cpp; ogrgeometry.cpp:6778
  segmentize      apps/gdalalg_vector_segmentize.h:29
  buffer          apps/gdalalg_vector_buffer.h:29 (GEOS-style round buffer,
                  approximated with N-gon arcs; N=8 quadrant segments like
                  GEOS' default quadrantSegments)
  swap_xy         apps/gdalalg_vector_swap_xy.h:29-30
  make_point      apps/gdalalg_vector_make_point.cpp
  reproject       apps/gdalalg_vector_reproject.cpp (EPSG:4326 <->
                  WebMercator implemented directly; the general PROJ engine
                  is out of sandbox scope)
  explode_collections  apps/gdalalg_vector_explode_collections.cpp
  collect/combine apps/gdalalg_vector_combine.h:32
  area/length/centroid  OGR_GEOM_AREA etc. (ogr/ogrfeaturequery.cpp:37)
"""

from __future__ import annotations

import numpy as np

R_EARTH = 6378137.0  # WebMercator sphere radius


# ---- coordinate transforms (vectorized) -----------------------------------


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray):
    x = np.radians(lon) * R_EARTH
    y = np.log(np.tan(np.pi / 4.0 + np.radians(np.clip(lat, -85.051128779806, 85.051128779806)) / 2.0)) * R_EARTH
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / R_EARTH)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_EARTH)) - np.pi / 2.0)
    return lon, lat


def transform_geom(geom, fwd):
    """Apply a vectorized (x[], y[]) -> (x'[], y'[]) transform to a geom."""
    kind, data = geom
    if kind in ("point", "linestring"):
        x, y = fwd(data[:, 0], data[:, 1])
        return (kind, np.column_stack([x, y]))
    if kind == "polygon":
        return (kind, [np.column_stack(fwd(r[:, 0], r[:, 1])) for r in data])
    return (kind, [transform_geom(p, fwd) for p in data])


def swap_xy(geom):
    return transform_geom(geom, lambda x, y: (y, x))


# ---- hulls / simplify / segmentize ----------------------------------------


def convex_hull_points(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed CCW ring."""
    p = np.unique(pts, axis=0)
    if len(p) <= 2:
        return p
    order = np.lexsort((p[:, 1], p[:, 0]))
    p = p[order]

    def half(points):
        out = []
        for pt in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], pt - out[-2]) <= 0:
                out.pop()
            out.append(pt)
        return out

    lower = half(p)
    upper = half(p[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])


def _geom_points(geom) -> np.ndarray:
    kind, data = geom
    if kind in ("point", "linestring"):
        return data
    if kind == "polygon":
        return np.vstack(data)
    return np.vstack([_geom_points(p) for p in data])


def convex_hull(geom):
    ring = convex_hull_points(_geom_points(geom))
    if len(ring) == 1:
        return ("point", ring)
    if len(ring) == 2:
        return ("linestring", ring)
    return ("polygon", [ring])


def simplify_dp(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker (the reference's default Simplify is GEOS DP)."""
    if len(pts) <= 2:
        return pts
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a, b = pts[i], pts[j]
        d = b - a
        L2 = d @ d
        seg = pts[i + 1 : j]
        if L2 == 0:
            dist = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            t = np.clip(((seg - a) @ d) / L2, 0, 1)
            proj = a + t[:, None] * d
            dist = np.hypot(seg[:, 0] - proj[:, 0], seg[:, 1] - proj[:, 1])
        k = int(np.argmax(dist))
        if dist[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return pts[keep]


def simplify(geom, tol: float):
    kind, data = geom
    if kind == "linestring":
        return (kind, simplify_dp(data, tol))
    if kind == "polygon":
        return (kind, [simplify_dp(r, tol) for r in data])
    if kind == "point":
        return geom
    return (kind, [simplify(p, tol) for p in data])


def segmentize_pts(pts: np.ndarray, max_len: float) -> np.ndarray:
    """Densify so no segment exceeds max_len (OGRGeometry::segmentize)."""
    out = [pts[:1]]
    for i in range(len(pts) - 1):
        a, b = pts[i], pts[i + 1]
        L = float(np.hypot(*(b - a)))
        n = max(1, int(np.ceil(L / max_len)))
        ts = np.linspace(0, 1, n + 1)[1:]
        out.append(a + ts[:, None] * (b - a))
    return np.vstack(out)


def segmentize(geom, max_len: float):
    kind, data = geom
    if kind == "linestring":
        return (kind, segmentize_pts(data, max_len))
    if kind == "polygon":
        return (kind, [segmentize_pts(r, max_len) for r in data])
    if kind == "point":
        return geom
    return (kind, [segmentize(p, max_len) for p in data])


# ---- buffer (approximate round buffer, 8 segments/quadrant) ---------------


def buffer_point(pt: np.ndarray, dist: float, quadsegs: int = 8):
    ang = np.linspace(0, 2 * np.pi, 4 * quadsegs + 1)
    ring = np.column_stack([pt[0] + dist * np.cos(ang), pt[1] + dist * np.sin(ang)])
    return ("polygon", [ring])


def buffer_line(pts: np.ndarray, dist: float, quadsegs: int = 8):
    """Capsule union approximation: convex hull of per-vertex circles for
    convex-ish lines; for general lines, a polygon built by offsetting both
    sides (adequate for pipeline use; exact GEOS buffer out of scope)."""
    circles = [buffer_point(p, dist, quadsegs)[1][0] for p in pts]
    return ("polygon", [convex_hull_points(np.vstack(circles))]) if len(pts) <= 2 else _offset_buffer(pts, dist, quadsegs)


def _offset_buffer(pts, dist, quadsegs):
    left, right = [], []
    for i in range(len(pts) - 1):
        a, b = pts[i], pts[i + 1]
        d = b - a
        L = np.hypot(*d)
        if L == 0:
            continue
        n = np.array([-d[1], d[0]]) / L * dist
        left += [a + n, b + n]
        right += [a - n, b - n]
    ring = np.vstack(left + right[::-1] + [left[0]])
    return ("polygon", [ring])


def buffer(geom, dist: float, quadsegs: int = 8):
    kind, data = geom
    if kind == "point":
        return buffer_point(data[0], dist, quadsegs)
    if kind == "linestring":
        return buffer_line(data, dist, quadsegs)
    if kind == "multipoint":
        return ("multipolygon", [buffer_point(p[1][0], dist, quadsegs) for p in data])
    raise NotImplementedError(f"buffer of {kind}")


# ---- measures --------------------------------------------------------------


def area(geom) -> float:
    kind, data = geom
    if kind == "polygon":
        total = 0.0
        for i, r in enumerate(data):
            x, y = r[:, 0], r[:, 1]
            a = 0.5 * abs(float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])))
            total += a if i == 0 else -a
        return total
    if kind == "multipolygon":
        return sum(area(p) for p in data)
    return 0.0


def length(geom) -> float:
    kind, data = geom
    if kind == "linestring":
        return float(np.hypot(np.diff(data[:, 0]), np.diff(data[:, 1])).sum())
    if kind == "polygon":
        return sum(float(np.hypot(np.diff(r[:, 0]), np.diff(r[:, 1])).sum()) for r in data)
    if kind in ("multilinestring", "multipolygon", "geometrycollection"):
        return sum(length(p) for p in data)
    return 0.0


def centroid(geom) -> tuple[float, float]:
    kind, data = geom
    if kind == "point":
        return float(data[0][0]), float(data[0][1])
    if kind == "polygon":
        r = data[0]
        x, y = r[:-1, 0], r[:-1, 1]
        xn, yn = r[1:, 0], r[1:, 1]
        cross = x * yn - xn * y
        a = cross.sum() / 2.0
        if abs(a) < 1e-12:
            return float(r[:, 0].mean()), float(r[:, 1].mean())
        cx = ((x + xn) * cross).sum() / (6.0 * a)
        cy = ((y + yn) * cross).sum() / (6.0 * a)
        return float(cx), float(cy)
    pts = _geom_points(geom)
    return float(pts[:, 0].mean()), float(pts[:, 1].mean())


# ---- validity (check-geometry / make-valid, limited scope) -----------------


def _segments_self_intersect(pts: np.ndarray) -> bool:
    """Any two non-adjacent segments of a closed ring properly intersect?"""
    from gdal_ray.vector.algebra import _seg_inter

    n = len(pts) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # first/last share the closing vertex
            res = _seg_inter(pts[i], pts[i + 1], pts[j], pts[j + 1])
            if res[0] == "overlap":
                return True
            if res[0] == "point":
                # shared endpoints of adjacent-ish segments are fine;
                # anything else is a self-intersection
                p = res[2]
                endpoints = (pts[i], pts[i + 1], pts[j], pts[j + 1])
                if not any(np.allclose(p, e) for e in endpoints):
                    return True
    return False


def check_geometry(geom) -> list[str]:
    """Validity report (`gdal vector check-geometry` analog). Returns a
    list of problems (empty = valid). Checks: ring closure, min vertex
    count, zero area, ring self-intersection."""
    kind, data = geom
    problems = []
    if kind == "polygon":
        for i, r in enumerate(data):
            r = np.asarray(r)
            if len(r) < 4:
                problems.append(f"ring {i}: fewer than 4 points")
                continue
            if not np.allclose(r[0], r[-1]):
                problems.append(f"ring {i}: not closed")
            x, y = r[:, 0], r[:, 1]
            # independent checks: a bowtie has zero SIGNED area AND
            # self-intersects — report both
            if abs(float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))) < 1e-30:
                problems.append(f"ring {i}: zero area")
            if _segments_self_intersect(r if np.allclose(r[0], r[-1]) else np.vstack([r, r[:1]])):
                problems.append(f"ring {i}: self-intersection")
    elif kind == "linestring":
        if len(data) < 2:
            problems.append("linestring: fewer than 2 points")
    elif kind in ("multipolygon", "multilinestring", "multipoint", "geometrycollection"):
        for i, p in enumerate(data):
            problems += [f"part {i}: {m}" for m in check_geometry(p)]
    return problems


def make_valid(geom):
    """Limited MakeValid (ogrgeometry.cpp:4183 analog): close unclosed
    rings, drop degenerate (sub-4-point / zero-area) rings, normalize ring
    orientation (exterior CCW). Self-intersecting rings are NOT repaired
    (GEOS-class node-splitting is out of scope) — check first."""
    kind, data = geom
    if kind == "polygon":
        rings = []
        for r in data:
            r = np.asarray(r, dtype=np.float64)
            if len(r) >= 3 and not np.allclose(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            if len(r) < 4:
                continue
            x, y = r[:, 0], r[:, 1]
            if abs(float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))) < 1e-30:
                continue
            rings.append(r)
        if not rings:
            return None
        from gdal_ray.vector.algebra import norm_rings, _close

        return ("polygon", [_close(r) for r in norm_rings(rings)])
    if kind in ("multipolygon", "geometrycollection"):
        parts = [make_valid(p) for p in data]
        parts = [p for p in parts if p is not None]
        return (kind, parts) if parts else None
    return geom


# ---- collections -----------------------------------------------------------


def explode_collection(geom):
    """1 multi-geometry -> N single geometries (vector explode-collections)."""
    kind, data = geom
    if kind in ("multipoint", "multilinestring", "multipolygon", "geometrycollection"):
        out = []
        for p in data:
            out.extend(explode_collection(p))
        return out
    return [geom]


def collect(geoms):
    """Inverse of explode (vector combine): geometries -> one collection."""
    kinds = {g[0] for g in geoms}
    if kinds == {"point"}:
        return ("multipoint", list(geoms))
    if kinds == {"linestring"}:
        return ("multilinestring", list(geoms))
    if kinds == {"polygon"}:
        return ("multipolygon", list(geoms))
    return ("geometrycollection", list(geoms))


# ---- dateline wrapping / precision model ----------------------------------
# wrap_dateline: behavior of ogr2ogr -wrapdateline (apps/ogr2ogr_lib.cpp:8201
# arg; OGRGeometryFactory::transformWithOptions WRAPDATELINE=YES +
# DATELINEOFFSET). set_precision: OGRGeometry::SetPrecision
# (ogr/ogrgeometry.cpp) — grid snap + degenerate cleanup. Both implemented
# from scratch on the tuple geometry model.


def _unwrap_lons(xy: np.ndarray) -> np.ndarray:
    """Continuous longitudes: each step takes the short way around (a jump
    of > 180 deg is a dateline crossing, the reference's core rule)."""
    lon = xy[:, 0].astype(np.float64).copy()
    if lon.size > 1:
        d = np.diff(lon)
        shift = np.cumsum(np.where(d > 180.0, -360.0, np.where(d < -180.0, 360.0, 0.0)))
        lon[1:] += shift
    return lon


def _near_dateline(lons: np.ndarray, offset: float) -> bool:
    """The reference's DATELINEOFFSET gate: only geometries with vertices
    within `offset` degrees of +/-180 (default 10) are split candidates."""
    return bool(np.any(lons > 180.0 - offset) and np.any(lons < -180.0 + offset))


def _clip_path_band(pts: np.ndarray, lo: float, hi: float, close: bool) -> np.ndarray:
    """Sutherland-Hodgman clip of a ring (close=True) against the vertical
    band lo <= x <= hi; for open polylines use _split_line_bands instead."""
    for bound, keep_right in ((lo, True), (hi, False)):
        if len(pts) == 0:
            return pts
        x = pts[:, 0]
        inside = x >= bound if keep_right else x <= bound
        out = []
        n = len(pts)
        for i in range(n):
            j = (i + 1) % n if close else i + 1
            if j >= n:
                if inside[i]:
                    out.append(pts[i])
                break
            if inside[i]:
                out.append(pts[i])
            if inside[i] != inside[j]:
                t = (bound - pts[i, 0]) / (pts[j, 0] - pts[i, 0])
                out.append(pts[i] + t * (pts[j] - pts[i]))
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return pts


def _band_of(lon: float) -> int:
    """Band k covers [-180 + 360k, 180 + 360k); shift by -360k normalizes."""
    return int(np.floor((lon + 180.0) / 360.0))


def wrap_dateline(geom, offset: float = 10.0):
    """Split geometries crossing the antimeridian into parts with all
    longitudes in [-180, 180] (ogr2ogr -wrapdateline semantics: a segment
    jumping > 180 deg of longitude crosses the dateline; only geometries
    with vertices within `offset` deg of +/-180 are candidates)."""
    kind, data = geom
    if kind == "point":
        lon = ((data[0][0] + 180.0) % 360.0) - 180.0
        return (kind, np.array([[lon, data[0][1]]]))
    if kind in ("multipoint", "multilinestring", "multipolygon", "geometrycollection"):
        parts = []
        for p in data:
            w = wrap_dateline(p, offset)
            parts.extend(explode_collection(w))
        return collect(parts) if parts else ("geometrycollection", [])
    if kind == "linestring":
        raw = data[:, 0]
        if not (_near_dateline(raw, offset) or np.any(np.abs(np.diff(raw)) > 180.0)):
            return geom
        lon = _unwrap_lons(data)
        pts = np.column_stack([lon, data[:, 1]])
        k0, k1 = _band_of(lon.min()), _band_of(lon.max())
        pieces = []
        for k in range(k0, k1 + 1):
            lo, hi = -180.0 + 360.0 * k, 180.0 + 360.0 * k
            piece = _split_polyline(pts, lo, hi)
            for pc_ in piece:
                pc_ = pc_.copy()
                pc_[:, 0] -= 360.0 * k
                pieces.append(("linestring", pc_))
        if len(pieces) == 1:
            return pieces[0]
        return ("multilinestring", pieces)
    if kind == "polygon":
        outer_raw = data[0][:, 0]
        if not (_near_dateline(outer_raw, offset)
                or np.any(np.abs(np.diff(outer_raw)) > 180.0)):
            return geom
        # unwrap outer; align holes to the outer ring's longitude frame
        rings = []
        outer_lon = _unwrap_lons(data[0])
        outer_mean = float(outer_lon.mean())
        rings.append(np.column_stack([outer_lon, data[0][:, 1]]))
        for hole in data[1:]:
            hl = _unwrap_lons(hole)
            hl += 360.0 * round((outer_mean - float(hl.mean())) / 360.0)
            rings.append(np.column_stack([hl, hole[:, 1]]))
        k0, k1 = _band_of(outer_lon.min()), _band_of(outer_lon.max() - 1e-12)
        polys = []
        for k in range(k0, k1 + 1):
            lo, hi = -180.0 + 360.0 * k, 180.0 + 360.0 * k
            newrings = []
            for idx, ring in enumerate(rings):
                r = ring[:-1] if len(ring) > 1 and np.allclose(ring[0], ring[-1]) else ring
                c = _clip_path_band(r, lo, hi, close=True)
                if len(c) >= 3 and abs(_shoelace(c)) > 1e-12:
                    c = np.vstack([c, c[:1]])
                    c[:, 0] -= 360.0 * k
                    newrings.append(c)
                elif idx == 0:
                    newrings = []
                    break
            if newrings:
                polys.append(("polygon", newrings))
        if not polys:
            return ("geometrycollection", [])
        return polys[0] if len(polys) == 1 else ("multipolygon", polys)
    return geom


def _shoelace(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _split_polyline(pts: np.ndarray, lo: float, hi: float) -> list[np.ndarray]:
    """Pieces of an open polyline inside [lo, hi], splitting segments at the
    band edges (interpolated crossing points included in both sides)."""
    out, cur = [], []
    n = len(pts)

    def clamp_pt(a, b, bound):
        t = (bound - a[0]) / (b[0] - a[0])
        return a + t * (b - a)

    for i in range(n):
        x = pts[i, 0]
        inside = lo <= x <= hi
        if inside:
            if not cur and i > 0:
                px = pts[i - 1, 0]
                if px < lo:
                    cur.append(clamp_pt(pts[i - 1], pts[i], lo))
                elif px > hi:
                    cur.append(clamp_pt(pts[i - 1], pts[i], hi))
            cur.append(pts[i])
        else:
            if cur:
                bound = lo if x < lo else hi
                cur.append(clamp_pt(pts[i - 1], pts[i], bound))
                out.append(np.asarray(cur))
                cur = []
    if cur:
        out.append(np.asarray(cur))
    return [p for p in out if len(p) >= 2]


def set_precision(geom, gridsize: float):
    """Snap every coordinate to the gridsize precision model (round half
    away from zero, like the reference's SetPrecision grid), dropping
    consecutive duplicate vertices and degenerate parts. Full GEOS-style
    topology repair (node splitting at new self-intersections) is out of
    scope — documented approximation."""

    def snap(xy: np.ndarray) -> np.ndarray:
        v = xy / gridsize
        return np.copysign(np.floor(np.abs(v) + 0.5), v) * gridsize

    def dedupe(xy: np.ndarray) -> np.ndarray:
        if len(xy) < 2:
            return xy
        keep = np.concatenate([[True], np.any(np.diff(xy, axis=0) != 0.0, axis=1)])
        return xy[keep]

    kind, data = geom
    if kind == "point":
        return (kind, snap(np.asarray(data, dtype=np.float64)))
    if kind == "linestring":
        pts = dedupe(snap(data))
        if len(pts) < 2:
            return ("geometrycollection", [])
        return (kind, pts)
    if kind == "polygon":
        rings = []
        for idx, ring in enumerate(data):
            r = dedupe(snap(ring))
            if len(r) > 1 and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            if len(r) >= 4:
                rings.append(r)
            elif idx == 0:
                return ("geometrycollection", [])
        return ("polygon", rings)
    parts = [set_precision(p, gridsize) for p in data]
    parts = [p for p in parts if p[0] != "geometrycollection" or p[1]]
    if not parts:
        return ("geometrycollection", [])
    return (kind, parts)
