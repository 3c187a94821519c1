"""Layer algebra: Intersection / Union / SymDifference / Identity / Update /
Clip / Erase — OGRLayer semantics (ogr/ogrsf_frmts/generic/ogrlayer.cpp:
Intersection :5385, Union :5803, SymDifference :6340, Identity :6770,
Update :7188, Clip :7537, Erase :7846), with a from-scratch polygon boolean
core (edge-split + midpoint classification + ring stitching).

Per-pair geometry ops replicate GEOS result DIMENSIONS: polygons that only
touch intersect in points/lines (lower-dimension results), governed by
KEEP_LOWER_DIMENSION_GEOMETRIES (default YES; count matrix in
autotest/ogr/ogr_layer_algebra.py:273-335). PROMOTE_TO_MULTI wraps outputs
in Multi* types (ogrlayer.cpp:5293-5304).

Scope note: the boolean core targets simple polygons with transversal or
touching boundaries (the reference test corpus); exotic degeneracies
(overlapping collinear edges of near-equal polygons) are out of scope and
raise or approximate — documented, not silent.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo.pip import point_in_polygon

EPS = 1e-9


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _ring_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _close(ring: np.ndarray) -> np.ndarray:
    if not np.allclose(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def _open(ring: np.ndarray) -> np.ndarray:
    if np.allclose(ring[0], ring[-1]):
        return ring[:-1]
    return ring


def norm_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Exterior (largest |area|) CCW first, holes CW."""
    rings = [_open(np.asarray(r, dtype=np.float64)) for r in rings]
    rings = sorted(rings, key=lambda r: -abs(_ring_area2(_close(r))))
    out = []
    for i, r in enumerate(rings):
        a = _ring_area2(_close(r))
        want_ccw = i == 0
        if (a > 0) != want_ccw:
            r = r[::-1]
        out.append(r)
    return out


def _seg_inter(p1, p2, p3, p4):
    """Intersection of segments p1p2 and p3p4.
    Returns ("none") | ("point", t12, pt) | ("overlap", (ta, tb) in p1p2
    param, pts) — collinear overlaps return the shared sub-segment."""
    d1 = p2 - p1
    d2 = p4 - p3
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    r = p3 - p1
    if abs(denom) > EPS:
        t = (r[0] * d2[1] - r[1] * d2[0]) / denom
        u = (r[0] * d1[1] - r[1] * d1[0]) / denom
        if -EPS <= t <= 1 + EPS and -EPS <= u <= 1 + EPS:
            t = min(max(t, 0.0), 1.0)
            return ("point", t, p1 + t * d1)
        return ("none",)
    # parallel: collinear?
    cross = r[0] * d1[1] - r[1] * d1[0]
    if abs(cross) > EPS:
        return ("none",)
    # collinear: project onto d1
    L2 = d1 @ d1
    if L2 < EPS:
        return ("none",)
    ta = (p3 - p1) @ d1 / L2
    tb = (p4 - p1) @ d1 / L2
    lo, hi = min(ta, tb), max(ta, tb)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    if hi < lo - EPS:
        return ("none",)
    if hi - lo < EPS:
        pt = p1 + lo * d1
        return ("point", lo, pt)
    return ("overlap", (lo, hi), (p1 + lo * d1, p1 + hi * d1))


def _ring_edges(rings: list[np.ndarray]):
    for r in rings:
        rc = _close(r)
        for i in range(len(rc) - 1):
            yield rc[i], rc[i + 1]


def _split_against(rings: list[np.ndarray], other: list[np.ndarray]):
    """Split every edge of `rings` at intersections with `other`'s edges.
    Returns directed sub-edges [(a, b)]."""
    other_edges = list(_ring_edges(other))
    out = []
    for a, b in _ring_edges(rings):
        ts = [0.0, 1.0]
        for c, d in other_edges:
            res = _seg_inter(a, b, c, d)
            if res[0] == "point":
                ts.append(res[1])
            elif res[0] == "overlap":
                ts.extend(res[1])
        ts = sorted(set(min(max(t, 0.0), 1.0) for t in ts))
        d1 = b - a
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 > EPS:
                out.append((a + t0 * d1, a + t1 * d1))
    return out


def _on_boundary(pt, rings, eps=1e-7) -> bool:
    for a, b in _ring_edges(rings):
        d = b - a
        L2 = d @ d
        if L2 < EPS:
            continue
        t = min(max(((pt - a) @ d) / L2, 0.0), 1.0)
        proj = a + t * d
        if (pt[0] - proj[0]) ** 2 + (pt[1] - proj[1]) ** 2 < eps * eps:
            return True
    return False


def _inside(pt, rings) -> bool:
    return bool(
        point_in_polygon(np.array([pt[0]]), np.array([pt[1]]), [_close(r) for r in rings])[0]
    )


def _stitch_rings(edges):
    """Directed edges -> closed rings (endpoint hashing with rounding)."""
    def key(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    from collections import defaultdict

    outgoing = defaultdict(list)
    for a, b in edges:
        if key(a) != key(b):
            outgoing[key(a)].append((a, b))
    rings = []
    used = set()
    for idx, (a0, b0) in enumerate(edges):
        if key(a0) == key(b0) or (key(a0), key(b0)) in used:
            continue
        ring = [a0]
        cur = b0
        prev = a0
        used.add((key(a0), key(b0)))
        guard = 0
        while key(cur) != key(ring[0]) and guard < 100000:
            guard += 1
            cands = [e for e in outgoing[key(cur)] if (key(e[0]), key(e[1])) not in used]
            if not cands:
                break
            if len(cands) > 1:
                # continue with the leftmost turn (keeps regions simple)
                din = cur - prev
                ang = np.arctan2(din[1], din[0])

                def turn(e):
                    dout = e[1] - e[0]
                    a = np.arctan2(dout[1], dout[0]) - ang
                    return (a + np.pi) % (2 * np.pi)

                cands.sort(key=turn, reverse=True)
            nxt = cands[0]
            used.add((key(nxt[0]), key(nxt[1])))
            ring.append(cur)
            prev, cur = cur, nxt[1]
        if key(cur) == key(ring[0]) and len(ring) >= 3:
            rings.append(np.array(ring))
    return rings


def polygon_boolean(a_rings, b_rings, op: str) -> list[np.ndarray]:
    """op in intersection|difference|union on ring lists (normalized)."""
    A = norm_rings(a_rings)
    B = norm_rings(b_rings)
    ea = _split_against(A, B)
    eb = _split_against(B, A)

    def classify(edges, other):
        ins, outs, ons = [], [], []
        for a, b in edges:
            mid = (a + b) / 2
            if _on_boundary(mid, other):
                ons.append((a, b))
            elif _inside(mid, other):
                ins.append((a, b))
            else:
                outs.append((a, b))
        return ins, outs, ons

    a_in, a_out, a_on = classify(ea, B)
    b_in, b_out, b_on = classify(eb, A)

    if op == "intersection":
        edges = a_in + b_in + a_on
    elif op == "difference":
        edges = a_out + [(b, a) for a, b in b_in]
        # shared edges: keep those whose B-twin runs the opposite way
        edges += [(b, a) for a, b in b_on if not _inside(((a + b) / 2) + _left_normal(a, b) * 1e-6, A)]
    elif op == "union":
        edges = a_out + b_out + a_on
    else:
        raise ValueError(op)
    return _stitch_rings(edges)


def _left_normal(a, b):
    d = b - a
    n = np.array([-d[1], d[0]])
    L = np.hypot(*n)
    return n / L if L > 0 else n


# ---------------------------------------------------------------------------
# geometry-level ops with dimension handling
# ---------------------------------------------------------------------------


def _as_ring_list(geom):
    kind, data = geom
    if kind == "polygon":
        return [data]
    if kind == "multipolygon":
        return [d for _, d in data]
    raise ValueError(kind)


def _mk_poly_geom(ring_groups):
    """List of ring-lists -> polygon or multipolygon geom tuple."""
    if not ring_groups:
        return None
    if len(ring_groups) == 1:
        return ("polygon", [_close(r) for r in ring_groups[0]])
    return ("multipolygon", [("polygon", [_close(r) for r in g]) for g in ring_groups])


def _group_rings(rings):
    """Assign holes (negative area) to the exterior (positive area) that
    contains them."""
    exts = [r for r in rings if _ring_area2(_close(r)) > 0]
    holes = [r for r in rings if _ring_area2(_close(r)) <= 0]
    groups = [[e] for e in exts]
    for h in holes:
        pt = h[0]
        for g in groups:
            if _inside(pt, [g[0]]):
                g.append(h)
                break
    return groups


def _boundary_touches(a_rings, b_rings):
    """Lower-dimension intersection of two polygons that only touch:
    collect boundary-boundary intersection points / overlap segments."""
    pts, segs = [], []
    for p1, p2 in _ring_edges(norm_rings(a_rings)):
        for p3, p4 in _ring_edges(norm_rings(b_rings)):
            res = _seg_inter(p1, p2, p3, p4)
            if res[0] == "point":
                pts.append(tuple(np.round(res[2], 9)))
            elif res[0] == "overlap":
                segs.append(res[2])
    pts = sorted(set(pts))
    if segs:
        return ("multilinestring", [("linestring", np.array([a, b])) for a, b in segs])
    if len(pts) == 1:
        return ("point", np.array([pts[0]]))
    if pts:
        return ("multipoint", [("point", np.array([p])) for p in pts])
    return None


def geom_dim(geom) -> int:
    kind = geom[0]
    if kind in ("point", "multipoint"):
        return 0
    if kind in ("linestring", "multilinestring"):
        return 1
    if kind in ("polygon", "multipolygon"):
        return 2
    if kind == "geometrycollection":
        return max((geom_dim(p) for p in geom[1]), default=0)
    raise ValueError(kind)


def _line_segments(geom):
    kind, data = geom
    if kind == "linestring":
        return [data]
    if kind == "multilinestring":
        return [d for _, d in data]
    raise ValueError(kind)


def _line_line_intersection(ga, gb):
    pts = []
    segs = []
    for la in _line_segments(ga):
        for lb in _line_segments(gb):
            for i in range(len(la) - 1):
                for j in range(len(lb) - 1):
                    res = _seg_inter(la[i], la[i + 1], lb[j], lb[j + 1])
                    if res[0] == "point":
                        pts.append(tuple(np.round(res[2], 9)))
                    elif res[0] == "overlap":
                        segs.append(res[2])
    if segs:
        return ("multilinestring", [("linestring", np.array([a, b])) for a, b in segs])
    pts = sorted(set(pts))
    if not pts:
        return None
    if len(pts) == 1:
        return ("point", np.array([pts[0]]))
    return ("multipoint", [("point", np.array([p])) for p in pts])


def _clip_line_by_polygon(line_geom, poly_geom, keep_inside: bool):
    rings = [_close(r) for r in _as_ring_list(poly_geom)[0]] if poly_geom[0] == "polygon" else None
    ring_list = _as_ring_list(poly_geom)
    all_rings = [r for grp in ring_list for r in grp]
    out = []
    for seg in _line_segments(line_geom):
        # split at all boundary crossings
        for i in range(len(seg) - 1):
            a, b = seg[i], seg[i + 1]
            ts = [0.0, 1.0]
            for grp in ring_list:
                for c, d in _ring_edges(norm_rings(grp)):
                    res = _seg_inter(a, b, c, d)
                    if res[0] == "point":
                        ts.append(res[1])
                    elif res[0] == "overlap":
                        ts.extend(res[1])
            ts = sorted(set(min(max(t, 0.0), 1.0) for t in ts))
            d1 = b - a
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= EPS:
                    continue
                mid = a + (t0 + t1) / 2 * d1
                inside = any(_inside(mid, grp) for grp in ring_list)
                if inside == keep_inside:
                    out.append(np.array([a + t0 * d1, a + t1 * d1]))
    if not out:
        return None
    if len(out) == 1:
        return ("linestring", out[0])
    return ("multilinestring", [("linestring", s) for s in out])


def intersection_geom(ga, gb, keep_lower_dim: bool = True):
    """Pairwise intersection with GEOS-like dimension semantics."""
    da, db = geom_dim(ga), geom_dim(gb)
    if da == 2 and db == 2:
        best = []
        for ra in _as_ring_list(ga):
            for rb in _as_ring_list(gb):
                rings = polygon_boolean(ra, rb, "intersection")
                rings = [r for r in rings if abs(_ring_area2(_close(r))) > EPS]
                if rings:
                    best.extend(_group_rings(rings))
        if best:
            return _mk_poly_geom(best)
        if not keep_lower_dim:
            return None
        touch = None
        for ra in _as_ring_list(ga):
            for rb in _as_ring_list(gb):
                touch = touch or _boundary_touches(ra, rb)
        return touch
    if da == 1 and db == 1:
        res = _line_line_intersection(ga, gb)
        if res is not None and geom_dim(res) < 1 and not keep_lower_dim:
            return None
        return res
    if da == 1 and db == 2:
        return _clip_line_by_polygon(ga, gb, True)
    if da == 2 and db == 1:
        return _clip_line_by_polygon(gb, ga, True)
    if da == 0 and db == 2:
        return _points_in_polygon(ga, gb, keep_inside=True)
    if da == 2 and db == 0:
        return _points_in_polygon(gb, ga, keep_inside=True)
    raise NotImplementedError(f"intersection {ga[0]} x {gb[0]}")


def _points_in_polygon(pt_geom, poly_geom, keep_inside: bool):
    pts = (
        [pt_geom[1][0]] if pt_geom[0] == "point" else [p[1][0] for p in pt_geom[1]]
    )
    groups = _as_ring_list(poly_geom)
    kept = [
        p
        for p in pts
        if (any(_inside(p, grp) or _on_boundary(p, grp) for grp in groups)) == keep_inside
    ]
    if not kept:
        return None
    if len(kept) == 1:
        return ("point", np.array([kept[0]]))
    return ("multipoint", [("point", np.array([p])) for p in kept])


def difference_geom(ga, gb):
    """ga minus gb."""
    da, db = geom_dim(ga), geom_dim(gb)
    if da == 2 and db == 2:
        parts = _as_ring_list(ga)
        out_groups = []
        for ra in parts:
            remainder = [ra]
            for rb in _as_ring_list(gb):
                new_rem = []
                for rr in remainder:
                    rings = polygon_boolean(rr, rb, "difference")
                    rings = [r for r in rings if abs(_ring_area2(_close(r))) > EPS]
                    if rings:
                        new_rem.extend(_group_rings(rings))
                remainder = new_rem
            out_groups.extend(remainder)
        return _mk_poly_geom(out_groups)
    if da == 1 and db == 2:
        return _clip_line_by_polygon(ga, gb, False)
    if da == 1 and db == 1:
        return ga  # line minus line: measure-zero removal, GEOS returns input
    if da == 0 and db == 2:
        return _points_in_polygon(ga, gb, keep_inside=False)
    if da == 0:
        return ga
    raise NotImplementedError(f"difference {ga[0]} - {gb[0]}")


def promote_to_multi(geom):
    kind, data = geom
    if kind == "point":
        return ("multipoint", [geom])
    if kind == "linestring":
        return ("multilinestring", [geom])
    if kind == "polygon":
        return ("multipolygon", [geom])
    return geom


# ---------------------------------------------------------------------------
# layer-level operations (lists of (geom, attrs) dicts)
# ---------------------------------------------------------------------------


def _bbox(geom):
    kind, data = geom
    if kind == "point":
        p = data[0]
        return (p[0], p[1], p[0], p[1])
    if kind == "linestring":
        return (data[:, 0].min(), data[:, 1].min(), data[:, 0].max(), data[:, 1].max())
    if kind == "polygon":
        allp = np.vstack(data)
        return (allp[:, 0].min(), allp[:, 1].min(), allp[:, 0].max(), allp[:, 1].max())
    boxes = [_bbox(p) for p in data]
    return (
        min(b[0] for b in boxes), min(b[1] for b in boxes),
        max(b[2] for b in boxes), max(b[3] for b in boxes),
    )


def _bbox_overlap(b1, b2):
    return not (b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1])


def layer_op(op: str, input_feats, method_feats, *, keep_lower_dim=True,
             promote=False):
    """input_feats/method_feats: list[(geom, attrs dict)].
    Returns list[(geom, attrs)] with OGR layer-algebra row semantics."""
    out = []
    in_boxes = [_bbox(g) for g, _ in input_feats]
    m_boxes = [_bbox(g) for g, _ in method_feats]

    def emit(geom, attrs):
        if geom is None:
            return
        out.append((promote_to_multi(geom) if promote else geom, attrs))

    if op in ("intersection", "identity", "union", "clip"):
        for (ga, aa), ba in zip(input_feats, in_boxes):
            for (gm, am), bm in zip(method_feats, m_boxes):
                if not _bbox_overlap(ba, bm):
                    continue
                inter = intersection_geom(ga, gm, keep_lower_dim=keep_lower_dim)
                if inter is None:
                    continue
                attrs = dict(aa) if op == "clip" else {**aa, **am}
                emit(inter, attrs)
    if op in ("union", "identity", "symdifference", "erase", "update"):
        # input-side remainders
        for (ga, aa), ba in zip(input_feats, in_boxes):
            rem = ga
            for (gm, am), bm in zip(method_feats, m_boxes):
                if rem is None or not _bbox_overlap(_bbox(rem), bm):
                    continue
                # only subtract if they truly interact (area or touch)
                rem = difference_geom(rem, gm)
            if rem is not None:
                emit(rem, dict(aa))
    if op in ("union", "symdifference"):
        # method-side remainders
        for (gm, am), bm in zip(method_feats, m_boxes):
            rem = gm
            for (ga, aa), ba in zip(input_feats, in_boxes):
                if rem is None or not _bbox_overlap(_bbox(rem), ba):
                    continue
                rem = difference_geom(rem, ga)
            if rem is not None:
                emit(rem, dict(am))
    if op == "update":
        # method features pass through unchanged (replace overlapping areas)
        for gm, am in method_feats:
            emit(gm, dict(am))
    return out
