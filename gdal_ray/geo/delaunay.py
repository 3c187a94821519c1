"""Delaunay triangulation from scratch (Bowyer-Watson) + TIN interpolation
+ chi-shape concave hull.

Reference surface: `gdal vector grid` linear/TIN interpolation
(alg/gdal_alg.h:402-416 GGA_Linear, alg/delaunay.c) and
`gdal vector concave-hull` (apps/gdalalg_vector_concave_hull.cpp, backed by
GEOS ConcaveHull's edge-length-ratio erosion). Both reimplemented on a
plain numpy Bowyer-Watson triangulation:

* delaunay(points): incremental insertion with vectorized circumcircle
  tests — O(n * m) with small constants, fine for the per-TIN point counts
  the grid path broadcasts.
* interpolate_linear: barycentric interpolation over the TIN with a
  bucket-grid point locator (vectorized per bucket).
* concave_hull: chi-shape boundary erosion (Duckham et al. 2008): longest
  boundary edges above the length threshold are eroded while the
  triangulation stays regular; ratio=1 -> convex hull, ratio->0 -> tightest
  regular hull. Same parameterization direction as the reference.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _circumcircle(P: np.ndarray, a: int, b: int, c: int):
    ax, ay = P[a]; bx, by = P[b]; cx, cy = P[c]
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (0.0, 0.0), -1.0  # degenerate: never matched by in-circle
    a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy), r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n, 2) float64 -> (m, 3) int32 triangle vertex indices (CCW not
    guaranteed; indices reference the INPUT rows). Duplicate points are
    triangulated once; degenerate inputs (<3 distinct non-collinear
    points) return an empty array. A deterministic 1e-9-relative jitter
    is applied INTERNALLY for robustness on gridded inputs; output
    indices always reference the original coordinates."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int32)
    _, uniq_idx = np.unique(pts.round(12), axis=0, return_index=True)
    active = np.sort(uniq_idx)
    span = max(float(pts[:, 0].ptp()), float(pts[:, 1].ptp()), 1e-9)
    rng = np.random.RandomState(12345)
    work = pts + rng.uniform(-1, 1, pts.shape) * span * 1e-9
    mn = work.min(axis=0); mx = work.max(axis=0)
    d = span * 20.0
    sp = np.array([[mn[0] - d, mn[1] - d],
                   [mx[0] + 3 * d, mn[1] - d],
                   [mn[0] - d, mx[1] + 3 * d]])
    P = np.vstack([work, sp])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    ccs = [(_circumcircle(P, n, n + 1, n + 2))]
    cc_xy = [ccs[0][0]]; cc_r2 = [ccs[0][1]]
    for i in active:
        cx = np.array([c[0] for c in cc_xy]); cy = np.array([c[1] for c in cc_xy])
        r2 = np.array(cc_r2)
        px, py = P[i]
        bad = np.nonzero((px - cx) ** 2 + (py - cy) ** 2 < r2)[0]
        if bad.size == 0:
            continue
        edge_count: Counter = Counter()
        for t_i in bad:
            a, b, c = tris[t_i]
            for e in ((a, b), (b, c), (c, a)):
                edge_count[tuple(sorted(e))] += 1
        keep = np.ones(len(tris), bool)
        keep[bad] = False
        tris = [t for k, t in zip(keep, tris) if k]
        cc_xy = [c for k, c in zip(keep, cc_xy) if k]
        cc_r2 = [r for k, r in zip(keep, cc_r2) if k]
        for (a, b), cnt in edge_count.items():
            if cnt != 1:
                continue
            tris.append((a, b, int(i)))
            xy, r2v = _circumcircle(P, a, b, int(i))
            cc_xy.append(xy); cc_r2.append(r2v)
    out = [t for t in tris if max(t) < n]
    return np.array(out, np.int32).reshape(-1, 3)


def interpolate_linear(points: np.ndarray, values: np.ndarray,
                       qx: np.ndarray, qy: np.ndarray,
                       *, tris: np.ndarray | None = None,
                       nodata: float = np.nan) -> np.ndarray:
    """Barycentric (TIN) interpolation of scattered (points, values) at
    query coords. Outside the convex hull -> nodata. Vectorized per
    bucket of a uniform grid over triangle bboxes."""
    pts = np.asarray(points, np.float64)
    vals = np.asarray(values, np.float64)
    if tris is None:
        tris = delaunay(pts)
    out = np.full(qx.shape, nodata, np.float64)
    if len(tris) == 0:
        return out
    ax, ay = pts[tris[:, 0], 0], pts[tris[:, 0], 1]
    bx, by = pts[tris[:, 1], 0], pts[tris[:, 1], 1]
    cx, cy = pts[tris[:, 2], 0], pts[tris[:, 2], 1]
    det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    # bucket grid over the hull extent
    nb = max(1, int(np.sqrt(len(tris))))
    x0, x1 = pts[:, 0].min(), pts[:, 0].max()
    y0, y1 = pts[:, 1].min(), pts[:, 1].max()
    sx = (x1 - x0) / nb or 1.0
    sy = (y1 - y0) / nb or 1.0
    buckets: dict = defaultdict(list)
    tminx = np.minimum(np.minimum(ax, bx), cx)
    tmaxx = np.maximum(np.maximum(ax, bx), cx)
    tminy = np.minimum(np.minimum(ay, by), cy)
    tmaxy = np.maximum(np.maximum(ay, by), cy)
    for ti in range(len(tris)):
        bx0 = int((tminx[ti] - x0) / sx); bx1 = int((tmaxx[ti] - x0) / sx)
        by0 = int((tminy[ti] - y0) / sy); by1 = int((tmaxy[ti] - y0) / sy)
        for bxx in range(max(bx0, 0), min(bx1, nb - 1) + 1):
            for byy in range(max(by0, 0), min(by1, nb - 1) + 1):
                buckets[(bxx, byy)].append(ti)
    qbx = np.clip(((qx - x0) / sx).astype(np.int64), 0, nb - 1)
    qby = np.clip(((qy - y0) / sy).astype(np.int64), 0, nb - 1)
    order = np.lexsort((qby, qbx))
    sb = np.stack([qbx[order], qby[order]], 1)
    bounds = np.concatenate([[0], np.nonzero((sb[1:] != sb[:-1]).any(1))[0] + 1, [len(order)]])
    eps = 1e-12
    for s, e in zip(bounds[:-1], bounds[1:]):
        qi = order[s:e]
        key = (int(sb[s, 0]), int(sb[s, 1]))
        cand = buckets.get(key, [])
        if not cand:
            continue
        px, py = qx[qi], qy[qi]
        remaining = np.ones(qi.size, bool)
        for ti in cand:
            if not remaining.any():
                break
            dv = det[ti]
            if dv == 0:
                continue
            l1 = ((by[ti] - cy[ti]) * (px - cx[ti]) + (cx[ti] - bx[ti]) * (py - cy[ti])) / dv
            l2 = ((cy[ti] - ay[ti]) * (px - cx[ti]) + (ax[ti] - cx[ti]) * (py - cy[ti])) / dv
            l3 = 1.0 - l1 - l2
            inside = remaining & (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
            if inside.any():
                t0, t1, t2 = tris[ti]
                out[qi[inside]] = (l1[inside] * vals[t0] + l2[inside] * vals[t1]
                                   + l3[inside] * vals[t2])
                remaining &= ~inside
    return out


def _boundary_edges(tri_set: set) -> Counter:
    cnt: Counter = Counter()
    for (a, b, c) in tri_set:
        for e in ((a, b), (b, c), (c, a)):
            cnt[tuple(sorted(e))] += 1
    return cnt


def concave_hull(points: np.ndarray, ratio: float = 0.3) -> list[np.ndarray]:
    """Chi-shape concave hull: erode boundary edges longer than
    min_len + ratio * (max_len - min_len) while the shape stays regular
    (only triangles with exactly one boundary edge erode). Returns the
    boundary ring(s) as coordinate arrays (closed)."""
    pts = np.asarray(points, np.float64)
    tris = delaunay(pts)
    if len(tris) == 0:
        return []
    tri_set = {tuple(t) for t in map(tuple, tris)}

    def elen(e):
        return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

    all_edges = {tuple(sorted(e)) for t in tri_set
                 for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))}
    lens = [elen(e) for e in all_edges]
    lo, hi = min(lens), max(lens)
    threshold = lo + np.clip(ratio, 0.0, 1.0) * (hi - lo)

    while True:
        cnt = _boundary_edges(tri_set)
        boundary = {e for e, c in cnt.items() if c == 1}
        # candidate erosions: boundary triangle with EXACTLY one boundary
        # edge, that edge longer than the threshold
        best = None
        for t in tri_set:
            edges = [tuple(sorted(e)) for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))]
            bes = [e for e in edges if e in boundary]
            if len(bes) != 1:
                continue
            length = elen(bes[0])
            if length > threshold and (best is None or length > best[0]):
                best = (length, t)
        if best is None:
            break
        tri_set.discard(best[1])

    cnt = _boundary_edges(tri_set)
    ring_edges = [e for e, c in cnt.items() if c == 1]
    adj = defaultdict(list)
    for a, b in ring_edges:
        adj[a].append(b)
        adj[b].append(a)
    rings = []
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        ring = [start]
        seen.add(start)
        cur, prev = start, None
        while True:
            nxts = [v for v in adj[cur] if v != prev and (v == start or v not in seen)]
            if not nxts:
                break
            nxt = nxts[0]
            if nxt == start:
                ring.append(start)
                break
            ring.append(nxt)
            seen.add(nxt)
            prev, cur = cur, nxt
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(pts[np.array(ring)])
    return rings
