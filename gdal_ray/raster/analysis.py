"""Raster analysis kernels: contour (marching squares), sieve, proximity.

Reference semantics:
  contour    alg/contour.cpp:569 + alg/marching_squares/ — iso-lines at
             given levels, linear interpolation along pixel edges, pixel
             centers as sample points.
  sieve      alg/gdalsievefilter.cpp:178 — polygons smaller than `threshold`
             pixels merge into their largest neighbor polygon.
  proximity  alg/gdalproximity.cpp:178 — distance to nearest target pixel;
             implemented here as the EXACT euclidean distance transform
             (Felzenszwalb-Huttenlocher two-pass 1-D parabola method) rather
             than the reference's two-sweep approximation.

All per-tile numpy; the distributed composition mirrors polygonize's
(per-tile kernel + halo/edge-keyed merge).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.raster.polygonize import UnionFind, label_array


# ---------------------------------------------------------------------------
# marching-squares contour
# ---------------------------------------------------------------------------


def contour_segments(arr: np.ndarray, level: float):
    """Iso-line segments at `level`. Grid samples sit at pixel centers
    (x+0.5, y+0.5); each 2x2 sample cell contributes 0-2 segments with
    linearly interpolated crossings. Saddles resolved by the cell-center
    average (the standard marching-squares disambiguation)."""
    a = arr.astype(np.float64)
    h, w = a.shape
    segs = []

    def interp(p1, v1, p2, v2):
        t = (level - v1) / (v2 - v1)
        return (p1[0] + t * (p2[0] - p1[0]), p1[1] + t * (p2[1] - p1[1]))

    for y in range(h - 1):
        for x in range(w - 1):
            tl, tr = a[y, x], a[y, x + 1]
            bl, br = a[y + 1, x], a[y + 1, x + 1]
            idx = (
                (1 if tl >= level else 0)
                | (2 if tr >= level else 0)
                | (4 if br >= level else 0)
                | (8 if bl >= level else 0)
            )
            if idx in (0, 15):
                continue
            # corner coords at pixel centers
            TL, TR = (x + 0.5, y + 0.5), (x + 1.5, y + 0.5)
            BL, BR = (x + 0.5, y + 1.5), (x + 1.5, y + 1.5)
            top = lambda: interp(TL, tl, TR, tr)
            bottom = lambda: interp(BL, bl, BR, br)
            left = lambda: interp(TL, tl, BL, bl)
            right = lambda: interp(TR, tr, BR, br)
            table = {
                1: [(left, top)], 2: [(top, right)], 3: [(left, right)],
                4: [(right, bottom)], 6: [(top, bottom)], 7: [(left, bottom)],
                8: [(bottom, left)], 9: [(bottom, top)], 11: [(bottom, right)],
                12: [(right, left)], 13: [(right, top)], 14: [(top, left)],
            }
            if idx in (5, 10):
                center = (tl + tr + bl + br) / 4.0
                if idx == 5:
                    pairs = [(left, top), (right, bottom)] if center < level else [(left, bottom), (right, top)]
                else:
                    pairs = [(top, right), (bottom, left)] if center < level else [(top, left), (bottom, right)]
            else:
                pairs = table[idx]
            for f1, f2 in pairs:
                segs.append((f1(), f2()))
    return segs


def stitch_polylines(segs, tol: float = 1e-9):
    """Join segments endpoint-to-endpoint into polylines (order-insensitive)."""
    def key(p):
        return (round(p[0], 9), round(p[1], 9))

    from collections import defaultdict

    adj = defaultdict(list)
    for i, (a, b) in enumerate(segs):
        adj[key(a)].append((i, True))
        adj[key(b)].append((i, False))
    used = [False] * len(segs)
    lines = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        a, b = segs[start]
        line = [a, b]
        # extend forward
        for end_idx in (1, 0):
            while True:
                k = key(line[-1] if end_idx else line[0])
                nxt = [(i, fwd) for i, fwd in adj[k] if not used[i]]
                if not nxt:
                    break
                i, fwd = nxt[0]
                used[i] = True
                p = segs[i][1] if fwd else segs[i][0]
                if end_idx:
                    line.append(p)
                else:
                    line.insert(0, p)
        lines.append(np.array(line))
    return lines


def contour(arr: np.ndarray, levels, geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """-> [(level, polyline ndarray in geo coords)]."""
    g0, g1, g2, g3, g4, g5 = geotransform
    out = []
    for lv in levels:
        for line in stitch_polylines(contour_segments(arr, lv)):
            gx = g0 + line[:, 0] * g1 + line[:, 1] * g2
            gy = g3 + line[:, 0] * g4 + line[:, 1] * g5
            out.append((float(lv), np.column_stack([gx, gy])))
    return out


# ---------------------------------------------------------------------------
# sieve
# ---------------------------------------------------------------------------


def sieve(arr: np.ndarray, threshold: int, connectivity: int = 4) -> np.ndarray:
    """Merge regions smaller than `threshold` pixels into their largest
    neighbor region (by pixel count), iterating until stable — the
    reference's polygon-size filter semantics."""
    out = arr.copy()
    while True:
        labels = label_array(out, connectivity=connectivity)
        nlab = labels.max() + 1
        sizes = np.bincount(labels.ravel(), minlength=nlab)
        small = np.nonzero(sizes < threshold)[0]
        if small.size == 0:
            return out
        # neighbor graph via horizontal/vertical adjacent label pairs
        from collections import defaultdict

        neigh = defaultdict(set)
        for (sl_a, sl_b) in (
            (labels[:, :-1], labels[:, 1:]),
            (labels[:-1, :], labels[1:, :]),
        ):
            diff = sl_a != sl_b
            for la, lb in zip(sl_a[diff].ravel(), sl_b[diff].ravel()):
                neigh[la].add(lb)
                neigh[lb].add(la)
        changed = False
        # merge smallest regions first (deterministic)
        for lab in sorted(small, key=lambda l: (sizes[l], l)):
            nbrs = [n for n in neigh.get(lab, ()) if n != lab]
            if not nbrs:
                continue
            tgt = max(nbrs, key=lambda n: (sizes[n], -n))
            ys, xs = np.nonzero(labels == lab)
            val = out[np.nonzero(labels == tgt)[0][0], np.nonzero(labels == tgt)[1][0]]
            out[ys, xs] = val
            changed = True
        if not changed:
            return out


# ---------------------------------------------------------------------------
# proximity (exact euclidean distance transform)
# ---------------------------------------------------------------------------


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """Felzenszwalb-Huttenlocher 1-D squared distance transform."""
    n = f.size
    d = np.empty(n)
    v = np.empty(n, dtype=np.int64)
    z = np.empty(n + 1)
    k = 0
    v[0] = 0
    z[0], z[1] = -np.inf, np.inf
    for q in range(1, n):
        while True:
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            if s <= z[k]:
                k -= 1
            else:
                break
        k += 1
        v[k] = q
        z[k], z[k + 1] = s, np.inf
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def proximity(target_mask: np.ndarray) -> np.ndarray:
    """Exact euclidean distance (pixels) to the nearest True pixel."""
    INF = 1e18
    f = np.where(target_mask, 0.0, INF)
    # columns then rows
    g = np.empty_like(f)
    for x in range(f.shape[1]):
        g[:, x] = _edt_1d(f[:, x])
    out = np.empty_like(f)
    for y in range(f.shape[0]):
        out[y, :] = _edt_1d(g[y, :])
    return np.sqrt(out)
