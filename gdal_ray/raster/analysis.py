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


#: marching-squares case table: config index -> [(edge_from, edge_to)];
#: edges named t/b/l/r. Saddles (5, 10) handled separately.
_MS_CASES = {
    1: [("l", "t")], 2: [("t", "r")], 3: [("l", "r")],
    4: [("r", "b")], 6: [("t", "b")], 7: [("l", "b")],
    8: [("b", "l")], 9: [("b", "t")], 11: [("b", "r")],
    12: [("r", "l")], 13: [("r", "t")], 14: [("t", "l")],
}


def contour_segments(arr: np.ndarray, level: float, *, valid: np.ndarray | None = None):
    """Iso-line segments at `level`, fully vectorized marching squares.
    Grid samples sit at pixel centers (x+0.5, y+0.5); each 2x2 sample cell
    contributes 0-2 segments with linearly interpolated crossings. Saddles
    resolved by the cell-center average (standard disambiguation).
    `valid` (same shape as arr): cells touching an invalid sample emit
    nothing (used by the tiled path at raster boundaries)."""
    a = arr.astype(np.float64)
    tl, tr = a[:-1, :-1], a[:-1, 1:]
    bl, br = a[1:, :-1], a[1:, 1:]
    idx = (
        (tl >= level).astype(np.uint8)
        | ((tr >= level).astype(np.uint8) << 1)
        | ((br >= level).astype(np.uint8) << 2)
        | ((bl >= level).astype(np.uint8) << 3)
    )
    live = (idx != 0) & (idx != 15)
    if valid is not None:
        v = valid
        live &= v[:-1, :-1] & v[:-1, 1:] & v[1:, :-1] & v[1:, 1:]
    ys, xs = np.nonzero(live)
    if ys.size == 0:
        return []
    ii = idx[ys, xs]
    vtl, vtr = tl[ys, xs], tr[ys, xs]
    vbl, vbr = bl[ys, xs], br[ys, xs]
    xf, yf = xs.astype(np.float64), ys.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        edges = {
            "t": (xf + 0.5 + (level - vtl) / (vtr - vtl), yf + 0.5),
            "b": (xf + 0.5 + (level - vbl) / (vbr - vbl), yf + 1.5),
            "l": (xf + 0.5, yf + 0.5 + (level - vtl) / (vbl - vtl)),
            "r": (xf + 1.5, yf + 0.5 + (level - vtr) / (vbr - vtr)),
        }
    segs_x1, segs_y1, segs_x2, segs_y2 = [], [], [], []

    def emit(mask, e1, e2):
        if not mask.any():
            return
        segs_x1.append(edges[e1][0][mask]); segs_y1.append(edges[e1][1][mask])
        segs_x2.append(edges[e2][0][mask]); segs_y2.append(edges[e2][1][mask])

    for case, pairs in _MS_CASES.items():
        m = ii == case
        for e1, e2 in pairs:
            emit(m, e1, e2)
    for case in (5, 10):
        m = ii == case
        if not m.any():
            continue
        center = (vtl + vtr + vbl + vbr) / 4.0
        below = center < level
        if case == 5:
            emit(m & below, "l", "t"); emit(m & below, "r", "b")
            emit(m & ~below, "l", "b"); emit(m & ~below, "r", "t")
        else:
            emit(m & below, "t", "r"); emit(m & below, "b", "l")
            emit(m & ~below, "t", "l"); emit(m & ~below, "b", "r")
    x1 = np.concatenate(segs_x1); y1 = np.concatenate(segs_y1)
    x2 = np.concatenate(segs_x2); y2 = np.concatenate(segs_y2)
    return [((a_, b_), (c_, d_)) for a_, b_, c_, d_ in
            zip(x1.tolist(), y1.tolist(), x2.tolist(), y2.tolist())]


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
# clean-collar (nearblack)
# ---------------------------------------------------------------------------


def clean_collar(arr: np.ndarray, *, threshold: float = 0, nodata=0) -> np.ndarray:
    """`gdal raster clean-collar` (apps/gdalalg_raster_clean_collar.cpp /
    nearblack): pixels <= threshold that are EDGE-CONNECTED (4-conn) to the
    image border become nodata; identical dark pixels in the interior are
    untouched. Whole-image op (the collar is defined from the edges);
    iterative numpy dilation, iterations = collar depth."""
    near = arr <= threshold
    collar = np.zeros_like(near)
    collar[0, :] = near[0, :]
    collar[-1, :] = near[-1, :]
    collar[:, 0] |= near[:, 0]
    collar[:, -1] |= near[:, -1]
    while True:
        grown = collar.copy()
        grown[1:, :] |= collar[:-1, :]
        grown[:-1, :] |= collar[1:, :]
        grown[:, 1:] |= collar[:, :-1]
        grown[:, :-1] |= collar[:, 1:]
        grown &= near
        if (grown == collar).all():
            break
        collar = grown
    out = arr.copy()
    out[collar] = nodata
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
# viewshed (R2 ray-march)
# ---------------------------------------------------------------------------


def viewshed(dem: np.ndarray, ox: int, oy: int, *, obs_height: float = 2.0,
             rays_per_cell: float = 2.0) -> np.ndarray:
    """`gdal raster viewshed` (alg/viewshed/) as the standard R2
    approximation: cast dense azimuthal rays from the observer; along each
    ray the elevation ANGLE must exceed the running maximum to be visible
    (np.maximum.accumulate over ray steps — fully vectorized over all rays
    at once). Whole-array op (visibility is a global property of the line
    of sight). Returns a bool visibility mask; the observer cell is True."""
    h, w = dem.shape
    z0 = float(dem[oy, ox]) + obs_height
    max_r = int(np.ceil(np.hypot(max(ox, w - 1 - ox), max(oy, h - 1 - oy)))) + 1
    n_rays = max(16, int(2 * np.pi * max_r * rays_per_cell))
    az = np.linspace(0.0, 2 * np.pi, n_rays, endpoint=False)
    steps = np.arange(1, max_r + 1, dtype=np.float64)
    # (n_rays, n_steps) sample positions
    xs = ox + np.cos(az)[:, None] * steps[None, :]
    ys = oy + np.sin(az)[:, None] * steps[None, :]
    ix = np.round(xs).astype(np.int64)
    iy = np.round(ys).astype(np.int64)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = np.clip(ix, 0, w - 1)
    iyc = np.clip(iy, 0, h - 1)
    z = dem[iyc, ixc].astype(np.float64)
    ang = (z - z0) / steps[None, :]
    # a sample is visible iff its angle >= every PRIOR angle on the ray
    prior = np.full_like(ang, -np.inf)
    prior[:, 1:] = np.maximum.accumulate(ang, axis=1)[:, :-1]
    vis_samples = (ang >= prior) & inside
    out = np.zeros((h, w), dtype=bool)
    out[iy[vis_samples], ix[vis_samples]] = True
    out[oy, ox] = True
    return out


def line_of_sight(dem: np.ndarray, p0, p1, *, h0: float = 2.0,
                  h1: float = 0.0):
    """`gdal raster sight-line` analog (apps/gdalalg_raster_sightline
    lineage): is target p1=(x1,y1) visible from observer p0=(x0,y0)?
    Samples the DEM along the segment (Bresenham-density steps) and checks
    every intermediate elevation angle against the observer->target angle.
    Returns (visible: bool, blocked_at: (x, y) | None — the first sample
    that blocks the line)."""
    x0, y0 = p0
    x1, y1 = p1
    z0 = float(dem[int(y0), int(x0)]) + h0
    z1 = float(dem[int(y1), int(x1)]) + h1
    dist = float(np.hypot(x1 - x0, y1 - y0))
    n = max(int(np.ceil(dist)) * 2, 2)
    t = np.linspace(0.0, 1.0, n + 1)[1:-1]
    xs = np.round(x0 + (x1 - x0) * t).astype(np.int64)
    ys = np.round(y0 + (y1 - y0) * t).astype(np.int64)
    # samples that ROUND onto an endpoint cell are the endpoints
    # themselves, not intermediate terrain — a tall target must not
    # occlude its own sight line
    mid = ~(((xs == int(x0)) & (ys == int(y0)))
            | ((xs == int(x1)) & (ys == int(y1))))
    t, xs, ys = t[mid], xs[mid], ys[mid]
    z = dem[ys, xs].astype(np.float64)
    # angle of each intermediate sample vs the direct observer->target ray
    ray_z = z0 + (z1 - z0) * t
    blocked = z > ray_z
    if not blocked.any():
        return True, None
    i = int(np.argmax(blocked))
    return False, (int(xs[i]), int(ys[i]))


def vertical_shift(arr: np.ndarray, shift, *, scale: float = 1.0) -> np.ndarray:
    """`gdal raster update --vertical-shift` / gdalwarp vshift analog:
    out = arr * scale + shift, where shift is a scalar (constant datum
    offset) or a grid broadcastable to arr (e.g. a resampled geoid grid).
    Per-tile map op — wrap with raster.mapops.tile_calc for the tiled
    table form."""
    return np.asarray(arr, np.float64) * scale + np.asarray(shift, np.float64)


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
