"""Polygonize (raster -> polygons): connected-component labeling + ring
tracing, from scratch.

Reference semantics (alg/polygonize.cpp:73-227, enumerator
alg/gdalrasterpolygonenumerator.cpp:104, ring builder
alg/polygonize_polygonizer.cpp): two-pass connected-component labeling over
equal pixel values, 4- or 8-connected, then per-polygon ring tracing along
pixel edges; output rings run along pixel corners, transformed by the
geotransform; holes are interior rings.

Geometric output is compared set-wise (normalized rings) in tests — vertex
start/order parity with the reference's tracer is not claimed.

Distributed version: per-tile labeling inside map_batches, cross-tile label
union via shared-border equivalence pairs (a groupby on the border key),
union-find on the (small) pair set, broadcast relabel, then per-component
ring stitching in map_groups — SURVEY.md §2.9's cross-tile merge design.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def label_array(arr: np.ndarray, connectivity: int = 4, nodata=None) -> np.ndarray:
    """Connected-component labeling of equal-valued pixels, vectorized:
    per-row RUNS get ids in one cumsum, runs merge across rows via a
    union-find over the (small) run adjacency pairs. Returns int64 labels
    (-1 for nodata), numbered 0..n-1 in row-major first-pixel order."""
    h, w = arr.shape
    valid = np.ones((h, w), dtype=bool) if nodata is None else (arr != nodata)
    # run starts: first column, value change, or validity change
    new_run = np.ones((h, w), dtype=bool)
    new_run[:, 1:] = (arr[:, 1:] != arr[:, :-1]) | (valid[:, 1:] != valid[:, :-1])
    run_id = (np.cumsum(new_run.ravel()) - 1).reshape(h, w)
    n_runs = int(run_id[-1, -1]) + 1

    parent = np.arange(n_runs, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    # vertical adjacencies (and diagonals for 8-conn): vectorized pair lists
    pair_sets = [((slice(None, -1), slice(None)), (slice(1, None), slice(None)))]
    if connectivity == 8:
        pair_sets.append(((slice(None, -1), slice(None, -1)), (slice(1, None), slice(1, None))))
        pair_sets.append(((slice(None, -1), slice(1, None)), (slice(1, None), slice(None, -1))))
    for sa, sb in pair_sets:
        m = (arr[sa] == arr[sb]) & valid[sa] & valid[sb]
        pairs = np.unique(
            np.stack([run_id[sa][m], run_id[sb][m]], axis=1), axis=0
        )
        for a, b in pairs:
            union(int(a), int(b))

    roots = np.array([find(i) for i in range(n_runs)], dtype=np.int64)
    # renumber roots in row-major first-appearance order of their runs
    order = np.full(n_runs, -1, dtype=np.int64)
    nxt = 0
    flat_valid_any = np.zeros(n_runs, dtype=bool)
    np.logical_or.at(flat_valid_any, run_id.ravel(), valid.ravel())
    for rid in range(n_runs):
        r = roots[rid]
        if flat_valid_any[rid] and order[r] < 0:
            order[r] = nxt
            nxt += 1
    labels = order[roots[run_id]]
    labels[~valid] = -1
    return labels


def _boundary_edges_all(labels: np.ndarray):
    """Directed boundary unit-edges for EVERY label in one vectorized pass.
    Returns (lab, ax, ay, bx, by) int64 arrays (interior-on-left convention,
    same as _boundary_edges)."""
    h, w = labels.shape
    valid = labels >= 0
    pads = np.full((h, w), -2, dtype=np.int64)

    def neighbor(dy, dx):
        """out[y, x] = labels[y + dy, x + dx] (out-of-range -> -2)."""
        out = pads.copy()
        ys_dst = slice(max(0, -dy), h - max(0, dy))
        xs_dst = slice(max(0, -dx), w - max(0, dx))
        ys_src = slice(max(0, dy), h - max(0, -dy))
        xs_src = slice(max(0, dx), w - max(0, -dx))
        out[ys_dst, xs_dst] = labels[ys_src, xs_src]
        return out

    labs, axs, ays, bxs, bys = [], [], [], [], []
    specs = [
        ((-1, 0), lambda x, y: (x + 1, y, x, y)),          # top side
        ((1, 0), lambda x, y: (x, y + 1, x + 1, y + 1)),   # bottom side
        ((0, -1), lambda x, y: (x, y, x, y + 1)),          # left side
        ((0, 1), lambda x, y: (x + 1, y + 1, x + 1, y)),   # right side
    ]
    for (dy, dx), mk in specs:
        m = valid & (neighbor(dy, dx) != labels)
        ys, xs = np.nonzero(m)
        ax, ay, bx, by = mk(xs, ys)
        labs.append(labels[ys, xs])
        axs.append(ax); ays.append(ay); bxs.append(bx); bys.append(by)
    return (
        np.concatenate(labs), np.concatenate(axs), np.concatenate(ays),
        np.concatenate(bxs), np.concatenate(bys),
    )


def _boundary_edges(labels: np.ndarray, target: int):
    """Directed boundary unit-edges of one label, interior-on-left
    (y-down grid): top (x+1,y)->(x,y); bottom (x,y+1)->(x+1,y+1);
    left (x,y)->(x,y+1); right (x+1,y+1)->(x+1,y)."""
    h, w = labels.shape
    inside = labels == target
    up = np.zeros_like(inside)
    up[1:, :] = inside[:-1, :]
    down = np.zeros_like(inside)
    down[:-1, :] = inside[1:, :]
    left = np.zeros_like(inside)
    left[:, 1:] = inside[:, :-1]
    right = np.zeros_like(inside)
    right[:, :-1] = inside[:, 1:]
    edges = []
    ys, xs = np.nonzero(inside & ~up)
    edges += [((x + 1, y), (x, y)) for x, y in zip(xs, ys)]
    ys, xs = np.nonzero(inside & ~down)
    edges += [((x, y + 1), (x + 1, y + 1)) for x, y in zip(xs, ys)]
    ys, xs = np.nonzero(inside & ~left)
    edges += [((x, y), (x, y + 1)) for x, y in zip(xs, ys)]
    ys, xs = np.nonzero(inside & ~right)
    edges += [((x + 1, y + 1), (x + 1, y)) for x, y in zip(xs, ys)]
    return edges


def stitch_rings(edges, connectivity: int = 4):
    """Walk directed edges into closed rings. At a 4-way corner (two
    outgoing edges), 4-connectivity takes the LEFT turn (keeps diagonal
    regions separate), 8-connectivity the RIGHT turn (joins through the
    corner)."""
    from collections import defaultdict

    out_edges = defaultdict(list)
    for a, b in edges:
        out_edges[a].append(b)
    for v in out_edges.values():
        v.sort()
    rings = []
    used = set()
    for a, b in sorted(edges):
        if (a, b) in used:
            continue
        ring = [a]
        cur, prev = b, a
        used.add((a, b))
        while cur != ring[0]:
            ring.append(cur)
            outs = [o for o in out_edges[cur] if (cur, o) not in used]
            if not outs:
                break
            if len(outs) == 1:
                nxt = outs[0]
            else:
                # corner with two choices: order candidates by turn direction
                din = (cur[0] - prev[0], cur[1] - prev[1])

                def turn(o):
                    dout = (o[0] - cur[0], o[1] - cur[1])
                    # cross product in y-down coords: >0 = right turn
                    return din[0] * dout[1] - din[1] * dout[0]

                outs.sort(key=turn, reverse=(connectivity == 8))
                nxt = outs[0]
            used.add((cur, nxt))
            prev, cur = cur, nxt
        rings.append(ring)
    out = [_simplify_collinear(r) for r in rings]
    return [r for r in out if len(r) >= 4]  # drop degenerate zero-area walks


def _simplify_collinear(ring):
    """Drop intermediate collinear vertices; close the ring."""
    if len(ring) < 3:
        return ring
    out = []
    n = len(ring)
    for i in range(n):
        p0, p1, p2 = ring[i - 1], ring[i], ring[(i + 1) % n]
        cross = (p1[0] - p0[0]) * (p2[1] - p1[1]) - (p1[1] - p0[1]) * (p2[0] - p1[0])
        if cross != 0:
            out.append(p1)
    if not out:  # fully degenerate (zero-area back-and-forth walk)
        return []
    out.append(out[0])
    return out


def _ring_area2(ring) -> float:
    s = 0.0
    for i in range(len(ring) - 1):
        s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return s


def polygonize(arr: np.ndarray, connectivity: int = 4, nodata=None,
               geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """-> list of (pixel_value, rings) where rings[0] is the exterior and
    the rest are holes, coordinates in geo space."""
    labels = label_array(arr, connectivity=connectivity, nodata=nodata)
    nlab = int(labels.max()) + 1
    g0, g1, g2, g3, g4, g5 = geotransform
    # first-pixel value per label: reverse scatter keeps the FIRST index
    flat = labels.ravel()
    vals = arr.ravel()
    m = flat >= 0
    idxs = np.arange(flat.size)[m][::-1]
    lab_of = flat[m][::-1]
    first_idx = np.zeros(nlab, dtype=np.int64)
    first_idx[lab_of] = idxs
    el, ax, ay, bx, by = _boundary_edges_all(labels)
    order = np.argsort(el, kind="stable")
    el, ax, ay, bx, by = el[order], ax[order], ay[order], bx[order], by[order]
    bounds = np.searchsorted(el, np.arange(nlab + 1))
    out = []
    for lab in range(nlab):
        lo, hi = bounds[lab], bounds[lab + 1]
        edges = [
            ((int(ax[i]), int(ay[i])), (int(bx[i]), int(by[i]))) for i in range(lo, hi)
        ]
        rings = stitch_rings(edges, connectivity)
        rings.sort(key=lambda r: -abs(_ring_area2(r)))
        geo_rings = [
            np.array([(g0 + x * g1 + y * g2, g3 + x * g4 + y * g5) for x, y in r])
            for r in rings
        ]
        out.append((vals[first_idx[lab]], geo_rings))
    return out
