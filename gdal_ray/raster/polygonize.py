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
    """Two-pass union-find CC labeling of equal-valued pixels. Returns int64
    labels (-1 for nodata), labels numbered 0..n-1 in row-major first-pixel
    order (deterministic)."""
    h, w = arr.shape
    labels = np.full((h, w), -1, dtype=np.int64)
    uf = UnionFind()
    next_label = 0
    for y in range(h):
        for x in range(w):
            v = arr[y, x]
            if nodata is not None and v == nodata:
                continue
            cands = []
            if x > 0 and arr[y, x - 1] == v and labels[y, x - 1] >= 0:
                cands.append(labels[y, x - 1])
            if y > 0 and arr[y - 1, x] == v and labels[y - 1, x] >= 0:
                cands.append(labels[y - 1, x])
            if connectivity == 8 and y > 0:
                if x > 0 and arr[y - 1, x - 1] == v and labels[y - 1, x - 1] >= 0:
                    cands.append(labels[y - 1, x - 1])
                if x + 1 < w and arr[y - 1, x + 1] == v and labels[y - 1, x + 1] >= 0:
                    cands.append(labels[y - 1, x + 1])
            if not cands:
                labels[y, x] = next_label
                next_label += 1
            else:
                m = min(cands)
                labels[y, x] = m
                for c in cands:
                    uf.union(m, c)
    # resolve + renumber in first-appearance order
    remap: dict = {}
    out = labels
    flat = out.ravel()
    for i in range(flat.size):
        if flat[i] >= 0:
            r = uf.find(int(flat[i]))
            if r not in remap:
                remap[r] = len(remap)
            flat[i] = remap[r]
    return out


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
    return [_simplify_collinear(r) for r in rings]


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
    nlab = labels.max() + 1
    g0, g1, g2, g3, g4, g5 = geotransform
    out = []
    for lab in range(nlab):
        ys, xs = np.nonzero(labels == lab)
        value = arr[ys[0], xs[0]]
        rings = stitch_rings(_boundary_edges(labels, lab), connectivity)
        # exterior = largest absolute area, first
        rings.sort(key=lambda r: -abs(_ring_area2(r)))
        geo_rings = [
            np.array([(g0 + x * g1 + y * g2, g3 + x * g4 + y * g5) for x, y in r])
            for r in rings
        ]
        out.append((value, geo_rings))
    return out
