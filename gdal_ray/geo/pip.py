"""Point-in-polygon + packed STRtree, from scratch, vectorized.

Replicates the reference join strategy for OGRLayer::Intersection-style
spatial joins (ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-5800): envelope
(bbox) prefilter via a static packed R-tree (the FlatGeobuf packed Hilbert
R-tree precedent, ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:93-146) followed
by the exact geometry test (prepared-geometry Intersects pretest ->
ray-casting PIP here).

STRtree bulk queries are breadth-first over (query, node) pair arrays —
every level is one vectorized numpy step, no per-point Python loop.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo import wkb as W

NODE_CAP = 10


class STRtree:
    """Packed Sort-Tile-Recursive R-tree over rectangles."""

    def __init__(self, boxes: np.ndarray):
        """boxes: (n, 4) [minx, miny, maxx, maxy]."""
        n = len(boxes)
        self.n = n
        if n == 0:
            self.levels = []
            return
        # STR packing: sort by x-center, slice into vertical strips, sort each
        # strip by y-center
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        nslices = max(1, int(np.ceil(np.sqrt(np.ceil(n / NODE_CAP)))))
        order = np.lexsort((cy, cx))
        strip = np.ceil(n / nslices)
        strip_id = (np.arange(n) // strip).astype(np.int64)
        order = order[np.lexsort((cy[order], strip_id))]
        self.leaf_order = order  # position -> original box index
        sorted_boxes = boxes[order]

        self.levels = []  # each: (m, 4) node boxes; level 0 = leaf groups
        cur = sorted_boxes
        self.fanout = NODE_CAP
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / NODE_CAP))
            pad = m * NODE_CAP - len(cur)
            if pad:
                cur = np.vstack([cur, np.tile([np.inf, np.inf, -np.inf, -np.inf], (pad, 1))])
            g = cur.reshape(m, NODE_CAP, 4)
            nodes = np.column_stack(
                [g[:, :, 0].min(1), g[:, :, 1].min(1), g[:, :, 2].max(1), g[:, :, 3].max(1)]
            )
            self.levels.append(cur)  # children of this level's nodes
            cur = nodes
        self.root = cur  # (1, 4)
        self.boxes_sorted = sorted_boxes

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Bulk query: which leaf boxes contain each point.
        Returns (point_idx, box_idx) int64 arrays (original box indices)."""
        nq = len(px)
        if self.n == 0 or nq == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        qi = np.arange(nq, dtype=np.int64)
        b = self.root[0]
        hit = (px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3])
        pairs_q = qi[hit]
        pairs_n = np.zeros(pairs_q.size, dtype=np.int64)  # node index at current level
        for level in range(len(self.levels) - 1, -1, -1):
            children = self.levels[level]  # (n_children_total_padded, 4)
            # expand each (q, node) to its NODE_CAP children
            child_idx = (pairs_n[:, None] * NODE_CAP + np.arange(NODE_CAP)[None, :]).ravel()
            q_rep = np.repeat(pairs_q, NODE_CAP)
            valid = child_idx < len(children)
            child_idx, q_rep = child_idx[valid], q_rep[valid]
            cb = children[child_idx]
            inside = (
                (px[q_rep] >= cb[:, 0])
                & (px[q_rep] <= cb[:, 2])
                & (py[q_rep] >= cb[:, 1])
                & (py[q_rep] <= cb[:, 3])
            )
            pairs_q, pairs_n = q_rep[inside], child_idx[inside]
        # pairs_n are positions in sorted leaf order (padding rows never match)
        return pairs_q, self.leaf_order[pairs_n]


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting of many points vs one ring."""
    inside = np.zeros(len(px), dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(len(x0)):
        crosses = (y0[i] > py) != (y1[i] > py)
        if not crosses.any():
            continue
        xint = (x1[i] - x0[i]) * (py - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= crosses & (px < xint)
    return inside


def point_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over all rings (holes flip parity automatically)."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= point_in_ring(px, py, ring)
    return inside


class GridIndex:
    """Uniform grid-bucket index over rectangles (CSR layout) — the
    vectorized analog of the reference's CPLQuadTree point/box index
    (port/cpl_quad_tree.cpp, used by gridding alg/gdalgrid.cpp:261-277).

    Beats the STRtree for bulk point queries when box bboxes overlap
    heavily (measured: 100k points vs 370 overlapping diamonds went
    11.5s -> ms): each point reads exactly one cell's candidate list."""

    def __init__(self, boxes: np.ndarray, target_per_cell: float = 2.0):
        self.n = len(boxes)
        if self.n == 0:
            return
        self.minx = boxes[:, 0].min()
        self.miny = boxes[:, 1].min()
        self.maxx = boxes[:, 2].max()
        self.maxy = boxes[:, 3].max()
        side = max(8, min(512, int(np.sqrt(self.n / target_per_cell) * 4)))
        self.nx = self.ny = side
        self.sx = (self.maxx - self.minx) / side or 1.0
        self.sy = (self.maxy - self.miny) / side or 1.0
        ix0 = np.clip(((boxes[:, 0] - self.minx) / self.sx).astype(np.int64), 0, side - 1)
        ix1 = np.clip(((boxes[:, 2] - self.minx) / self.sx).astype(np.int64), 0, side - 1)
        iy0 = np.clip(((boxes[:, 1] - self.miny) / self.sy).astype(np.int64), 0, side - 1)
        iy1 = np.clip(((boxes[:, 3] - self.miny) / self.sy).astype(np.int64), 0, side - 1)
        cell_ids, box_ids = [], []
        for b in range(self.n):
            xs = np.arange(ix0[b], ix1[b] + 1)
            ys = np.arange(iy0[b], iy1[b] + 1)
            cells = (xs[:, None] * side + ys[None, :]).ravel()
            cell_ids.append(cells)
            box_ids.append(np.full(cells.size, b, dtype=np.int64))
        cell_ids = np.concatenate(cell_ids)
        box_ids = np.concatenate(box_ids)
        order = np.argsort(cell_ids, kind="stable")
        self.cell_sorted = cell_ids[order]
        self.box_sorted = box_ids[order]
        self.boxes = boxes

    def query_points(self, px: np.ndarray, py: np.ndarray):
        if self.n == 0 or len(px) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ix = np.clip(((px - self.minx) / self.sx).astype(np.int64), 0, self.nx - 1)
        iy = np.clip(((py - self.miny) / self.sy).astype(np.int64), 0, self.ny - 1)
        inb = (px >= self.minx) & (px <= self.maxx) & (py >= self.miny) & (py <= self.maxy)
        cell = ix * self.nx + iy
        lo = np.searchsorted(self.cell_sorted, cell, side="left")
        hi = np.searchsorted(self.cell_sorted, cell, side="right")
        counts = np.where(inb, hi - lo, 0)
        qi = np.repeat(np.arange(len(px), dtype=np.int64), counts)
        # gather candidate box ids: offsets within each point's slice
        starts = np.repeat(lo, counts)
        offs = np.arange(qi.size, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        bi = self.box_sorted[starts + offs]
        b = self.boxes[bi]
        keep = (px[qi] >= b[:, 0]) & (px[qi] <= b[:, 2]) & (py[qi] >= b[:, 1]) & (py[qi] <= b[:, 3])
        return qi[keep], bi[keep]


class PolygonSet:
    """A small broadcastable polygon collection with bbox index + exact PIP.

    Built once per actor from a WKB polygon table (the broadcast-method-layer
    pattern, ogrlayer.cpp:5323-5325)."""

    def __init__(self, wkb_list: list[bytes]):
        self.polys: list[list[np.ndarray]] = []
        boxes = []
        for buf in wkb_list:
            kind, data = W.parse_wkb(buf)
            if kind == "polygon":
                rings = data
            elif kind == "multipolygon":
                rings = [r for _, rs in data for r in rs]
            else:
                raise ValueError(f"PolygonSet expects polygons, got {kind}")
            self.polys.append(rings)
            allpts = np.vstack(rings)
            boxes.append(
                [allpts[:, 0].min(), allpts[:, 1].min(), allpts[:, 0].max(), allpts[:, 1].max()]
            )
        self.boxes = np.array(boxes) if boxes else np.zeros((0, 4))
        self.tree = GridIndex(self.boxes)

    def locate(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, polygon_idx) for every exact containment pair."""
        qi, bi = self.tree.query_points(px, py)
        if qi.size == 0:
            return qi, bi
        keep = np.zeros(qi.size, dtype=bool)
        order = np.argsort(bi, kind="stable")
        qi, bi = qi[order], bi[order]
        bounds = np.searchsorted(bi, np.arange(len(self.polys) + 1))
        for p in range(len(self.polys)):
            lo, hi = bounds[p], bounds[p + 1]
            if lo == hi:
                continue
            sel = slice(lo, hi)
            keep[sel] = point_in_polygon(px[qi[sel]], py[qi[sel]], self.polys[p])
        return qi[keep], bi[keep]
