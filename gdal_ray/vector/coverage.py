"""Coverage-safe polygon simplification — `gdal vector simplify-coverage`
(apps/gdalalg_vector_simplify_coverage.cpp, backed by GEOS
CoverageSimplifier). Topology contract: polygons that share a boundary
keep IDENTICAL shared boundaries after simplification (no slivers, no
gaps), unlike per-feature Douglas-Peucker.

Algorithm (the standard arc-based approach):
  1. decompose every ring into edges; quantize vertices so shared
     boundaries key identically across features
  2. NODE detection: vertices whose incident-vertex degree != 2 (ring
     junctions where >= 3 arcs meet)
  3. split rings into ARCS at nodes; an arc's identity is its full vertex
     chain (direction-normalized), so a shared boundary is ONE arc
     referenced by both features
  4. Douglas-Peucker each unique arc ONCE (endpoints pinned)
  5. rebuild every ring from its simplified arcs (reversed where needed)

The whole-layer pass is inherently global (same as the reference); at
scale, partition by connected component of the feature-adjacency graph
first.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from gdal_ray.vector.geomfuncs import simplify_dp

_Q = 1e9  # vertex quantizer: 1e-9 units


def _vkey(p) -> tuple[int, int]:
    return (int(round(float(p[0]) * _Q)), int(round(float(p[1]) * _Q)))


def _coords(seq) -> np.ndarray:
    return np.array([(k[0] / _Q, k[1] / _Q) for k in seq], np.float64)


def simplify_coverage_rings(rings: list[np.ndarray], tolerance: float) -> list[np.ndarray]:
    """rings: closed coordinate rings (shared boundaries must share
    vertices — the coverage premise). Returns simplified rings in input
    order; shared arcs are simplified identically on both sides."""
    deg: dict = defaultdict(set)
    ring_keys = []
    for ring in rings:
        keys = [_vkey(p) for p in ring[:-1]]
        ring_keys.append(keys)
        n = len(keys)
        for i in range(n):
            a, b = keys[i], keys[(i + 1) % n]
            deg[a].add(b)
            deg[b].add(a)
    nodes = {v for v, nb in deg.items() if len(nb) != 2}

    arcs: dict = {}       # canonical vertex-chain tuple -> coords
    ring_arcs: list = []  # per ring: [(canonical, forward)]
    for keys in ring_keys:
        n = len(keys)
        node_pos = [i for i in range(n) if keys[i] in nodes]
        refs = []
        if not node_pos:
            # node-free ring: one closed arc, rotation+direction normalized
            start = int(min(range(n), key=lambda i: keys[i]))
            fwd = keys[start:] + keys[:start] + [keys[start]]
            rev = list(reversed(fwd))
            canonical = min(tuple(fwd), tuple(rev))
            if canonical not in arcs:
                arcs[canonical] = _coords(canonical)
            refs.append((canonical, tuple(fwd) == canonical))
        else:
            m = len(node_pos)
            for j in range(m):
                i0, i1 = node_pos[j], node_pos[(j + 1) % m]
                seq = []
                i = i0
                while True:
                    seq.append(keys[i])
                    if i == i1 and len(seq) > 1:
                        break
                    i = (i + 1) % n
                tup, rtup = tuple(seq), tuple(reversed(seq))
                canonical = min(tup, rtup)
                if canonical not in arcs:
                    arcs[canonical] = _coords(canonical)
                refs.append((canonical, tup == canonical))
        ring_arcs.append(refs)

    simplified = {
        key: (coords if len(coords) <= 2 else simplify_dp(coords, tolerance))
        for key, coords in arcs.items()
    }

    out = []
    for refs in ring_arcs:
        parts = []
        for key, forward in refs:
            seg = simplified[key]
            if not forward:
                seg = seg[::-1]
            if parts:
                seg = seg[1:]
            parts.append(seg)
        ring = np.vstack(parts)
        if not np.allclose(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(ring)
    return out
