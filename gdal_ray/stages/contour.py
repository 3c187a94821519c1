"""Distributed contour over the tile table + iso-band polygons.

Reference: alg/contour.cpp:569 (iso-lines AND iso-polygons, any raster
size via its segmentizer/merger). Ray restatement:

* contour_tiles_ds — iso-LINES at any raster size: each 2x2 sample cell
  is owned by the tile holding its top-left sample; tiles post a 1-px
  strip to their left/up neighbors so every owned cell is computable
  locally. Per-tile marching squares + local polyline stitch, then a
  cross-tile merge in the polygonize shape: shared endpoints (always on
  tile seams) -> equivalence pairs -> union-find over pairs only ->
  per-component polyline join.
* contour_band_polygons — iso-POLYGONS between consecutive levels,
  computed by classifying pixels into bands and running the distributed
  polygonize. Band boundaries are at pixel resolution (the reference
  interpolates sub-pixel crossings); areas exactly conserve pixel counts,
  which is what the zonal/area consumers here need. Documented scope
  difference.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.raster.analysis import contour_segments, stitch_polylines
from gdal_ray.raster.polygonize import UnionFind

TILE = 256


def _endpoint_key(p, level_i: int) -> str:
    return f"{level_i}:{round(p[0], 6)}:{round(p[1], 6)}"


def contour_tiles_ds(tiles_ds, levels, *, dtype=np.float32):
    """tiles_ds rows (tile_x, tile_y, data[TILE*TILE dtype]) -> list of
    (level, polyline ndarray in GLOBAL pixel coords)."""
    import ray

    levels = [float(lv) for lv in levels]

    def fan(t: pa.Table) -> pa.Table:
        rows = {"t_x": [], "t_y": [], "role": [], "data": []}
        for tx, ty, buf in zip(t["tile_x"].to_pylist(), t["tile_y"].to_pylist(),
                               t["data"].to_pylist()):
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
            rows["t_x"].append(tx); rows["t_y"].append(ty)
            rows["role"].append("self"); rows["data"].append(buf)
            # cells at this tile's left/top seam belong to the NEIGHBOR
            # (owner = tile of the top-left sample) -> post first col/row
            posts = {(-1, 0): arr[:, :1], (0, -1): arr[:1, :], (-1, -1): arr[:1, :1]}
            for (dx, dy), strip in posts.items():
                rows["t_x"].append(tx + dx); rows["t_y"].append(ty + dy)
                rows["role"].append(f"n_{-dx}_{-dy}")
                rows["data"].append(np.ascontiguousarray(strip).tobytes())
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    fanned = tiles_ds.map_batches(fan, batch_format="pyarrow", batch_size=None)

    def lines_per_tile(g: pd.DataFrame) -> pd.DataFrame:
        sel = g[g["role"] == "self"]
        if len(sel) == 0:
            return pd.DataFrame({c: [] for c in
                                 ("level_i", "pts", "k0", "k1")})
        tx, ty = int(sel["t_x"].iloc[0]), int(sel["t_y"].iloc[0])
        pad = np.zeros((TILE + 1, TILE + 1), np.float64)
        have = np.zeros((TILE + 1, TILE + 1), bool)
        pad[:TILE, :TILE] = np.frombuffer(sel["data"].iloc[0], dtype=dtype).reshape(TILE, TILE)
        have[:TILE, :TILE] = True
        for _, row in g[g["role"] != "self"].iterrows():
            dx, dy = (int(v) for v in row["role"].split("_")[1:])
            strip = np.frombuffer(row["data"], dtype=dtype)
            if (dx, dy) == (1, 0):
                pad[:TILE, TILE] = strip; have[:TILE, TILE] = True
            elif (dx, dy) == (0, 1):
                pad[TILE, :TILE] = strip; have[TILE, :TILE] = True
            else:
                pad[TILE, TILE] = strip[0]; have[TILE, TILE] = True
        ox, oy = tx * TILE, ty * TILE
        out = {"level_i": [], "pts": [], "k0": [], "k1": []}
        for li, lv in enumerate(levels):
            segs = contour_segments(pad, lv, valid=have)
            for line in stitch_polylines(segs):
                line = line + np.array([ox, oy], np.float64)
                out["level_i"].append(li)
                out["pts"].append(json.dumps(line.tolist()))
                out["k0"].append(_endpoint_key(line[0], li))
                out["k1"].append(_endpoint_key(line[-1], li))
        return pd.DataFrame(out)

    lines = fanned.groupby(["t_x", "t_y"]).map_groups(
        lines_per_tile, batch_format="pandas"
    ).materialize()

    # --- cross-tile merge: endpoint-shared polylines union into one ----
    # line ids: (block-stable) global enumeration via collected endpoints
    rows = pa.concat_tables(
        list(lines.iter_batches(batch_size=None, batch_format="pyarrow"))
        or [pa.table({"level_i": pa.array([], pa.int64()),
                      "pts": pa.array([], pa.string()),
                      "k0": pa.array([], pa.string()),
                      "k1": pa.array([], pa.string())})]
    )
    n = rows.num_rows
    uf = UnionFind()
    by_key: dict = {}
    k0 = rows["k0"].to_pylist()
    k1 = rows["k1"].to_pylist()
    for i in range(n):
        for k in (k0[i], k1[i]):
            j = by_key.get(k)
            if j is None:
                by_key[k] = i
            else:
                uf.union(i, j)
    comps: dict = {}
    for i in range(n):
        comps.setdefault(uf.find(i), []).append(i)
    levels_arr = rows["level_i"].to_pylist()
    pts = rows["pts"].to_pylist()
    out = []
    for members in comps.values():
        polylines = [np.array(json.loads(pts[i]), np.float64) for i in members]
        merged = _join_polylines(polylines)
        lv = levels[levels_arr[members[0]]]
        for line in merged:
            out.append((lv, line))
    return out


def _join_polylines(polylines: list[np.ndarray]) -> list[np.ndarray]:
    """Greedy endpoint-matching join of polylines into maximal chains
    (same contract as stitch_polylines, at polyline granularity)."""
    def key(p):
        return (round(float(p[0]), 6), round(float(p[1]), 6))

    from collections import defaultdict

    adj = defaultdict(list)
    for i, line in enumerate(polylines):
        adj[key(line[0])].append((i, True))
        adj[key(line[-1])].append((i, False))
    used = [False] * len(polylines)
    out = []
    for start in range(len(polylines)):
        if used[start]:
            continue
        used[start] = True
        chain = polylines[start]
        while True:
            nxt = [(i, fwd) for i, fwd in adj[key(chain[-1])] if not used[i]]
            if not nxt:
                break
            i, fwd = nxt[0]
            used[i] = True
            seg = polylines[i] if fwd else polylines[i][::-1]
            chain = np.vstack([chain, seg[1:]])
        while True:
            nxt = [(i, fwd) for i, fwd in adj[key(chain[0])] if not used[i]]
            if not nxt:
                break
            i, fwd = nxt[0]
            used[i] = True
            seg = polylines[i][::-1] if fwd else polylines[i]
            chain = np.vstack([seg[:-1], chain])
        out.append(chain)
    return out


def contour_band_polygons(tiles_ds, levels, *, dtype=np.float32, nodata=None):
    """Iso-band POLYGONS: pixels classify into band b = #levels <= value
    (np.digitize), the banded raster polygonizes with the distributed
    cross-tile merge. Returns [(band_index, rings)] where band b covers
    levels[b-1] <= value < levels[b] (b=0 below the first level). Pixel-
    resolution boundaries (documented vs the reference's interpolation)."""
    from gdal_ray.raster.mapops import tile_calc
    from gdal_ray.stages.raster import polygonize_tiles_ds

    levels = sorted(float(lv) for lv in levels)

    def classify(arr):
        bands = np.digitize(arr.astype(np.float64), levels).astype(np.uint32)
        if nodata is not None:
            bands = np.where(arr == nodata, np.uint32(len(levels) + 1), bands)
        return bands

    banded = tile_calc(tiles_ds, classify, dtype=dtype, out_dtype=np.uint32)
    nd = (len(levels) + 1) if nodata is not None else None
    return polygonize_tiles_ds(banded, connectivity=4, nodata=nd, dtype=np.uint32)
