"""Distributed raster stages over the tile table model (SURVEY.md §1.2:
a raster = a Dataset of (zoom, tile_x, tile_y, band, data) rows; a GDAL
block IS one row).

* rasterize shuffle: features/points flat-map to covering tiles ->
  groupby(tile).map_groups(burn) — gdal_rasterize's chunked burning
  (alg/gdalrasterize.cpp:1160-1204) re-keyed by tile instead of Y-strip.
* overview reduce: tile (z-1,x,y) from up to 4 tiles of z
  (apps/gdalalg_raster_tile.cpp:1576-1696) as groupby(parent).map_groups.
* distributed polygonize: per-tile labeling -> cross-tile label union via
  shared-border equivalence pairs -> broadcast union-find relabel ->
  per-component ring stitch with opposite-edge cancellation (tile-interior
  borders vanish because both sides emit the same unit edge in opposite
  directions). This is SURVEY §2.9's cross-tile merge, two shuffle rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.util import pd_to_arrow as _pd2pa
import pyarrow.compute as pc

from gdal_ray.geo import webmercator as wm
from gdal_ray.raster.checksum import checksum as _checksum
from gdal_ray.raster.polygonize import UnionFind, label_array, stitch_rings
from gdal_ray.raster.rasterize import rasterize as _rasterize

TILE = wm.TILE_SIZE


def points_to_tile_counts(ds, zoom: int, *, lon_col="lon", lat_col="lat"):
    """Point density raster: per-batch sparse (tile, pixel) partial counts,
    then one dense uint32 tile per (x, y) — the north-star burn-in for page
    points. Shuffle rows are (tile_x, tile_y, pixel_idx, n), never points."""

    def partial(t: pa.Table) -> pa.Table:
        lon = np.asarray(t[lon_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        lat = np.asarray(t[lat_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        px, py = wm.lonlat_to_pixel(lon, lat, zoom)
        gx = np.clip(px.astype(np.int64), 0, (1 << zoom) * TILE - 1)
        gy = np.clip(py.astype(np.int64), 0, (1 << zoom) * TILE - 1)
        tx, ty = gx // TILE, gy // TILE
        pix = (gy % TILE) * TILE + (gx % TILE)
        df = pd.DataFrame({"tile_x": tx, "tile_y": ty, "pix": pix})
        g = df.groupby(["tile_x", "tile_y", "pix"], sort=False).size().reset_index(name="n")
        return _pd2pa(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    # hash-partitioned densify: tiles hash into P partitions (one narrow
    # int64 shuffle key) and each partition densifies ALL its tiles with a
    # sorted boundary scan — per-tile map_groups was one pandas slice per
    # tile, seconds of overhead at thousands of tiles
    from gdal_ray.util import default_num_parts
    P = default_num_parts()

    def add_part(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].to_numpy(zero_copy_only=False)
        ty = t["tile_y"].to_numpy(zero_copy_only=False)
        part = ((tx * 73856093) ^ (ty * 19349663)) % P
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def densify_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tile_x", "tile_y"], kind="mergesort").reset_index(drop=True)
        tx = g["tile_x"].to_numpy()
        ty = g["tile_y"].to_numpy()
        pix = g["pix"].to_numpy()
        n = g["n"].to_numpy().astype(np.uint32)
        key_change = np.nonzero((tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1]))[0] + 1
        bounds = np.concatenate([[0], key_change, [len(g)]])
        rows = {"zoom": [], "tile_x": [], "tile_y": [], "data": [],
                "n_points": [], "checksum": []}
        for s, e in zip(bounds[:-1], bounds[1:]):
            arr = np.zeros(TILE * TILE, dtype=np.uint32)
            np.add.at(arr, pix[s:e], n[s:e])
            rows["zoom"].append(zoom)
            rows["tile_x"].append(int(tx[s]))
            rows["tile_y"].append(int(ty[s]))
            rows["data"].append(arr.tobytes())
            rows["n_points"].append(int(n[s:e].sum()))
            rows["checksum"].append(_checksum(arr.reshape(TILE, TILE)))
        return pd.DataFrame(rows)

    return (
        partials.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part").map_groups(densify_partition, batch_format="pandas")
    )


def encode_tiles_png(tiles_ds, *, dtype=np.uint32, mode: str = "gray16"):
    """Encode raw tile arrays to PNG payloads — the reference tile
    pipeline writes encoded images, not raw arrays
    (apps/gdalalg_raster_tile.cpp: PNG/JPEG/WebP per the output-format
    argument; PNG here, via the dependency-free raster/png.py codec).

    mode: 'gray16' clips values to uint16 (lossless for counts < 65536),
    'gray8' clips to uint8. Adds a `png` binary column next to the tile
    keys; deterministic bytes, so goldens pin them."""
    from gdal_ray.raster.png import encode_png

    if mode not in ("gray16", "gray8"):
        raise ValueError("mode must be 'gray16' or 'gray8'")
    out_t = np.uint16 if mode == "gray16" else np.uint8
    lim = 65535 if mode == "gray16" else 255

    def enc(t: pa.Table) -> pa.Table:
        pngs = []
        for buf in t["data"].to_pylist():
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
            pngs.append(encode_png(np.minimum(arr, lim).astype(out_t)))
        keep = [c for c in ("zoom", "tile_x", "tile_y", "checksum")
                if c in t.column_names]
        return t.select(keep).append_column("png", pa.array(pngs, pa.binary()))

    return tiles_ds.map_batches(enc, batch_format="pyarrow", batch_size=None)


def write_tiles_png(tiles_ds, out_dir: str, *, dtype=np.uint32,
                    mode: str = "gray16"):
    """PNG tile sink: encode + write one {out_dir}/{z}/{x}/{y}.png per
    tile (the standard XYZ layout the reference's tile command emits).
    Resumable: existing files are skipped, so a re-run only writes the
    missing tiles. Returns the (z, x, y, n_bytes, skipped) manifest."""
    import os

    enc = encode_tiles_png(tiles_ds, dtype=dtype, mode=mode)

    def write(t: pa.Table) -> pa.Table:
        rows = {"zoom": [], "tile_x": [], "tile_y": [], "n_bytes": [],
                "skipped": []}
        for z, x, y, png in zip(t["zoom"].to_pylist(),
                                t["tile_x"].to_pylist(),
                                t["tile_y"].to_pylist(),
                                t["png"].to_pylist()):
            d = os.path.join(out_dir, str(z), str(x))
            path = os.path.join(d, f"{y}.png")
            skipped = os.path.exists(path)
            if not skipped:
                os.makedirs(d, exist_ok=True)
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(png)
                os.replace(tmp, path)
            rows["zoom"].append(z)
            rows["tile_x"].append(x)
            rows["tile_y"].append(y)
            rows["n_bytes"].append(len(png))
            rows["skipped"].append(skipped)
        return pa.table(rows)

    return enc.map_batches(write, batch_format="pyarrow", batch_size=None)


def encode_tiles_jpeg(tiles_ds, *, dtype=np.uint32, quality: int = 85):
    """JPEG tile payloads (the reference tile pipeline's other encoded
    format, apps/gdalalg_raster_tile.cpp): counts clip to uint8 grayscale
    and encode via the from-scratch baseline codec (raster/jpeg.py).
    Lossy by nature — the raw `data`/`checksum` columns remain the exact
    record; deterministic bytes, so goldens can pin them."""
    from gdal_ray.raster.jpeg import encode_jpeg

    def enc(t: pa.Table) -> pa.Table:
        bufs = []
        for buf in t["data"].to_pylist():
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
            bufs.append(encode_jpeg(np.minimum(arr, 255).astype(np.uint8),
                                    quality=quality))
        keep = [c for c in ("zoom", "tile_x", "tile_y", "checksum")
                if c in t.column_names]
        return t.select(keep).append_column("jpeg",
                                            pa.array(bufs, pa.binary()))

    return tiles_ds.map_batches(enc, batch_format="pyarrow",
                                batch_size=None)


def write_tiles_jpeg(tiles_ds, out_dir: str, *, dtype=np.uint32,
                     quality: int = 85):
    """JPEG XYZ tile sink ({out_dir}/{z}/{x}/{y}.jpg), resumable like
    write_tiles_png (existing files skipped, tmp+rename atomicity)."""
    import os

    enc = encode_tiles_jpeg(tiles_ds, dtype=dtype, quality=quality)

    def write(t: pa.Table) -> pa.Table:
        rows = {"zoom": [], "tile_x": [], "tile_y": [], "n_bytes": [],
                "skipped": []}
        for z, x, y, buf in zip(t["zoom"].to_pylist(),
                                t["tile_x"].to_pylist(),
                                t["tile_y"].to_pylist(),
                                t["jpeg"].to_pylist()):
            d = os.path.join(out_dir, str(z), str(x))
            path = os.path.join(d, f"{y}.jpg")
            skipped = os.path.exists(path)
            if not skipped:
                os.makedirs(d, exist_ok=True)
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(buf)
                os.replace(tmp, path)
            rows["zoom"].append(z)
            rows["tile_x"].append(x)
            rows["tile_y"].append(y)
            rows["n_bytes"].append(len(buf))
            rows["skipped"].append(skipped)
        return pa.table(rows)

    return enc.map_batches(write, batch_format="pyarrow", batch_size=None)


def tile_geotransform(tx: int, ty: int, zoom: int):
    """Affine GT of one 256px tile in lon/lat 'web' pseudo coords (x=lon
    linear; y uses mercator pixel rows — adequate for burn tests)."""
    lon0, lat_min, lon1, lat_max = wm.tile_bounds(tx, ty, zoom)
    res_x = (lon1 - lon0) / TILE
    return (lon0, res_x, 0.0, lat_max, 0.0, -(lat_max - lat_min) / TILE)


def burn_features_to_tiles(ds, zoom: int, *, wkb_col="geometry",
                           burn_col=None, burn_value=1.0, merge="replace",
                           dtype=np.float32, salt: int | None = None):
    """Vector -> tile raster: flat-map each feature to its covering tiles
    (bbox -> tile range), shuffle by tile, burn per group with the exact
    scanline kernel. Output rows: (zoom, tile_x, tile_y, data, checksum).

    salt=k (merge='add' only): HOT-CELL SALTING — features of one tile are
    split over k sub-groups burned independently, then the k partial arrays
    sum in a second reduce (SURVEY §7.4: '(cell, hash%k) then merge'), so a
    tile covered by millions of features never lands in a single straggler
    group. Exact for additive burns."""
    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.steps import _envelope

    def fan_out(t: pa.Table) -> pa.Table:
        """bbox -> tile-range fan, VECTORIZED: one envelope pass (the only
        per-feature step — WKB structure is variable), then batch tile
        math and np.repeat expansion; geometry buffers replicate with an
        Arrow take (no Python list building)."""
        n = len(t)
        vals = (
            t[burn_col].to_numpy(zero_copy_only=False).astype(np.float64)
            if burn_col
            else np.full(n, burn_value, np.float64)
        )
        if n == 0:
            return pa.table({
                "tile_x": pa.array([], pa.int64()),
                "tile_y": pa.array([], pa.int64()),
                "geometry": pa.array([], pa.binary()),
                "burn": pa.array([], pa.float64()),
            })
        env = np.empty((n, 4), np.float64)
        for i, buf in enumerate(t[wkb_col].to_pylist()):
            env[i] = _envelope(W.parse_wkb(buf))
        tx0, ty1 = wm.lonlat_to_tile(env[:, 0], env[:, 1], zoom)
        tx1, ty0 = wm.lonlat_to_tile(env[:, 2], env[:, 3], zoom)
        tx0 = np.asarray(tx0, np.int64)
        tx1 = np.asarray(tx1, np.int64)
        ty0 = np.asarray(ty0, np.int64)
        ty1 = np.asarray(ty1, np.int64)
        w = tx1 - tx0 + 1
        h = ty1 - ty0 + 1
        cnt = w * h
        total = int(cnt.sum())
        fidx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        k = np.arange(total, dtype=np.int64) - np.repeat(start, cnt)
        wrep = np.repeat(w, cnt)
        geom = t[wkb_col].take(pa.array(fidx))
        geom = geom.combine_chunks() if isinstance(geom, pa.ChunkedArray) else geom
        return pa.table(
            {
                "tile_x": pa.array(np.repeat(tx0, cnt) + k % wrep),
                "tile_y": pa.array(np.repeat(ty0, cnt) + k // wrep),
                "geometry": geom,
                "burn": pa.array(vals[fidx]),
            }
        )

    fanned = ds.map_batches(fan_out, batch_format="pyarrow", batch_size=None)

    def burn(g: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(g["tile_x"].iloc[0]), int(g["tile_y"].iloc[0])
        gt = tile_geotransform(tx, ty, zoom)
        # burn in float64 when salted so partial sums merge losslessly
        arr = _rasterize(
            [bytes(b) for b in g["geometry"]],
            TILE, TILE, gt, list(g["burn"]),
            dtype=np.float64 if salt else dtype, merge=merge,
        )
        return pd.DataFrame(
            {
                "zoom": [zoom], "tile_x": [tx], "tile_y": [ty],
                "data": [arr.tobytes()],
                "checksum": [_checksum(arr)],
            }
        )

    if salt is None:
        return fanned.groupby(["tile_x", "tile_y"]).map_groups(burn, batch_format="pandas")

    if merge != "add":
        raise ValueError("salted burn requires merge='add' (additive partials)")

    def add_salt(t: pa.Table) -> pa.Table:
        # vectorized FNV-1a over the Arrow binary buffers (the per-row
        # hashlib.md5 list comprehension here was the one Python loop on
        # the rasterize1m bench path). Salting only needs a DETERMINISTIC
        # spread — partials sum exactly whatever the assignment — so a
        # bounded 64-byte prefix fold mixed with the WKB length suffices
        # and keeps the loop count independent of geometry size.
        s = _fnv_binary_prefix(t["geometry"], max_bytes=64) % np.uint64(salt)
        return t.append_column("salt", pa.array(s.astype(np.int32)))

    salted = fanned.map_batches(add_salt, batch_format="pyarrow", batch_size=None)
    partial_tiles = salted.groupby(["tile_x", "tile_y", "salt"]).map_groups(
        burn, batch_format="pandas"
    )

    def merge_salted(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(TILE * TILE, dtype=np.float64)
        for buf in g["data"]:
            acc += np.frombuffer(buf, dtype=np.float64)
        arr = acc.reshape(TILE, TILE).astype(dtype)
        return pd.DataFrame(
            {
                "zoom": [int(g["zoom"].iloc[0])],
                "tile_x": [int(g["tile_x"].iloc[0])],
                "tile_y": [int(g["tile_y"].iloc[0])],
                "data": [arr.tobytes()],
                "checksum": [_checksum(arr)],
            }
        )

    return partial_tiles.groupby(["tile_x", "tile_y"]).map_groups(
        merge_salted, batch_format="pandas"
    )


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv_binary_prefix(col, max_bytes: int = 64) -> np.ndarray:
    """FNV-1a 64 over the first max_bytes of each binary value plus its
    length, vectorized across rows via the Arrow (offsets, data) buffers
    (same per-byte-position fold as text/dedup._hash_tokens_fnv, bounded
    so huge geometries don't stretch the loop)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=n + 1, offset=arr.offset * 4).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    cap = int(min(lengths.max(), max_bytes)) if n else 0
    with np.errstate(over="ignore"):
        for j in range(cap):
            m = lengths > j
            b = data[np.minimum(starts + j, data.size - 1)].astype(np.uint64)
            h = np.where(m, (h ^ b) * _FNV_PRIME, h)
        h = (h ^ lengths.astype(np.uint64)) * _FNV_PRIME
    return h


def _reduce2x2(r: np.ndarray, agg: str) -> np.ndarray:
    """2x2 block reduce for one child tile: r has shape (T/2, 2, T/2, 2).
    agg: sum | mean | rms | mode (gcore/overview.cpp resampler family —
    mode is the categorical-raster reducer: most frequent of the 4, ties
    broken toward the SMALLEST value, matching a deterministic reading of
    GDAL's first-bucket tie behavior)."""
    if agg == "sum":
        return r.sum(axis=(1, 3))
    if agg == "mean":
        return r.mean(axis=(1, 3))
    if agg == "rms":
        return np.sqrt((r * r).mean(axis=(1, 3)))
    if agg == "nearest":
        return r[:, 0, :, 0]  # top-left sample of each 2x2 (GRA_NearestNeighbour)
    if agg == "mode":
        v = r.transpose(0, 2, 1, 3).reshape(r.shape[0], r.shape[2], 4)
        counts = np.zeros(v.shape, dtype=np.int8)
        for i in range(4):
            for j in range(4):
                counts[:, :, i] += (v[:, :, i] == v[:, :, j]).astype(np.int8)
        maxc = counts.max(axis=2, keepdims=True)
        cand = np.where(counts == maxc, v, np.inf)
        return cand.min(axis=2)
    raise ValueError(f"unknown overview agg {agg}")


def overview_reduce(tiles_ds, *, dtype=np.uint32, agg: str = "sum"):
    """One zoom level up: parent tile from <= 4 children, 2x2 block reduce
    (sum for counts, mean for imagery, rms, mode for categorical —
    gcore/overview.cpp:4914 resampler family)."""

    def shift(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].to_numpy(zero_copy_only=False)
        ty = t["tile_y"].to_numpy(zero_copy_only=False)
        t = t.append_column("p_x", pa.array(tx >> 1))
        t = t.append_column("p_y", pa.array(ty >> 1))
        return t

    shifted = tiles_ds.map_batches(shift, batch_format="pyarrow", batch_size=None)

    # hash-partitioned compose (same rationale as the densify partition scan)
    from gdal_ray.util import default_num_parts
    P = default_num_parts()

    def add_part(t: pa.Table) -> pa.Table:
        px = t["p_x"].to_numpy(zero_copy_only=False)
        py = t["p_y"].to_numpy(zero_copy_only=False)
        part = ((px * 73856093) ^ (py * 19349663)) % P
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def compose_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_x", "p_y"], kind="mergesort").reset_index(drop=True)
        pxa = g["p_x"].to_numpy()
        pya = g["p_y"].to_numpy()
        key_change = np.nonzero((pxa[1:] != pxa[:-1]) | (pya[1:] != pya[:-1]))[0] + 1
        bounds = np.concatenate([[0], key_change, [len(g)]])
        rows = {"zoom": [], "tile_x": [], "tile_y": [], "data": [],
                "n_points": [], "checksum": []}
        for s, e in zip(bounds[:-1], bounds[1:]):
            z = int(g["zoom"].iloc[s]) - 1
            parent = np.zeros((TILE, TILE), dtype=np.float64)
            for i in range(s, e):
                child = np.frombuffer(g["data"].iloc[i], dtype=dtype).reshape(TILE, TILE)
                r = child.reshape(TILE // 2, 2, TILE // 2, 2).astype(np.float64)
                small = _reduce2x2(r, agg)
                ox = (int(g["tile_x"].iloc[i]) & 1) * (TILE // 2)
                oy = (int(g["tile_y"].iloc[i]) & 1) * (TILE // 2)
                parent[oy : oy + TILE // 2, ox : ox + TILE // 2] = small
            arr = parent.astype(dtype)
            rows["zoom"].append(z)
            rows["tile_x"].append(int(pxa[s]))
            rows["tile_y"].append(int(pya[s]))
            rows["data"].append(arr.tobytes())
            rows["n_points"].append(int(parent.sum()) if agg == "sum" else 0)
            rows["checksum"].append(_checksum(arr))
        return pd.DataFrame(rows)

    return (
        shifted.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part").map_groups(compose_partition, batch_format="pandas")
    )


def band_histogram(tiles_ds, *, dtype=np.uint32, nbuckets: int = 256,
                   bucket_min: float = -0.5, bucket_max: float = 255.5,
                   include_out_of_range: bool = False,
                   approx_ok: bool = False, approx_stride: int = 4,
                   nodata=None):
    """GDALRasterBand::GetHistogram semantics (gcore/gdalrasterband.cpp:
    4224-4250): nbuckets equal-width buckets over [bucket_min, bucket_max);
    bucket = floor((v - min) * nbuckets / (max - min)). Out-of-range values
    are clamped into the end buckets when include_out_of_range (GDAL's
    bIncludeOutOfRange), else dropped. approx_ok mirrors GDAL's bApproxOK:
    sample every approx_stride-th pixel in BOTH axes (GDAL reads overviews
    / decimated scanlines; deterministic here). Default bucket bounds are
    GDAL's byte-band default (-0.5..255.5, 256 buckets).

    Returns SPARSE rows (bucket, n) — only non-empty buckets (GDAL returns
    the dense vector; densify with a small join client-side if needed).
    Distributed shape: per-batch np.bincount partial -> groupby_agg sum
    (the shuffle moves at most nbuckets rows per block)."""
    from gdal_ray.ops.relational import groupby_agg

    scale = nbuckets / (bucket_max - bucket_min)

    def part(t: pa.Table) -> pa.Table:
        counts = np.zeros(nbuckets, dtype=np.int64)
        for buf in t["data"].to_pylist():
            arr = np.frombuffer(buf, dtype=dtype)
            if approx_ok:
                side = int(np.sqrt(arr.size))
                if side * side == arr.size:
                    arr = arr.reshape(side, side)[::approx_stride, ::approx_stride].ravel()
                else:
                    arr = arr[::approx_stride]
            v = arr.astype(np.float64)
            if nodata is not None:
                v = v[v != nodata]
            idx = np.floor((v - bucket_min) * scale).astype(np.int64)
            if include_out_of_range:
                idx = np.clip(idx, 0, nbuckets - 1)
            else:
                idx = idx[(idx >= 0) & (idx < nbuckets)]
            counts += np.bincount(idx, minlength=nbuckets)
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    partials = tiles_ds.map_batches(part, batch_format="pyarrow", batch_size=None)
    return groupby_agg(partials, ["bucket"], [("n", "sum", "n")])


def band_statistics(tiles_ds, *, dtype=np.uint32, nodata=None,
                    approx_ok: bool = False, approx_stride: int = 4):
    """`gdal raster info` band statistics (GDALComputeRasterStatistics,
    gcore/rasterband.cpp lineage) — EXACT distributed min/max/mean/std/
    count over the tile table: one vectorized partial row per tile
    (n, sum, sumsq, min, max), merged with the algebraic tree reduce.
    approx_ok mirrors GDAL's bApproxOK: sample every approx_stride-th
    pixel in both axes (GDAL reads overviews/decimated data).
    Returns a 1-row table (or one row per `band` column value)."""
    import pyarrow.compute as pc_

    from gdal_ray.ops.relational import groupby_agg

    def part(t: pa.Table) -> pa.Table:
        has_band = "band" in t.column_names
        rows = {"n": [], "s": [], "s2": [], "mn": [], "mx": []}
        bands = []
        for i, buf in enumerate(t["data"].to_pylist()):
            arr = np.frombuffer(buf, dtype=dtype)
            if approx_ok:
                side = int(np.sqrt(arr.size))
                if side * side == arr.size:
                    arr = arr.reshape(side, side)[::approx_stride,
                                                  ::approx_stride].ravel()
                else:
                    arr = arr[::approx_stride]
            arr = arr.astype(np.float64)
            if nodata is not None:
                arr = arr[arr != nodata]
            rows["n"].append(arr.size)
            rows["s"].append(arr.sum() if arr.size else 0.0)
            rows["s2"].append((arr * arr).sum() if arr.size else 0.0)
            rows["mn"].append(arr.min() if arr.size else np.inf)
            rows["mx"].append(arr.max() if arr.size else -np.inf)
            if has_band:
                bands.append(t["band"][i].as_py())
        out = {k: pa.array(v) for k, v in rows.items()}
        if has_band:
            out["band"] = pa.array(bands)
        return pa.table(out)

    partials = tiles_ds.map_batches(part, batch_format="pyarrow", batch_size=None)
    keys = ["band"] if "band" in tiles_ds.schema().names else []
    agg = groupby_agg(partials, keys, [
        ("n", "sum", "n"), ("s", "sum", "s"), ("s2", "sum", "s2"),
        ("mn", "min", "mn"), ("mx", "max", "mx"),
    ])

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        s2 = t["s2"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            var = np.maximum(s2 / n - mean * mean, 0.0)  # population, GDAL's convention
        cols = {}
        for k in (keys or []):
            cols[k] = t[k]
        cols.update({
            "count": pc_.cast(t["n"], pa.int64()),
            "min": t["mn"], "max": t["mx"],
            "mean": pa.array(mean), "std": pa.array(np.sqrt(var)),
        })
        return pa.table(cols)

    return agg.map_batches(fin, batch_format="pyarrow", batch_size=None)


def tiles_as_features(tiles_ds, zoom: int, *, dtype=np.uint32, nodata=None):
    """`gdal raster as-features` (apps/gdalalg_raster_as_features.h:29-30:
    'Create features from pixels'): tile table -> one row per (non-nodata)
    pixel with global pixel coords, lon/lat of the pixel center, and value.
    The raster->table equivalence the whole tile model is built on."""

    def explode(t: pa.Table) -> pa.Table:
        gx_all, gy_all, v_all = [], [], []
        for tx, ty, buf in zip(
            t["tile_x"].to_pylist(), t["tile_y"].to_pylist(), t["data"].to_pylist()
        ):
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
            if nodata is not None:
                ys, xs = np.nonzero(arr != nodata)
            else:
                ys, xs = np.nonzero(np.ones_like(arr, dtype=bool))
            gx_all.append(tx * TILE + xs)
            gy_all.append(ty * TILE + ys)
            v_all.append(arr[ys, xs])
        gx = np.concatenate(gx_all) if gx_all else np.array([], np.int64)
        gy = np.concatenate(gy_all) if gy_all else np.array([], np.int64)
        vv = np.concatenate(v_all) if v_all else np.array([], dtype)
        n = float((1 << zoom) * TILE)
        lon = (gx + 0.5) / n * 360.0 - 180.0
        lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (gy + 0.5) / n))))
        return pa.table(
            {
                "pixel_x": pa.array(gx.astype(np.int64)),
                "pixel_y": pa.array(gy.astype(np.int64)),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(vv.astype(np.float64)),
            }
        )

    return tiles_ds.map_batches(explode, batch_format="pyarrow", batch_size=None)


def sample_tiles_at_points(tiles_ds, points_ds, zoom: int, *,
                           method: str = "nearest", dtype=np.uint32,
                           lon_col="lon", lat_col="lat", nodata=0.0):
    """`gdal raster pixel-info` / interpolate-at-point
    (alg/gdal_interpolateatpoint.cpp:172-202 lists nearest / bilinear /
    cubic / cubicspline; lanczos added for symmetry with the warp kernel
    family): look up the raster value under each point. Points fan to
    their covering tile key; each TILE also posts kernel-radius-wide halo
    strips to its 8 neighbors (bilinear 1 px, cubic/cubicspline 2 px,
    lanczos 3 px), so every group interpolates locally from a padded
    array. One groupby, one vectorized kernel evaluation per group.
    Pixels with no data (past the raster edge) get zero weight and the
    result normalizes by the valid-weight sum, matching _sample_kernel /
    GDAL edge behavior. Output: point rows + `value`."""
    methods = ("nearest", "bilinear", "cubic", "cubicspline", "lanczos")
    if method not in methods:
        raise ValueError(f"method must be one of {methods}, got {method!r}")
    halo = 0 if method == "nearest" else _KERNEL_RADIUS[method]

    def fan_points(t: pa.Table) -> pa.Table:
        lon = np.asarray(t[lon_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        lat = np.asarray(t[lat_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        px, py = wm.lonlat_to_pixel(lon, lat, zoom)
        tx = (px // TILE).astype(np.int64)
        ty = (py // TILE).astype(np.int64)
        t = t.append_column("__px", pa.array(px))
        t = t.append_column("__py", pa.array(py))
        t = t.append_column("t_x", pa.array(tx))
        t = t.append_column("t_y", pa.array(ty))
        t = t.append_column("__kind", pa.array(np.full(len(t), 0, np.int8)))
        t = t.append_column("__role", pa.array(["pt"] * len(t)))
        return t

    def _sel(d: int):
        return {-1: slice(0, halo), 0: slice(None), 1: slice(TILE - halo, TILE)}[d]

    pts = points_ds.map_batches(fan_points, batch_format="pyarrow", batch_size=None)

    # Prefilter: in the sparse-sample regime most tiles carry no sample
    # point — don't ship their megabyte payloads (x9 halo copies) into the
    # shuffle. Collect the distinct point-tile keys (bounded by the tile
    # grid, <= 4^zoom, NOT by point count) and broadcast them once; tiles
    # emit a copy only toward a key that actually has points. Costs one
    # extra scan of the points; saves shipping the whole raster.
    import ray as _ray

    def _pt_keys(t: pa.Table) -> pa.Table:
        k = (t["t_x"].to_numpy(zero_copy_only=False) << np.int64(32)) \
            + t["t_y"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(np.unique(k))})

    from gdal_ray.util import to_arrow as _to_arrow

    needed = np.unique(_to_arrow(
        pts.map_batches(_pt_keys, batch_format="pyarrow", batch_size=None)
    )["k"].to_numpy(zero_copy_only=False))
    _nref = _ray.put(needed)

    def fan_tiles_filtered(t: pa.Table) -> pa.Table:
        need = _ray.get(_nref)

        def _has(tx, ty):
            k = (tx << 32) + ty
            i = np.searchsorted(need, k)
            return i < need.size and need[i] == k

        xs, ys, roles, datas = [], [], [], []
        for tx, ty, buf in zip(
            t["tile_x"].to_pylist(), t["tile_y"].to_pylist(), t["data"].to_pylist()
        ):
            if _has(tx, ty):
                xs.append(tx); ys.append(ty); roles.append("self"); datas.append(buf)
            if halo:
                arr = None
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if (dx == 0 and dy == 0) or not _has(tx + dx, ty + dy):
                            continue
                        if arr is None:
                            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
                        strip = arr[_sel(dy), _sel(dx)]
                        xs.append(tx + dx); ys.append(ty + dy)
                        roles.append(f"{-dx}_{-dy}")
                        datas.append(np.ascontiguousarray(strip).tobytes())
        return pa.table(
            {
                "t_x": pa.array(xs, pa.int64()),
                "t_y": pa.array(ys, pa.int64()),
                "__tiledata": pa.array(datas, pa.binary()),
                "__kind": pa.array(np.full(len(xs), 1, np.int8)),
                "__role": pa.array(roles),
            }
        )

    tls = tiles_ds.map_batches(fan_tiles_filtered, batch_format="pyarrow",
                               batch_size=None)

    import pandas as pd

    # pad-region slices for a strip whose SOURCE tile sits at offset
    # (sx, sy) from the receiver; N = TILE + 2*halo
    def _region(sx: int, sy: int):
        def ax(d):
            return {-1: slice(0, halo), 0: slice(halo, halo + TILE),
                    1: slice(halo + TILE, halo + TILE + halo)}[d]
        return ax(sy), ax(sx)

    def sample(g: pd.DataFrame) -> pd.DataFrame:
        tiles = g[(g["__kind"] == 1) & (g["__role"] == "self")]
        points = g[g["__kind"] == 0]
        if len(points) == 0:
            return pd.DataFrame()
        out = points.drop(columns=["__kind", "__role", "__tiledata"], errors="ignore").copy()
        if len(tiles) == 0:
            out["value"] = nodata
            return out.drop(columns=["__px", "__py"])
        arr = np.frombuffer(tiles["__tiledata"].iloc[0], dtype=dtype).reshape(TILE, TILE)
        if method == "nearest":
            ox = (points["__px"].to_numpy() % TILE).astype(np.int64)
            oy = (points["__py"].to_numpy() % TILE).astype(np.int64)
            out["value"] = arr[oy, ox].astype(np.float64)
            return out.drop(columns=["__px", "__py"])
        # kernel methods: padded array assembled from halo strips; cells
        # with no contributing tile keep have=False and zero weight
        tx, ty = int(tiles["t_x"].iloc[0]), int(tiles["t_y"].iloc[0])
        N = TILE + 2 * halo
        pad = np.zeros((N, N), np.float64)
        have = np.zeros((N, N), bool)
        pad[halo:halo + TILE, halo:halo + TILE] = arr
        have[halo:halo + TILE, halo:halo + TILE] = True
        for _, row in g[(g["__kind"] == 1) & (g["__role"] != "self")].iterrows():
            sx, sy = (int(v) for v in row["__role"].split("_"))
            rs, cs = _region(sx, sy)
            h_rows = halo if sy else TILE
            h_cols = halo if sx else TILE
            pad[rs, cs] = np.frombuffer(row["__tiledata"], dtype=dtype).reshape(h_rows, h_cols)
            have[rs, cs] = True
        # local fractional coords: pixel-center convention (value at
        # col + 0.5), pad offset +halo
        fx = points["__px"].to_numpy() - tx * TILE - 0.5
        fy = points["__py"].to_numpy() - ty * TILE - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        ax_ = fx - x0
        ay_ = fy - y0
        r = _KERNEL_RADIUS[method]
        acc = np.zeros(len(points), np.float64)
        wsum = np.zeros(len(points), np.float64)
        for dy in range(-r + 1, r + 1):
            wy = _kern_weights(method, dy - ay_)
            ly = np.clip(y0 + dy + halo, 0, N - 1)
            in_y = (y0 + dy + halo >= 0) & (y0 + dy + halo < N)
            for dx in range(-r + 1, r + 1):
                w = _kern_weights(method, dx - ax_) * wy
                lx = np.clip(x0 + dx + halo, 0, N - 1)
                in_x = (x0 + dx + halo >= 0) & (x0 + dx + halo < N)
                ok = in_y & in_x & have[ly, lx] & (w != 0.0)
                acc[ok] += w[ok] * pad[ly[ok], lx[ok]]
                wsum[ok] += w[ok]
        v = np.full(len(points), np.float64(nodata))
        hasw = np.abs(wsum) > 1e-9
        v[hasw] = acc[hasw] / wsum[hasw]
        out["value"] = v
        return out.drop(columns=["__px", "__py"])

    # the union pads point columns with nulls for tile rows, so the pandas
    # group kernel promotes int64 point columns to float64 — cast them back
    # to the input schema (driver value-hashes are dtype-sensitive: an
    # event_id of 164.0 vs 164 is a hash mismatch even with equal values)
    pt_schema = points_ds.schema()
    pt_types = dict(zip(pt_schema.names, pt_schema.types))

    def _finish(t: pa.Table) -> pa.Table:
        t = t.drop_columns([c for c in ("t_x", "t_y") if c in t.column_names])
        cols = {}
        for name in t.column_names:
            col = t[name]
            want = pt_types.get(name)
            if want is not None and col.type != want:
                col = pc.cast(col, want)
            cols[name] = col
        return pa.table(cols)

    joined = pts.union(tls).groupby(["t_x", "t_y"]).map_groups(sample, batch_format="pandas")
    return joined.map_batches(_finish, batch_format="pyarrow", batch_size=None)


def _kern_weights(method: str, t: np.ndarray) -> np.ndarray:
    """1-D separable warp-kernel weight at signed distance t (pixel units).
    The GDAL resampling kernels (gdalwarper.h:37-67, alg/gdalwarpkernel.cpp):
    cubic = cubic convolution with A=-0.5 (GRA_Cubic), cubicspline = cubic
    B-spline (GRA_CubicSpline, approximating — reproduces linear fields
    exactly but does not interpolate samples), lanczos = a=3 windowed sinc
    (GRA_Lanczos)."""
    at = np.abs(t)
    if method == "bilinear":
        return np.maximum(1.0 - at, 0.0)
    if method == "cubic":
        A = -0.5
        return np.where(
            at <= 1.0, (A + 2) * at**3 - (A + 3) * at**2 + 1.0,
            np.where(at < 2.0, A * (at**3 - 5 * at**2 + 8 * at - 4), 0.0))
    if method == "cubicspline":
        return np.where(
            at < 1.0, (4.0 - 6 * at**2 + 3 * at**3) / 6.0,
            np.where(at < 2.0, (2.0 - at) ** 3 / 6.0, 0.0))
    if method == "lanczos":
        return np.where(at < 3.0, np.sinc(t) * np.sinc(t / 3.0), 0.0)
    raise ValueError(f"unknown kernel {method}")


_KERNEL_RADIUS = {"bilinear": 1, "cubic": 2, "cubicspline": 2, "lanczos": 3}


def _sample_kernel(src: dict, px: np.ndarray, py: np.ndarray,
                   method: str, nodata) -> np.ndarray:
    """Sample the global mercator pixel grid (dict (tile_x, tile_y) ->
    TILExTILE array) at fractional pixel positions with the chosen kernel.
    Pixel-center convention (value i at coordinate i+0.5). Source pixels
    outside the available tiles get zero weight; the output normalizes by
    the valid-weight sum (GDAL's behavior at edges) and stays `nodata`
    where nothing contributes. method: nearest | bilinear | cubic |
    cubicspline | lanczos | mode (categorical: most frequent of the 2x2
    footprint, smallest value on ties — deterministic)."""
    out = np.full(px.size, np.float64(nodata), dtype=np.float64)
    if method == "nearest":
        gx = px.astype(np.int64)
        gy = py.astype(np.int64)
        txs, tys = gx // TILE, gy // TILE
        ox, oy = gx % TILE, gy % TILE
        for (tx, ty), arr in src.items():
            m = (txs == tx) & (tys == ty)
            out[m] = arr[oy[m], ox[m]]
        return out
    fx = px - 0.5
    fy = py - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    ax = fx - x0
    ay = fy - y0
    if method == "mode":
        vals = np.full((px.size, 4), np.nan)
        for k, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            gx, gy = x0 + dx, y0 + dy
            txs, tys = gx // TILE, gy // TILE
            ox, oy = gx % TILE, gy % TILE
            for (tx, ty), arr in src.items():
                m = (txs == tx) & (tys == ty)
                vals[m, k] = arr[oy[m], ox[m]]
        counts = np.zeros((px.size, 4), dtype=np.int8)
        for i in range(4):
            for j in range(4):
                counts[:, i] += (vals[:, i] == vals[:, j]).astype(np.int8)
        # most frequent valid value; ties broken toward the SMALLEST value
        counts[np.isnan(vals)] = 0
        maxc = counts.max(axis=1, keepdims=True)
        cand = np.where((counts == maxc) & (counts > 0), vals, np.inf)
        picked = cand.min(axis=1)
        has = np.isfinite(picked)
        out[has] = picked[has]
        return out
    r = _KERNEL_RADIUS[method]
    acc = np.zeros_like(out)
    wsum = np.zeros_like(out)
    for dy in range(-r + 1, r + 1):
        wy = _kern_weights(method, dy - ay)
        for dx in range(-r + 1, r + 1):
            w = _kern_weights(method, dx - ax) * wy
            nzw = w != 0.0
            if not nzw.any():
                continue
            gx, gy = x0 + dx, y0 + dy
            txs, tys = gx // TILE, gy // TILE
            ox, oy = gx % TILE, gy % TILE
            for (tx, ty), arr in src.items():
                m = (txs == tx) & (tys == ty) & nzw
                acc[m] += w[m] * arr[oy[m], ox[m]]
                wsum[m] += w[m]
    has = np.abs(wsum) > 1e-9
    out[has] = acc[has] / wsum[has]
    return out


def warp_tiles_to_platecarree(tiles_ds, zoom: int, *, out_cell_deg: float,
                              method: str = "nearest", dtype=np.uint32,
                              nodata=0, out_block: int = 64):
    """Warp a WebMercator z/x/y tile table to a plate-carrée (EPSG:4326)
    regular grid — the reference's warp (alg/gdalwarpkernel.cpp) restated
    as a tile shuffle: each SOURCE tile fans out to the output blocks its
    mercator footprint covers, groupby(output block) gathers exactly the
    source tiles it needs, and one vectorized inverse-transform resample
    (dst pixel -> lon/lat -> mercator global pixel -> src tile pixel) fills
    the block. method: nearest | bilinear.

    Output rows: (block_x, block_y, data[out_block^2 dtype], checksum) with
    geotransform (-180 + bx*out_block*cell, cell, 0, 90 - by*out_block*cell,
    0, -cell)."""
    import pyarrow.compute as pc_

    nblk_x = int(np.ceil(360.0 / (out_cell_deg * out_block)))
    nblk_y = int(np.ceil(180.0 / (out_cell_deg * out_block)))

    def fan(t: pa.Table) -> pa.Table:
        rows = {"b_x": [], "b_y": [], "tile_x": [], "tile_y": [], "data": []}
        for tx, ty, buf in zip(
            t["tile_x"].to_pylist(), t["tile_y"].to_pylist(), t["data"].to_pylist()
        ):
            lon0, lat_min, lon1, lat_max = wm.tile_bounds(tx, ty, zoom)
            bx0 = int((lon0 + 180.0) // (out_cell_deg * out_block))
            bx1 = int((lon1 + 180.0) // (out_cell_deg * out_block))
            by0 = int((90.0 - lat_max) // (out_cell_deg * out_block))
            by1 = int((90.0 - lat_min) // (out_cell_deg * out_block))
            for bx in range(max(bx0, 0), min(bx1, nblk_x - 1) + 1):
                for by in range(max(by0, 0), min(by1, nblk_y - 1) + 1):
                    rows["b_x"].append(bx)
                    rows["b_y"].append(by)
                    rows["tile_x"].append(tx)
                    rows["tile_y"].append(ty)
                    rows["data"].append(buf)
        return pa.table(
            {
                "b_x": pa.array(rows["b_x"], pa.int64()),
                "b_y": pa.array(rows["b_y"], pa.int64()),
                "tile_x": pa.array(rows["tile_x"], pa.int64()),
                "tile_y": pa.array(rows["tile_y"], pa.int64()),
                "data": pa.array(rows["data"], pa.binary()),
            }
        )

    fanned = tiles_ds.map_batches(fan, batch_format="pyarrow", batch_size=None)

    def resample(g: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(g["b_x"].iloc[0]), int(g["b_y"].iloc[0])
        src = {
            (int(r["tile_x"]), int(r["tile_y"])): np.frombuffer(r["data"], dtype=dtype).reshape(TILE, TILE)
            for _, r in g.iterrows()
        }
        # dst pixel centers -> lon/lat
        lons = -180.0 + (bx * out_block + np.arange(out_block) + 0.5) * out_cell_deg
        lats = 90.0 - (by * out_block + np.arange(out_block) + 0.5) * out_cell_deg
        LON, LAT = np.meshgrid(lons, lats)
        px, py = wm.lonlat_to_pixel(LON.ravel(), LAT.ravel(), zoom)
        # shared kernel sampler: nearest | bilinear | cubic | cubicspline |
        # lanczos | mode (gdalwarper.h:37-67)
        out = _sample_kernel(src, px, py, method, nodata)
        arr = out.reshape(out_block, out_block).astype(dtype)
        return pd.DataFrame(
            {"block_x": [bx], "block_y": [by], "data": [arr.tobytes()],
             "checksum": [_checksum(arr)]}
        )

    return fanned.groupby(["b_x", "b_y"]).map_groups(resample, batch_format="pandas")


def warp_tiles_to_crs(tiles_ds, zoom: int, transformer, *, extent,
                      out_cell: float, method: str = "nearest",
                      dtype=np.uint32, nodata=0, out_block: int = 64,
                      boundary_samples: int = 8):
    """Warp a WebMercator z/x/y tile table to a regular grid in ANY CRS with
    a forward/inverse Transformer (geo.crs: UTM zones, LAEA, ... — the
    generalization of warp_tiles_to_platecarree beyond EPSG:4326).

    Same shuffle shape as the reference warp (alg/gdalwarpkernel.cpp):
    each SOURCE tile fans to the output blocks its projected footprint
    covers (footprint = forward-transform of boundary samples, robust to
    projection curvature), groupby(block) gathers the needed tiles, one
    vectorized inverse-transform resample per block (dst pixel -> CRS
    inverse -> lon/lat -> mercator global pixel -> src tile pixel).

    extent: (x0, y0, x1, y1) in TARGET CRS units; output rows
    (block_x, block_y, data, checksum) with geotransform
    (x0 + bx*out_block*cell, cell, 0, y1 - by*out_block*cell, 0, -cell)."""
    x0e, y0e, x1e, y1e = extent
    nblk_x = int(np.ceil((x1e - x0e) / (out_cell * out_block)))
    nblk_y = int(np.ceil((y1e - y0e) / (out_cell * out_block)))

    def fan(t: pa.Table) -> pa.Table:
        rows = {"b_x": [], "b_y": [], "tile_x": [], "tile_y": [], "data": []}
        s = np.linspace(0.0, 1.0, boundary_samples)
        for tx, ty, buf in zip(
            t["tile_x"].to_pylist(), t["tile_y"].to_pylist(), t["data"].to_pylist()
        ):
            lon0, lat_min, lon1, lat_max = wm.tile_bounds(tx, ty, zoom)
            # boundary ring samples -> forward CRS -> projected bbox
            lons = np.concatenate([
                lon0 + (lon1 - lon0) * s, np.full_like(s, lon1),
                lon1 - (lon1 - lon0) * s, np.full_like(s, lon0)])
            lats = np.concatenate([
                np.full_like(s, lat_max), lat_max - (lat_max - lat_min) * s,
                np.full_like(s, lat_min), lat_min + (lat_max - lat_min) * s])
            with np.errstate(all="ignore"):
                px, py = transformer.forward(lons, lats)
            good = np.isfinite(px) & np.isfinite(py)
            if not good.any():
                continue
            bx0 = int((px[good].min() - x0e) // (out_cell * out_block))
            bx1 = int((px[good].max() - x0e) // (out_cell * out_block))
            by0 = int((y1e - py[good].max()) // (out_cell * out_block))
            by1 = int((y1e - py[good].min()) // (out_cell * out_block))
            for bx in range(max(bx0, 0), min(bx1, nblk_x - 1) + 1):
                for by in range(max(by0, 0), min(by1, nblk_y - 1) + 1):
                    rows["b_x"].append(bx)
                    rows["b_y"].append(by)
                    rows["tile_x"].append(tx)
                    rows["tile_y"].append(ty)
                    rows["data"].append(buf)
        return pa.table({
            "b_x": pa.array(rows["b_x"], pa.int64()),
            "b_y": pa.array(rows["b_y"], pa.int64()),
            "tile_x": pa.array(rows["tile_x"], pa.int64()),
            "tile_y": pa.array(rows["tile_y"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    fanned = tiles_ds.map_batches(fan, batch_format="pyarrow", batch_size=None)

    def resample(g: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(g["b_x"].iloc[0]), int(g["b_y"].iloc[0])
        src = {
            (int(r["tile_x"]), int(r["tile_y"])): np.frombuffer(
                r["data"], dtype=dtype).reshape(TILE, TILE)
            for _, r in g.iterrows()
        }
        xs = x0e + (bx * out_block + np.arange(out_block) + 0.5) * out_cell
        ys = y1e - (by * out_block + np.arange(out_block) + 0.5) * out_cell
        XX, YY = np.meshgrid(xs, ys)
        with np.errstate(all="ignore"):
            lon, lat = transformer.inverse(XX.ravel(), YY.ravel())
        ok = np.isfinite(lon) & np.isfinite(lat) & (np.abs(lat) <= 85.05)
        out = np.full(out_block * out_block, nodata, dtype=np.float64)
        if ok.any():
            px, py = wm.lonlat_to_pixel(lon[ok], lat[ok], zoom)
            # full kernel family (round 2 ignored `method` here: nearest
            # only — now routed through the shared sampler)
            out[ok] = _sample_kernel(src, px, py, method, nodata)
        arr = out.reshape(out_block, out_block).astype(dtype)
        return pd.DataFrame(
            {"block_x": [bx], "block_y": [by], "data": [arr.tobytes()],
             "checksum": [_checksum(arr)]}
        )

    return fanned.groupby(["b_x", "b_y"]).map_groups(resample, batch_format="pandas")


def pansharpen_tiles(rgb_ds, pan_ds, *, weights=(1 / 3, 1 / 3, 1 / 3),
                     dtype=np.uint32):
    """`gdal raster pansharpen` — weighted Brovey
    (alg/gdalpansharpen.cpp: out_b = in_b * pan / pseudo_pan, pseudo_pan =
    sum(w_b * in_b)) as a tile-key compose: the 3 RGB band tables carry a
    `band` column (0/1/2), the pan table rides as band 3; groupby(tile)
    gathers the 4 arrays, one vectorized ratio per tile. Output: packed
    RGBA tiles."""
    import pyarrow.compute as pc_

    def tag(ds, band):
        def f(t: pa.Table, b=band) -> pa.Table:
            return pa.table({
                "tile_x": t["tile_x"], "tile_y": t["tile_y"],
                "band": pa.array(np.full(len(t), b, np.int32)),
                "data": t["data"],
            })

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    # rgb_ds must provide its own band column (0..2); pan is band 3
    def keep(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": t["tile_x"], "tile_y": t["tile_y"],
            "band": pc_.cast(t["band"], pa.int32()), "data": t["data"],
        })

    u = rgb_ds.map_batches(keep, batch_format="pyarrow", batch_size=None).union(
        tag(pan_ds, 3))

    w = np.asarray(weights, np.float64)

    def compose(g: pd.DataFrame) -> pd.DataFrame:
        by_band = {int(r["band"]): np.frombuffer(r["data"], dtype=dtype)
                   .reshape(TILE, TILE).astype(np.float64)
                   for _, r in g.iterrows()}
        if 3 not in by_band or not all(b in by_band for b in (0, 1, 2)):
            return pd.DataFrame()
        pan = by_band[3]
        pseudo = sum(w[b] * by_band[b] for b in range(3))
        ratio = np.where(pseudo > 0, pan / np.where(pseudo > 0, pseudo, 1.0), 0.0)
        rgb = [np.clip(np.round(by_band[b] * ratio), 0, 255).astype(np.uint32)
               for b in range(3)]
        packed = rgb[0] | (rgb[1] << 8) | (rgb[2] << 16) | (np.uint32(255) << 24)
        return pd.DataFrame({
            "tile_x": [int(g["tile_x"].iloc[0])],
            "tile_y": [int(g["tile_y"].iloc[0])],
            "data": [packed.tobytes()],
            "checksum": [_checksum(packed)],
        })

    return u.groupby(["tile_x", "tile_y"]).map_groups(compose, batch_format="pandas")


def mosaic_tiles(*tile_datasets, op: str = "first", dtype=np.uint32, nodata=0):
    """`gdal raster mosaic` / `stack` / `blend`: N tile tables -> one.
    op: first (first non-nodata wins, priority = dataset order) | sum |
    mean | max. Implemented as union + groupby(tile).map_groups(composite).
    """
    import pyarrow.compute as pc_

    tagged = []
    for pri, ds in enumerate(tile_datasets):
        def tag(t: pa.Table, p=pri) -> pa.Table:
            return t.append_column("__pri", pa.array(np.full(len(t), p, np.int32)))

        tagged.append(ds.map_batches(tag, batch_format="pyarrow", batch_size=None))
    u = tagged[0]
    for d in tagged[1:]:
        u = u.union(d)

    def compose(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__pri", kind="mergesort")
        arrs = [np.frombuffer(b, dtype=dtype).reshape(TILE, TILE).astype(np.float64)
                for b in g["data"]]
        if op == "first":
            out = arrs[0].copy()
            for a in arrs[1:]:
                m = out == nodata
                out[m] = a[m]
        elif op == "sum":
            out = np.sum(arrs, axis=0)
        elif op == "mean":
            out = np.mean(arrs, axis=0)
        elif op == "max":
            out = np.max(arrs, axis=0)
        else:
            raise ValueError(op)
        arr = out.astype(dtype)
        return pd.DataFrame(
            {
                "zoom": [int(g["zoom"].iloc[0])],
                "tile_x": [int(g["tile_x"].iloc[0])],
                "tile_y": [int(g["tile_y"].iloc[0])],
                "data": [arr.tobytes()],
                "checksum": [_checksum(arr)],
            }
        )

    return u.groupby(["tile_x", "tile_y"]).map_groups(compose, batch_format="pandas")


# ---------------------------------------------------------------------------
# distributed polygonize
# ---------------------------------------------------------------------------


def _tile_pieces_arrays(arr: np.ndarray, tile_key: tuple[int, int],
                        connectivity: int, nodata):
    """Per-tile, fully vectorized: local labels -> (edges, borders) as
    column arrays. Edges carry the tile id + local label; borders carry the
    shared side key (orient, gx, gy) so the pairing step is a plain groupby.
    No per-pixel Python loop — the 4 border sides are array slices."""
    h, w = arr.shape
    ox, oy = tile_key[0] * w, tile_key[1] * h
    labels = label_array(arr, connectivity=connectivity, nodata=nodata)
    from gdal_ray.raster.polygonize import _boundary_edges_all

    # first-pixel value per label (vectorized reverse scatter)
    nlab = int(labels.max()) + 1
    flat, vals = labels.ravel(), arr.ravel()
    m = flat >= 0
    idxs = np.arange(flat.size)[m][::-1]
    lab_of = flat[m][::-1]
    first_idx = np.zeros(max(nlab, 1), dtype=np.int64)
    first_idx[lab_of] = idxs

    el, eax, eay, ebx, eby = _boundary_edges_all(labels)
    el = el.astype(np.int64)
    edges = {
        "tx": np.full(el.size, tile_key[0], np.int64),
        "ty": np.full(el.size, tile_key[1], np.int64),
        "lab": el,
        "value": vals[first_idx[el]].astype(np.float64),
        "ax": eax.astype(np.int64) + ox, "ay": eay.astype(np.int64) + oy,
        "bx": ebx.astype(np.int64) + ox, "by": eby.astype(np.int64) + oy,
    }

    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    sides = [
        # (orient 0=h, gx, gy, values, labels): h keys sit between rows,
        # v keys between columns; both adjacent tiles compute the same key
        (0, ox + xs, np.full(w, oy, np.int64), arr[0, :], labels[0, :]),
        (0, ox + xs, np.full(w, oy + h, np.int64), arr[h - 1, :], labels[h - 1, :]),
        (1, np.full(h, ox, np.int64), oy + ys, arr[:, 0], labels[:, 0]),
        (1, np.full(h, ox + w, np.int64), oy + ys, arr[:, w - 1], labels[:, w - 1]),
    ]
    b_cols = {k: [] for k in ("orient", "gx", "gy", "value", "tx", "ty", "lab")}
    for orient, gx, gy, v, lb in sides:
        keep = np.ones(v.size, bool) if nodata is None else (v != nodata)
        b_cols["orient"].append(np.full(int(keep.sum()), orient, np.int8))
        b_cols["gx"].append(gx[keep])
        b_cols["gy"].append(gy[keep])
        b_cols["value"].append(v[keep].astype(np.float64))
        b_cols["tx"].append(np.full(int(keep.sum()), tile_key[0], np.int64))
        b_cols["ty"].append(np.full(int(keep.sum()), tile_key[1], np.int64))
        b_cols["lab"].append(lb[keep].astype(np.int64))
    borders = {k: np.concatenate(v) for k, v in b_cols.items()}
    return edges, borders


def _pair_equivalences(borders) -> list[tuple[tuple, tuple]]:
    """Vectorized border pairing: sort by side key; a key appearing exactly
    twice with equal values joins its two labels."""
    import pandas as pd

    df = pd.DataFrame(borders)
    if len(df) == 0:
        return []
    pairs = []
    # sort by side key, then compare adjacent rows of the same key
    df = df.sort_values(["orient", "gx", "gy", "tx", "ty"], kind="mergesort").reset_index(drop=True)
    key = df[["orient", "gx", "gy"]].to_numpy()
    same_next = (key[:-1] == key[1:]).all(axis=1)
    # a side cell is shared by at most 2 tiles, so "same as next" marks the
    # first of each pair; guard against accidental >2 (cannot happen on a
    # tile grid)
    first = np.nonzero(same_next)[0]
    val = df["value"].to_numpy()
    ok = val[first] == val[first + 1]
    ta, ya, la = df["tx"].to_numpy(), df["ty"].to_numpy(), df["lab"].to_numpy()
    for i in first[ok]:
        pairs.append(((ta[i], ya[i], la[i]), (ta[i + 1], ya[i + 1], la[i + 1])))
    return pairs


def _stitch_component(edge_arrs, connectivity):
    """Cancel opposite interior edges, stitch the survivors into rings."""
    ax, ay, bx, by = (edge_arrs[k] for k in ("ax", "ay", "bx", "by"))
    edge_set: set = set()
    for e in zip(ax.tolist(), ay.tolist(), bx.tolist(), by.tolist()):
        rev = (e[2], e[3], e[0], e[1])
        if rev in edge_set:
            edge_set.discard(rev)
        else:
            edge_set.add(e)
    ring_edges = [((a, b), (c, d)) for a, b, c, d in sorted(edge_set)]
    rings = stitch_rings(ring_edges, connectivity)
    rings.sort(key=lambda r: -abs(_ring_area2_list(r)))
    return rings


def zonal_stats_raster(zones_ds, values_ds, *, zones_dtype=np.uint32,
                       values_dtype=np.uint32, zone_nodata=None):
    """Raster-zones zonal statistics (`gdal raster zonal-stats` with a
    raster zone layer; the raster-x-raster sibling of the vector-zones
    path): per aligned tile, one np.bincount pass accumulates (count,
    sum, sumsq, min, max) per zone id; partials merge with groupby_agg.
    Both inputs are tile tables keyed (tile_x, tile_y). Returns one row
    per zone: (zone, count, sum, mean, min, max, std[population])."""
    import pandas as pd
    import pyarrow.compute as pc_

    from gdal_ray.ops.relational import groupby_agg

    def tag(ds, marker):
        def f(t: pa.Table, m=marker) -> pa.Table:
            return pa.table({
                "tile_x": t["tile_x"], "tile_y": t["tile_y"],
                "__m": pa.array(np.full(len(t), m, np.int8)),
                "data": t["data"],
            })

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    u = tag(zones_ds, 0).union(tag(values_ds, 1))

    def part(g: pd.DataFrame) -> pd.DataFrame:
        z = v = None
        for _, r in g.iterrows():
            if r["__m"] == 0:
                z = np.frombuffer(r["data"], dtype=zones_dtype)
            else:
                v = np.frombuffer(r["data"], dtype=values_dtype)
        if z is None or v is None:
            return pd.DataFrame({c: [] for c in
                                 ("zone", "n", "s", "s2", "mn", "mx")})
        vv = v.astype(np.float64)
        mask = np.ones(z.size, bool) if zone_nodata is None else (z != zone_nodata)
        zi = z[mask].astype(np.int64)
        vi = vv[mask]
        zs, inv = np.unique(zi, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=vi)
        s2 = np.bincount(inv, weights=vi * vi)
        mn = np.full(zs.size, np.inf)
        mx = np.full(zs.size, -np.inf)
        np.minimum.at(mn, inv, vi)
        np.maximum.at(mx, inv, vi)
        return pd.DataFrame({"zone": zs, "n": n.astype(np.int64),
                             "s": s, "s2": s2, "mn": mn, "mx": mx})

    partials = u.groupby(["tile_x", "tile_y"]).map_groups(
        part, batch_format="pandas")
    agg = groupby_agg(partials, ["zone"], [
        ("n", "sum", "n"), ("s", "sum", "s"), ("s2", "sum", "s2"),
        ("mn", "min", "mn"), ("mx", "max", "mx")])

    def fin(t: pa.Table) -> pa.Table:
        n = pc_.cast(t["n"], pa.float64()).to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        s2 = t["s2"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            var = np.maximum(s2 / n - mean * mean, 0.0)
        return pa.table({
            "zone": pc_.cast(t["zone"], pa.int64()),
            "count": pc_.cast(t["n"], pa.int64()),
            "sum": t["s"], "mean": pa.array(mean),
            "min": t["mn"], "max": t["mx"],
            "std": pa.array(np.sqrt(var)),
        })

    return agg.map_batches(fin, batch_format="pyarrow", batch_size=None)


def crop_tiles(tiles_ds, zoom: int, bbox, *, nodata=0, dtype=np.uint32):
    """`gdal raster clip/crop` over the WebMercator tile table: tiles
    fully outside the lon/lat bbox DROP (pure filter — no data touched);
    edge tiles mask the outside pixels to nodata (exact global-pixel
    window). bbox: (lon0, lat0, lon1, lat1)."""
    lon0, lat0, lon1, lat1 = bbox
    px0, py1 = wm.lonlat_to_pixel(np.array([lon0]), np.array([lat0]), zoom)
    px1, py0 = wm.lonlat_to_pixel(np.array([lon1]), np.array([lat1]), zoom)
    gx0, gx1 = int(np.floor(px0[0])), int(np.ceil(px1[0])) - 1
    gy0, gy1 = int(np.floor(py0[0])), int(np.ceil(py1[0])) - 1

    def f(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].to_numpy(zero_copy_only=False)
        ty = t["tile_y"].to_numpy(zero_copy_only=False)
        keep = ((tx * TILE <= gx1) & ((tx + 1) * TILE - 1 >= gx0)
                & (ty * TILE <= gy1) & ((ty + 1) * TILE - 1 >= gy0))
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return t
        out = []
        sums = []
        for txv, tyv, buf in zip(t["tile_x"].to_pylist(),
                                 t["tile_y"].to_pylist(),
                                 t["data"].to_pylist()):
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE).copy()
            x_lo = max(gx0 - txv * TILE, 0)
            x_hi = min(gx1 - txv * TILE, TILE - 1)
            y_lo = max(gy0 - tyv * TILE, 0)
            y_hi = min(gy1 - tyv * TILE, TILE - 1)
            if x_lo > 0:
                arr[:, :x_lo] = nodata
            if x_hi < TILE - 1:
                arr[:, x_hi + 1:] = nodata
            if y_lo > 0:
                arr[:y_lo, :] = nodata
            if y_hi < TILE - 1:
                arr[y_hi + 1:, :] = nodata
            out.append(arr.tobytes())
            sums.append(_checksum(arr))
        i = t.column_names.index("data")
        t = t.set_column(i, "data", pa.array(out, pa.binary()))
        if "checksum" in t.column_names:
            j = t.column_names.index("checksum")
            t = t.set_column(j, "checksum", pa.array(sums, pa.int64()))
        return t

    return tiles_ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def footprint_tiles_ds(tiles_ds, *, nodata=0, dtype=np.uint32,
                       min_ring_area: float = 0.0, connectivity: int = 4):
    """`gdal raster footprint` (apps/gdalalg_raster_footprint lineage):
    polygons of the VALID-DATA mask — polygonize of (data != nodata) with
    tiny rings dropped PER RING (the app's -min_ring_area: a small outer
    ring drops the polygon, a small hole is filled). Returns a driver-side
    pa.Table (value=1 polygons) — footprints are a small summary result;
    the upstream polygonize itself runs distributed."""
    import pyarrow.compute as pc_

    def to_mask(t: pa.Table) -> pa.Table:
        out = []
        for buf in t["data"].to_pylist():
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
            out.append((arr != nodata).astype(np.uint32).tobytes())
        i = t.column_names.index("data")
        return t.set_column(i, "data", pa.array(out, pa.binary()))

    _ = pc_  # (mask building only needs numpy)
    masked = tiles_ds.map_batches(to_mask, batch_format="pyarrow", batch_size=None)
    comps = polygonize_tiles_ds(masked, connectivity=connectivity, nodata=0)

    from gdal_ray.geo import wkb as W

    def ring_area(r: np.ndarray) -> float:
        x, y = r[:, 0], r[:, 1]
        return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))

    geoms, vals = [], []
    for value, rings in comps:
        if value != 1:
            continue
        rr = [np.asarray(r, np.float64) for r in rings]
        if min_ring_area > 0.0 and rr:
            if ring_area(rr[0]) < min_ring_area:
                continue  # small outer ring: whole polygon goes
            # small interior rings (holes) are filled, ring-by-ring
            rr = [rr[0]] + [r for r in rr[1:]
                            if ring_area(r) >= min_ring_area]
        geoms.append(W.geom_to_wkb(("polygon", rr)))
        vals.append(1)
    return pa.table({"value": pa.array(vals, pa.int64()),
                     "geometry": pa.array(geoms, pa.binary())})


def polygonize_tiles(tiles: list[tuple[tuple[int, int], np.ndarray]],
                     connectivity: int = 4, nodata=None):
    """Distributed-shaped polygonize over a list of (tile_key, array).

    Driver-side orchestration mirrors the Ray plan 1:1 (per-tile map ->
    border pairing -> union-find over the equivalence pairs -> per-component
    stitch); the Ray version is `polygonize_tiles_ds`. Returns
    [(value, rings in global pixel coords)]."""
    all_edges, all_borders = [], []
    for key, arr in tiles:
        e, b = _tile_pieces_arrays(arr, key, connectivity, nodata)
        all_edges.append(e)
        all_borders.append(b)
    edges = {k: np.concatenate([e[k] for e in all_edges]) for k in all_edges[0]}
    borders = {k: np.concatenate([b[k] for b in all_borders]) for k in all_borders[0]}
    pairs = _pair_equivalences(borders)
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    roots = np.array(
        [str(uf.find((t, y, l)))
         for t, y, l in zip(edges["tx"], edges["ty"], edges["lab"])]
    )
    order = np.argsort(roots, kind="stable")
    roots = roots[order]
    sorted_edges = {k: edges[k][order] for k in ("ax", "ay", "bx", "by", "value")}
    bounds = np.concatenate(
        [[0], np.nonzero(roots[1:] != roots[:-1])[0] + 1, [roots.size]]
    )
    out = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        comp = {k: sorted_edges[k][s:e] for k in ("ax", "ay", "bx", "by")}
        rings = _stitch_component(comp, connectivity)
        out.append((sorted_edges["value"][s],
                    [np.array(r, dtype=np.float64) for r in rings]))
    return out


def _ring_area2_list(ring) -> float:
    s = 0.0
    for i in range(len(ring) - 1):
        s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return s


def _polygonize_root_map(pair_refs):
    """Pure pairs -> (tile,label)->root-str map (runs as ONE Ray task; the
    driver holds only the returned ObjectRef — VERDICT r3 item 8)."""
    import ray

    uf = UnionFind()
    for t in ray.get(list(pair_refs)):
        if isinstance(t, pd.DataFrame):
            t = _pd2pa(t, preserve_index=False)
        if t.num_rows == 0:
            continue
        for ta, ya, la, tb, yb, lb in zip(
            t["tx_a"].to_pylist(), t["ty_a"].to_pylist(), t["lab_a"].to_pylist(),
            t["tx_b"].to_pylist(), t["ty_b"].to_pylist(), t["lab_b"].to_pylist(),
        ):
            uf.union((int(ta), int(ya), int(la)), (int(tb), int(yb), int(lb)))
    return {x: str(uf.find(x)) for x in list(uf.parent)}


def polygonize_tiles_ds(tiles_ds, *, connectivity: int = 4, nodata=None,
                        dtype=np.uint32):
    """Ray-native distributed polygonize (tiles_ds rows: zoom, tile_x,
    tile_y, data).

    Plan (all heavy stages are Ray Data operators — VERDICT r1 item 5):
      1. map_batches(extract): per-tile labeling -> edge + border rows (the
         compressed boundary representation; the raster never leaves stage 1)
      2. border pairing: groupby(side key) emits label-equivalence pairs
      3. union-find over ONLY the pairs (tiny: O(shared-border regions)) in
         ONE Ray task; the driver holds only the (tile,label)->root map's
         ObjectRef, which broadcasts to the relabel stage
      4. map_batches(relabel) + groupby(root).map_groups(stitch): opposite
         interior edges cancel, each component stitches its rings in its own
         task
    Returns [(value, rings)] — the stitched component list (small output).
    """
    import pandas as pd
    import ray

    def extract(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("kind", "tx", "ty", "lab", "value",
                                "ax", "ay", "bx", "by")}
        for txv, tyv, buf in zip(
            t["tile_x"].to_pylist(), t["tile_y"].to_pylist(), t["data"].to_pylist()
        ):
            arr = np.frombuffer(buf, dtype=dtype).reshape(TILE, TILE)
            e, b = _tile_pieces_arrays(arr, (int(txv), int(tyv)), connectivity, nodata)
            ne, nb = e["lab"].size, b["lab"].size
            cols["kind"].append(np.concatenate([np.zeros(ne, np.int8), np.ones(nb, np.int8)]))
            for k in ("tx", "ty", "lab", "value"):
                cols[k].append(np.concatenate([e[k], b[k]]))
            # borders reuse ax/ay as the side key (orient, gx, gy packs into
            # ax=orient, ay=gx, bx=gy); edges use all four corner coords
            cols["ax"].append(np.concatenate([e["ax"], b["orient"].astype(np.int64)]))
            cols["ay"].append(np.concatenate([e["ay"], b["gx"]]))
            cols["bx"].append(np.concatenate([e["bx"], b["gy"]]))
            cols["by"].append(np.concatenate([e["by"], np.zeros(nb, np.int64)]))
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in cols.items()})

    pieces = tiles_ds.map_batches(extract, batch_format="pyarrow", batch_size=None).materialize()

    # --- stage 2: border pairing, hash-partitioned by side key ---------
    # A side key must meet its twin in ONE task, but one task per key would
    # be millions of tiny groups; instead keys hash into P partitions and
    # each partition pairs ALL its keys vectorized (sort + adjacent-compare).
    from gdal_ray.util import default_num_parts
    P = default_num_parts()

    def borders_parted(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t["kind"], 1))
        orient = t["ax"].to_numpy(zero_copy_only=False)
        gx = t["ay"].to_numpy(zero_copy_only=False)
        gy = t["bx"].to_numpy(zero_copy_only=False)
        part = ((orient * 73856093) ^ (gx * 19349663) ^ (gy * 83492791)) % P
        return pa.table({
            "part": pa.array(part.astype(np.int64)),
            "orient": pa.array(orient), "gx": pa.array(gx), "gy": pa.array(gy),
            "value": t["value"], "tx": t["tx"], "ty": t["ty"], "lab": t["lab"],
        })

    def pair_partition(g: pd.DataFrame) -> pd.DataFrame:
        borders = {k: g[k].to_numpy() for k in
                   ("orient", "gx", "gy", "value", "tx", "ty", "lab")}
        pairs = _pair_equivalences(borders)
        if not pairs:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in
                                 ("tx_a", "ty_a", "lab_a", "tx_b", "ty_b", "lab_b")})
        a, b = zip(*pairs)
        a, b = np.asarray(a), np.asarray(b)
        return pd.DataFrame({
            "tx_a": a[:, 0], "ty_a": a[:, 1], "lab_a": a[:, 2],
            "tx_b": b[:, 0], "ty_b": b[:, 1], "lab_b": b[:, 2],
        })

    pairs_ds = (
        pieces.map_batches(borders_parted, batch_format="pyarrow", batch_size=None)
        .groupby("part").map_groups(pair_partition, batch_format="pandas")
    )

    # --- stage 3: union-find over ONLY the equivalence pairs, run as ONE
    # Ray task (pairs are tiny relative to pixels but unbounded at 100-TB
    # scale — the driver holds only the root map's ObjectRef; VERDICT r3
    # item 8)
    map_ref = ray.remote(num_cpus=1)(_polygonize_root_map).remote(
        pairs_ds.to_arrow_refs())

    # --- stage 4: relabel + component stitch, hash-partitioned by root --
    def relabel(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t["kind"], 0))
        rm = ray.get(map_ref)
        keys = zip(t["tx"].to_pylist(), t["ty"].to_pylist(), t["lab"].to_pylist())
        roots = [rm.get(k) or str(k) for k in keys]
        part = pd.util.hash_pandas_object(
            pd.Series(roots), index=False
        ).to_numpy() % np.uint64(P)
        return pa.table({
            "part": pa.array(part.astype(np.int64)),
            "root": pa.array(roots), "value": t["value"],
            "ax": t["ax"], "ay": t["ay"], "bx": t["bx"], "by": t["by"],
        })

    def stitch_partition(g: pd.DataFrame) -> pd.DataFrame:
        import json

        g = g.sort_values("root", kind="mergesort").reset_index(drop=True)
        roots = g["root"].to_numpy()
        bounds = np.concatenate([[0], np.nonzero(roots[1:] != roots[:-1])[0] + 1, [len(g)]])
        arrs = {k: g[k].to_numpy() for k in ("ax", "ay", "bx", "by")}
        vals, rings_out = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            comp = {k: v[s:e] for k, v in arrs.items()}
            rings = _stitch_component(comp, connectivity)
            vals.append(float(g["value"].iloc[s]))
            rings_out.append(json.dumps([np.asarray(r).tolist() for r in rings]))
        return pd.DataFrame({"value": vals, "rings": rings_out})

    stitched = (
        pieces.map_batches(relabel, batch_format="pyarrow", batch_size=None)
        .groupby("part").map_groups(stitch_partition, batch_format="pandas")
    )
    import json

    out = []
    for b in stitched.iter_batches(batch_size=None, batch_format="pyarrow"):
        for v, rj in zip(b["value"].to_pylist(), b["rings"].to_pylist()):
            out.append((v, [np.array(r, dtype=np.float64) for r in json.loads(rj)]))
    return out
