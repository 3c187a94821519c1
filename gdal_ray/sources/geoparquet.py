"""GeoParquet-compatible write + bbox-pruned read.

Reference: the parquet driver's writer emits `geo` file metadata (version,
primary_column, per-column encoding/bbox) and an optional bbox covering
struct column used for spatial row-group pruning
(ogr/ogrsf_frmts/parquet/ogrparquetwriterlayer.cpp:360-384 geo metadata,
:631-643 bbox struct {xmin,ymin,xmax,ymax}). Restated Ray-Data-first:

* write: a map_batches stage appends the per-row bbox struct, stamps the
  GeoParquet 1.1 `geo` schema metadata, and writes one fragment per block
  (parquet column statistics on bbox.xmin/... are what make read-side
  row-group pruning work).
* read: ray.data.read_parquet with a pyarrow dataset filter over the nested
  bbox fields — only row groups whose bbox statistics intersect the query
  window leave storage.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from gdal_ray.geo import wkb as W

_POINT_LEN = 21


def _row_envelopes(wkbs: list) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-row WKB envelopes. Fast path: homogeneous little-endian 2-D
    points decode as one byte matrix; otherwise per-row parse."""
    n = len(wkbs)
    if n and all(b is not None and len(b) == _POINT_LEN and b[0] == 1 for b in wkbs):
        lon, lat = W.decode_points(wkbs)
        return lon, lat, lon.copy(), lat.copy()
    from gdal_ray.pipelines.steps import _envelope

    mins_x = np.empty(n); mins_y = np.empty(n)
    maxs_x = np.empty(n); maxs_y = np.empty(n)
    for i, b in enumerate(wkbs):
        if b is None:
            mins_x[i] = mins_y[i] = maxs_x[i] = maxs_y[i] = np.nan
            continue
        x0, y0, x1, y1 = _envelope(W.parse_wkb(b))
        mins_x[i], mins_y[i], maxs_x[i], maxs_y[i] = x0, y0, x1, y1
    return mins_x, mins_y, maxs_x, maxs_y


def add_bbox_column(ds, geometry_col: str = "geometry", out: str = "bbox"):
    """Append the GeoParquet covering struct column
    bbox: struct<xmin,ymin,xmax,ymax> (all float64)."""

    def f(t: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = _row_envelopes(t[geometry_col].to_pylist())
        st = pa.StructArray.from_arrays(
            [pa.array(x0), pa.array(y0), pa.array(x1), pa.array(y1)],
            names=["xmin", "ymin", "xmax", "ymax"],
        )
        if out in t.column_names:
            t = t.drop_columns([out])
        return t.append_column(out, st)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def _geo_metadata(geometry_col: str, bbox: list[float] | None) -> bytes:
    meta = {
        "version": "1.1.0",
        "primary_column": geometry_col,
        "columns": {
            geometry_col: {
                "encoding": "WKB",
                "geometry_types": [],
                "covering": {
                    "bbox": {
                        "xmin": ["bbox", "xmin"],
                        "ymin": ["bbox", "ymin"],
                        "xmax": ["bbox", "xmax"],
                        "ymax": ["bbox", "ymax"],
                    }
                },
            }
        },
    }
    if bbox is not None:
        meta["columns"][geometry_col]["bbox"] = bbox
    return json.dumps(meta).encode()


def write_geoparquet(ds, path: str, *, geometry_col: str = "geometry",
                     row_group_size: int | None = None):
    """Write a Dataset with a WKB geometry column as GeoParquet: bbox
    covering column + `geo` file metadata, one fragment per block (streaming
    — no driver materialization). Returns a Dataset of (path, rows)
    manifest rows; consume it (e.g. .count()) to drive the write."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = _row_envelopes(t[geometry_col].to_pylist())
        st = pa.StructArray.from_arrays(
            [pa.array(x0), pa.array(y0), pa.array(x1), pa.array(y1)],
            names=["xmin", "ymin", "xmax", "ymax"],
        )
        if "bbox" in t.column_names:
            t = t.drop_columns(["bbox"])
        t = t.append_column("bbox", st)
        file_bbox = None
        if len(t):
            file_bbox = [float(np.nanmin(x0)), float(np.nanmin(y0)),
                         float(np.nanmax(x1)), float(np.nanmax(y1))]
        meta = dict(t.schema.metadata or {})
        meta[b"geo"] = _geo_metadata(geometry_col, file_bbox)
        t = t.replace_schema_metadata(meta)
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
        tmp = fname + ".tmp"
        pq.write_table(t, tmp, row_group_size=row_group_size)
        os.replace(tmp, fname)
        return pa.table({"path": [fname], "rows": pa.array([len(t)], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def write_geoparquet_resumable(ds, out_dir: str, partition_col: str,
                               *, geometry_col: str = "geometry"):
    """Resumable partitioned GeoParquet: the lineage-manifest writer
    (state.manifest — atomic fragments, skip-completed-keys resume) with
    per-fragment `geo` metadata + bbox covering column attached just before
    write. Restart-safe 100-TB output layout with spatial pruning intact.
    Returns the manifest Dataset; fragments live under out_dir/parts."""

    def prepare(t: pa.Table) -> pa.Table:
        # bbox computed HERE (Arrow-side, post-shuffle) — a pre-added struct
        # column would break the manifest's pandas row-sort checksum
        x0, y0, x1, y1 = _row_envelopes(t[geometry_col].to_pylist())
        st = pa.StructArray.from_arrays(
            [pa.array(x0), pa.array(y0), pa.array(x1), pa.array(y1)],
            names=["xmin", "ymin", "xmax", "ymax"],
        )
        if "bbox" in t.column_names:
            t = t.drop_columns(["bbox"])
        t = t.append_column("bbox", st)
        file_bbox = None
        if len(t):
            file_bbox = [float(np.nanmin(x0)), float(np.nanmin(y0)),
                         float(np.nanmax(x1)), float(np.nanmax(y1))]
        meta = dict(t.schema.metadata or {})
        meta[b"geo"] = _geo_metadata(geometry_col, file_bbox)
        return t.replace_schema_metadata(meta)

    from gdal_ray.state.manifest import write_partitioned_resumable

    return write_partitioned_resumable(ds, out_dir, partition_col, prepare=prepare)


def read_geoparquet(path: str, *, bbox: tuple[float, float, float, float] | None = None,
                    columns: list[str] | None = None):
    """Read GeoParquet with spatial pushdown: the bbox window becomes a
    pyarrow dataset filter on the covering struct's leaves, so parquet
    row-group statistics prune before any geometry is decoded."""
    import ray.data as rd

    kw = {}
    if columns is not None:
        kw["columns"] = list(columns)
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        flt = (
            (pc.field("bbox", "xmin") <= maxx)
            & (pc.field("bbox", "xmax") >= minx)
            & (pc.field("bbox", "ymin") <= maxy)
            & (pc.field("bbox", "ymax") >= miny)
        )
        kw["filter"] = flt
    return rd.read_parquet(path, **kw)


def read_geo_metadata(path: str) -> dict | None:
    """The parsed `geo` metadata of a GeoParquet file/directory (first
    fragment)."""
    if os.path.isdir(path):
        frags = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not frags:
            return None
        path = frags[0]
    meta = pq.read_schema(path).metadata or {}
    raw = meta.get(b"geo")
    return json.loads(raw) if raw else None
