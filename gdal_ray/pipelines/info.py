"""`gdal vector info` / `gdal raster info` analogs — dataset summaries.

Reference: apps/ogrinfo_lib.cpp (layer schema, feature count, extent,
geometry types) and apps/gdalinfo_lib.cpp (size, bands, statistics).
Distributed shape: one vectorized partial row per batch (count, envelope,
type histogram), reduced on the driver — the partials are tiny regardless
of dataset size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vector_info(ds, *, geometry_col: str = "geometry") -> dict:
    """-> {fields, feature_count, extent, geometry_types}. Extent and the
    per-type histogram stream as per-batch partials (no materialization
    of features on the driver)."""
    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.steps import _envelope

    schema = ds.schema()
    fields = list(zip(schema.names, [str(t) for t in schema.types]))
    has_geom = geometry_col in schema.names

    def part(t: pa.Table) -> pa.Table:
        n = len(t)
        if not has_geom or n == 0:
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "x0": pa.array([np.inf]), "y0": pa.array([np.inf]),
                "x1": pa.array([-np.inf]), "y1": pa.array([-np.inf]),
                "types": pa.array(["{}"]),
            })
        x0 = y0 = np.inf
        x1 = y1 = -np.inf
        types: dict = {}
        for b in t[geometry_col].to_pylist():
            if b is None:
                types["NULL"] = types.get("NULL", 0) + 1
                continue
            g = W.parse_wkb(b)
            types[g[0]] = types.get(g[0], 0) + 1
            e = _envelope(g)
            x0, y0 = min(x0, e[0]), min(y0, e[1])
            x1, y1 = max(x1, e[2]), max(y1, e[3])
        import json

        return pa.table({
            "n": pa.array([n], pa.int64()),
            "x0": pa.array([x0]), "y0": pa.array([y0]),
            "x1": pa.array([x1]), "y1": pa.array([y1]),
            "types": pa.array([json.dumps(types)]),
        })

    import json

    parts = ds.map_batches(part, batch_format="pyarrow", batch_size=None)
    n = 0
    ext = [np.inf, np.inf, -np.inf, -np.inf]
    types: dict = {}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        n += int(b["n"].to_numpy().sum())
        ext[0] = min(ext[0], float(b["x0"].to_numpy().min()))
        ext[1] = min(ext[1], float(b["y0"].to_numpy().min()))
        ext[2] = max(ext[2], float(b["x1"].to_numpy().max()))
        ext[3] = max(ext[3], float(b["y1"].to_numpy().max()))
        for s in b["types"].to_pylist():
            for k, v in json.loads(s).items():
                types[k] = types.get(k, 0) + v
    return {
        "fields": fields,
        "feature_count": n,
        "extent": None if not np.isfinite(ext[0]) else tuple(ext),
        "geometry_types": types,
    }


def raster_info(tiles_ds, *, dtype=np.uint32, nodata=None,
                approx_ok: bool = False) -> dict:
    """-> {tile_count, zoom_levels, tile_range, statistics} for a tile
    table (zoom?, tile_x, tile_y, data)."""
    from gdal_ray.stages.raster import band_statistics
    from gdal_ray.util import to_arrow

    def part(t: pa.Table) -> pa.Table:
        has_zoom = "zoom" in t.column_names
        tx = t["tile_x"].to_numpy(zero_copy_only=False)
        ty = t["tile_y"].to_numpy(zero_copy_only=False)
        zs = (t["zoom"].to_numpy(zero_copy_only=False) if has_zoom
              else np.zeros(len(t), np.int64))
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "zmin": pa.array([int(zs.min()) if len(t) else 0], pa.int64()),
            "zmax": pa.array([int(zs.max()) if len(t) else 0], pa.int64()),
            "tx0": pa.array([int(tx.min()) if len(t) else 0], pa.int64()),
            "tx1": pa.array([int(tx.max()) if len(t) else 0], pa.int64()),
            "ty0": pa.array([int(ty.min()) if len(t) else 0], pa.int64()),
            "ty1": pa.array([int(ty.max()) if len(t) else 0], pa.int64()),
        })

    parts = to_arrow(tiles_ds.map_batches(part, batch_format="pyarrow",
                                          batch_size=None))
    stats = to_arrow(band_statistics(tiles_ds, dtype=dtype, nodata=nodata,
                                     approx_ok=approx_ok)).to_pandas()
    return {
        "tile_count": int(parts["n"].to_numpy().sum()),
        "zoom_levels": (int(parts["zmin"].to_numpy().min()),
                        int(parts["zmax"].to_numpy().max())),
        "tile_range": (int(parts["tx0"].to_numpy().min()),
                       int(parts["ty0"].to_numpy().min()),
                       int(parts["tx1"].to_numpy().max()),
                       int(parts["ty1"].to_numpy().max())),
        "statistics": stats.to_dict("records"),
    }
