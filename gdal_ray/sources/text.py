"""CSV and GeoJSON sources/sinks — the reference's two most common text
entry paths, restated Ray-Data-first.

Reference semantics:
* CSV driver (ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp): schema/type inference,
  X_POSSIBLE_NAMES / Y_POSSIBLE_NAMES point building, and a WKT geometry
  column (GEOM_POSSIBLE_NAMES) parsed to real geometry. Here: Ray's native
  `read_csv` (Arrow CSV, streaming + parallel across files) plus a
  vectorized geometry-building map_batches.
* GeoJSON driver (ogr/ogrsf_frmts/geojson): FeatureCollection -> features
  with properties + geometry. GeoJSON is one JSON document, so (like the
  reference) a file parses in one task; many files parallelize via
  read_binary_files -> flat parse per file.

Geometry lands in the repo-wide model: a `geometry` binary column of WKB
(gdal_ray.geo.wkb) — every downstream step (filter/clip/reproject/...)
applies unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# OGR CSV driver's default coordinate-column candidates
# (ogrcsvdatasource.cpp X_POSSIBLE_NAMES default behavior)
X_POSSIBLE_NAMES = ("lon", "longitude", "x", "lng", "long")
Y_POSSIBLE_NAMES = ("lat", "latitude", "y")
GEOM_POSSIBLE_NAMES = ("wkt", "geometry", "geom", "the_geom")


def _build_point_geometry(t: pa.Table, xc: str, yc: str) -> pa.Table:
    from gdal_ray.geo import wkb as W

    lon = np.asarray(t[xc].to_numpy(zero_copy_only=False), np.float64)
    lat = np.asarray(t[yc].to_numpy(zero_copy_only=False), np.float64)
    return t.append_column("geometry", pa.array(W.encode_points(lon, lat),
                                                pa.binary()))


def _build_wkt_geometry(t: pa.Table, gc: str) -> pa.Table:
    from gdal_ray.geo import wkb as W

    out = [
        None if s is None else W.geom_to_wkb(W.wkt_to_geom(s))
        for s in t[gc].to_pylist()
    ]
    if gc != "geometry":
        t = t.append_column("geometry", pa.array(out, pa.binary()))
        return t
    i = t.column_names.index(gc)
    return t.set_column(i, "geometry", pa.array(out, pa.binary()))


def read_csv(paths, *, geometry: str = "auto", x_col: str | None = None,
             y_col: str | None = None, wkt_col: str | None = None, **kwargs):
    """CSV -> Dataset with optional geometry building.

    geometry: 'auto' probes X/Y_POSSIBLE_NAMES then GEOM_POSSIBLE_NAMES
    (case-insensitive, like the OGR CSV driver); 'none' leaves the table
    as-is; 'point' requires x_col/y_col; 'wkt' requires wkt_col.
    Schema/type inference is Arrow CSV's (the OGR driver's autodetect
    analog); extra kwargs pass through to ray.data.read_csv."""
    import ray.data as rd

    ds = rd.read_csv(paths, **kwargs)
    if geometry == "none":
        return ds
    names = {c.lower(): c for c in ds.schema().names}
    if geometry == "auto":
        x_col = x_col or next((names[c] for c in X_POSSIBLE_NAMES if c in names), None)
        y_col = y_col or next((names[c] for c in Y_POSSIBLE_NAMES if c in names), None)
        wkt_col = wkt_col or next((names[c] for c in GEOM_POSSIBLE_NAMES if c in names), None)
        if x_col and y_col:
            geometry = "point"
        elif wkt_col:
            geometry = "wkt"
        else:
            return ds
    if geometry == "point":
        if not (x_col and y_col):
            raise ValueError("geometry='point' needs x_col and y_col")
        return ds.map_batches(
            lambda t, xc=x_col, yc=y_col: _build_point_geometry(t, xc, yc),
            batch_format="pyarrow", batch_size=None)
    if geometry == "wkt":
        if not wkt_col:
            raise ValueError("geometry='wkt' needs wkt_col")
        return ds.map_batches(
            lambda t, gc=wkt_col: _build_wkt_geometry(t, gc),
            batch_format="pyarrow", batch_size=None)
    raise ValueError(f"unknown geometry mode {geometry!r}")


def _geojson_geom_to_internal(g: dict):
    """GeoJSON geometry dict -> the repo's (kind, coords) model."""
    ty = g["type"]
    c = g.get("coordinates")
    if ty == "Point":
        return ("point", np.asarray([c], np.float64))
    if ty == "MultiPoint":
        return ("multipoint", [("point", np.asarray([p], np.float64)) for p in c])
    if ty == "LineString":
        return ("linestring", np.asarray(c, np.float64))
    if ty == "MultiLineString":
        return ("multilinestring",
                [("linestring", np.asarray(l, np.float64)) for l in c])
    if ty == "Polygon":
        return ("polygon", [np.asarray(r, np.float64) for r in c])
    if ty == "MultiPolygon":
        return ("multipolygon",
                [("polygon", [np.asarray(r, np.float64) for r in p]) for p in c])
    if ty == "GeometryCollection":
        return ("geometrycollection",
                [_geojson_geom_to_internal(sub) for sub in g["geometries"]])
    raise ValueError(f"unsupported GeoJSON geometry {ty}")


def _internal_to_geojson_geom(g) -> dict:
    kind, body = g
    if kind == "point":
        return {"type": "Point", "coordinates": [float(body[0][0]), float(body[0][1])]}
    if kind == "linestring":
        return {"type": "LineString", "coordinates": np.asarray(body).tolist()}
    if kind == "polygon":
        return {"type": "Polygon", "coordinates": [np.asarray(r).tolist() for r in body]}
    if kind == "multipoint":
        return {"type": "MultiPoint",
                "coordinates": [[float(p[1][0][0]), float(p[1][0][1])] for p in body]}
    if kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [np.asarray(p[1]).tolist() for p in body]}
    if kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[np.asarray(r).tolist() for r in p[1]] for p in body]}
    if kind == "geometrycollection":
        return {"type": "GeometryCollection",
                "geometries": [_internal_to_geojson_geom(p) for p in body]}
    raise ValueError(kind)


def _parse_geojson_bytes(data: bytes) -> pa.Table:
    import json

    from gdal_ray.geo import wkb as W

    doc = json.loads(data)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    prop_keys: list[str] = []
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in prop_keys:
                prop_keys.append(k)
    cols: dict = {k: [] for k in prop_keys}
    geoms = []
    for f in feats:
        props = f.get("properties") or {}
        for k in prop_keys:
            cols[k].append(props.get(k))
        g = f.get("geometry")
        geoms.append(None if g is None
                     else W.geom_to_wkb(_geojson_geom_to_internal(g)))
    out = {k: pa.array(v) for k, v in cols.items()}
    out["geometry"] = pa.array(geoms, pa.binary())
    return pa.table(out)


def read_geojson(paths):
    """GeoJSON file(s) -> Dataset (properties + WKB geometry). Each file
    parses in one task (a GeoJSON FeatureCollection is one JSON document —
    same unit of work as the reference driver); many files parallelize."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        tables = [_parse_geojson_bytes(b) for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="permissive")

    return files.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_geojson(ds, path: str, *, geometry_col: str = "geometry") -> int:
    """Dataset -> one GeoJSON FeatureCollection file (small results — a
    GeoJSON file is a single JSON document by definition; use GeoParquet
    for large outputs). Returns the feature count."""
    import json

    from gdal_ray.geo import wkb as W
    from gdal_ray.util import to_arrow

    t = to_arrow(ds)
    feats = []
    prop_cols = [c for c in t.column_names if c != geometry_col]
    for i in range(t.num_rows):
        props = {c: t[c][i].as_py() for c in prop_cols}
        b = t[geometry_col][i].as_py() if geometry_col in t.column_names else None
        geom = None if b is None else _internal_to_geojson_geom(W.parse_wkb(b))
        feats.append({"type": "Feature", "properties": props, "geometry": geom})
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return len(feats)
