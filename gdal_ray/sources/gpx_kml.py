"""GPX and KML vector drivers (stdlib XML only — no new dependencies).

Reference behavior: GDAL's GPX driver (ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp)
exposes waypoints / routes / tracks layers; the LIBKML/KML drivers
(ogr/ogrsf_frmts/kml/kml2ogrgeometry.cpp) map <Placemark> geometry +
<ExtendedData> to features. The Ray restatement keeps ONE table per file
set with a `layer` column (waypoints|routes|tracks for GPX) and the usual
WKB `geometry` column, so every downstream stage (reproject, PIP join,
SQL) composes unchanged.

Scale shape: one XML document parses in one task (same unit of work as the
reference driver — an XML file is not splittable without an index); many
files parallelize through read_binary_files. Writers emit ONE document from
a materialized table — suited to result export, like write_geojson; use
GeoParquet for large outputs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa


def _local(tag: str) -> str:
    """Strip the XML namespace — version-agnostic (GPX 1.0/1.1, KML 2.x)."""
    return tag.rsplit("}", 1)[-1]


def _children(el, name):
    return [c for c in el if _local(c.tag) == name]


def _child_text(el, name):
    for c in el:
        if _local(c.tag) == name:
            return (c.text or "").strip()
    return None


# ---------------------------------------------------------------------------
# GPX
# ---------------------------------------------------------------------------


def _parse_gpx_bytes(data: bytes) -> pa.Table:
    from gdal_ray.geo import wkb as W

    root = ET.fromstring(data)
    layers, names, eles, times, geoms = [], [], [], [], []

    def point_of(el):
        return float(el.get("lon")), float(el.get("lat"))

    for w in _children(root, "wpt"):
        lon, lat = point_of(w)
        layers.append("waypoints")
        names.append(_child_text(w, "name"))
        e = _child_text(w, "ele")
        eles.append(float(e) if e else None)
        times.append(_child_text(w, "time"))
        geoms.append(W.encode_point(lon, lat))
    for r in _children(root, "rte"):
        pts = [point_of(p) for p in _children(r, "rtept")]
        if not pts:
            continue
        layers.append("routes")
        names.append(_child_text(r, "name"))
        eles.append(None)
        times.append(None)
        geoms.append(W.encode_linestring(np.asarray(pts, np.float64)))
    for t in _children(root, "trk"):
        # one MULTILINESTRING per track, one part per <trkseg> — the
        # reference's tracks layer shape
        parts = []
        for seg in _children(t, "trkseg"):
            pts = [point_of(p) for p in _children(seg, "trkpt")]
            if pts:
                parts.append(
                    W.encode_linestring(np.asarray(pts, np.float64)))
        if not parts:
            continue
        layers.append("tracks")
        names.append(_child_text(t, "name"))
        eles.append(None)
        times.append(None)
        geoms.append(W.encode_multi("multilinestring", parts))
    return pa.table({
        "layer": pa.array(layers, pa.string()),
        "name": pa.array(names, pa.string()),
        "ele": pa.array(eles, pa.float64()),
        "time": pa.array(times, pa.string()),
        "geometry": pa.array(geoms, pa.binary()),
    })


def read_gpx(paths, **_kw):
    """GPX file(s) -> Dataset(layer, name, ele, time, geometry WKB).
    waypoints -> POINT, routes -> LINESTRING, tracks -> MULTILINESTRING
    (one part per trkseg)."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        tables = [_parse_gpx_bytes(b) for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="permissive")

    return files.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_gpx(ds, path: str, *, geometry_col: str = "geometry",
              name_col: str | None = "name") -> int:
    """Dataset -> one GPX 1.1 document. POINT rows become <wpt>,
    LINESTRING rows <rte>, MULTILINESTRING rows <trk> (one <trkseg> per
    part). Returns the feature count."""
    from gdal_ray.geo import wkb as W
    from gdal_ray.util import to_arrow

    t = to_arrow(ds)
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<gpx version="1.1" creator="gdal_ray" '
           'xmlns="http://www.topografix.com/GPX/1/1">']
    n = 0

    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    for i in range(t.num_rows):
        b = t[geometry_col][i].as_py()
        if b is None:
            continue
        kind, body = W.parse_wkb(b)
        nm = None
        if name_col and name_col in t.column_names:
            nm = t[name_col][i].as_py()
        tag_name = f"<name>{esc(nm)}</name>" if nm is not None else ""
        if kind == "point":
            out.append(f'<wpt lat="{float(body[0][1])!r}" lon="{float(body[0][0])!r}">'
                       f'{tag_name}</wpt>')
        elif kind == "linestring":
            pts = "".join(f'<rtept lat="{float(p[1])!r}" lon="{float(p[0])!r}"/>'
                          for p in np.asarray(body))
            out.append(f"<rte>{tag_name}{pts}</rte>")
        elif kind == "multilinestring":
            segs = "".join(
                "<trkseg>" + "".join(
                    f'<trkpt lat="{float(p[1])!r}" lon="{float(p[0])!r}"/>'
                    for p in np.asarray(part[1])) + "</trkseg>"
                for part in body)
            out.append(f"<trk>{tag_name}{segs}</trk>")
        else:
            raise ValueError(f"GPX cannot represent {kind} geometry")
        n += 1
    out.append("</gpx>")
    with open(path, "w") as f:
        f.write("\n".join(out))
    return n


# ---------------------------------------------------------------------------
# KML
# ---------------------------------------------------------------------------


def _kml_coords(text: str) -> np.ndarray:
    """KML coordinate string 'lon,lat[,alt] ...' -> (n, 2) lon/lat array."""
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, np.float64)


def _kml_geom_to_internal(el):
    k = _local(el.tag)
    if k == "Point":
        c = _kml_coords(_child_text(el, "coordinates"))
        return ("point", c[:1])
    if k == "LineString":
        return ("linestring", _kml_coords(_child_text(el, "coordinates")))
    if k == "Polygon":
        rings = []
        for bname in ("outerBoundaryIs", "innerBoundaryIs"):
            for b in _children(el, bname):
                for ring in _children(b, "LinearRing"):
                    rings.append(
                        _kml_coords(_child_text(ring, "coordinates")))
        return ("polygon", rings)
    if k == "MultiGeometry":
        subs = [_kml_geom_to_internal(c) for c in el
                if _local(c.tag) in ("Point", "LineString", "Polygon",
                                     "MultiGeometry")]
        return ("geometrycollection", subs)
    raise ValueError(f"unsupported KML geometry {k}")


def _iter_placemarks(el):
    if _local(el.tag) == "Placemark":
        yield el
        return
    for c in el:
        yield from _iter_placemarks(c)


def _parse_kml_bytes(data: bytes) -> pa.Table:
    from gdal_ray.geo import wkb as W

    root = ET.fromstring(data)
    rows = []
    ext_keys: list[str] = []
    for pm in _iter_placemarks(root):
        props = {"name": _child_text(pm, "name"),
                 "description": _child_text(pm, "description")}
        for ed in _children(pm, "ExtendedData"):
            for d in ed:
                ln = _local(d.tag)
                if ln == "Data":
                    key = d.get("name")
                    props[key] = _child_text(d, "value")
                elif ln == "SchemaData":
                    for sd in _children(d, "SimpleData"):
                        props[sd.get("name")] = (sd.text or "").strip()
        for k in props:
            if k not in ("name", "description") and k not in ext_keys:
                ext_keys.append(k)
        geom = None
        for c in pm:
            if _local(c.tag) in ("Point", "LineString", "Polygon",
                                 "MultiGeometry"):
                geom = W.geom_to_wkb(_kml_geom_to_internal(c))
                break
        rows.append((props, geom))
    cols: dict = {"name": [], "description": []}
    for k in ext_keys:
        cols[k] = []
    geoms = []
    for props, geom in rows:
        for k in cols:
            cols[k].append(props.get(k))
        geoms.append(geom)
    out = {k: pa.array(v, pa.string()) for k, v in cols.items()}
    out["geometry"] = pa.array(geoms, pa.binary())
    return pa.table(out)


def read_kml(paths, **_kw):
    """KML file(s) -> Dataset(name, description, <ExtendedData fields>,
    geometry WKB). Placemarks anywhere in the Folder/Document tree."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        tables = [_parse_kml_bytes(b) for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="permissive")

    return files.map_batches(parse, batch_format="pyarrow", batch_size=None)


def _internal_to_kml(g) -> str:
    kind, body = g

    def coords(arr):
        return " ".join(f"{float(p[0])!r},{float(p[1])!r}"
                        for p in np.asarray(arr))

    if kind == "point":
        return (f"<Point><coordinates>{coords(body[:1])}"
                "</coordinates></Point>")
    if kind == "linestring":
        return (f"<LineString><coordinates>{coords(body)}"
                "</coordinates></LineString>")
    if kind == "polygon":
        parts = []
        for i, ring in enumerate(body):
            b = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            parts.append(f"<{b}><LinearRing><coordinates>{coords(ring)}"
                         f"</coordinates></LinearRing></{b}>")
        return "<Polygon>" + "".join(parts) + "</Polygon>"
    if kind in ("multipoint", "multilinestring", "multipolygon",
                "geometrycollection"):
        subs = "".join(_internal_to_kml(p) for p in body)
        return f"<MultiGeometry>{subs}</MultiGeometry>"
    raise ValueError(kind)


def write_kml(ds, path: str, *, geometry_col: str = "geometry") -> int:
    """Dataset -> one KML document (a <Placemark> per row; non-geometry
    columns become <ExtendedData><Data>). Returns the feature count."""
    from gdal_ray.geo import wkb as W
    from gdal_ray.util import to_arrow

    t = to_arrow(ds)

    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    prop_cols = [c for c in t.column_names if c != geometry_col]
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>']
    n = 0
    for i in range(t.num_rows):
        parts = ["<Placemark>"]
        for c in prop_cols:
            v = t[c][i].as_py()
            if c == "name":
                if v is not None:
                    parts.append(f"<name>{esc(v)}</name>")
            elif v is not None:
                parts.append(f'<ExtendedData><Data name="{esc(c)}">'
                             f"<value>{esc(v)}</value></Data></ExtendedData>")
        b = t[geometry_col][i].as_py() if geometry_col in t.column_names \
            else None
        if b is not None:
            parts.append(_internal_to_kml(W.parse_wkb(b)))
        parts.append("</Placemark>")
        out.append("".join(parts))
        n += 1
    out.append("</Document></kml>")
    with open(path, "w") as f:
        f.write("\n".join(out))
    return n
