"""ESRI Shapefile reader — the reference's flagship vector driver
(ogr/ogrsf_frmts/shape), from scratch.

Parses the .shp geometry file (Point / MultiPoint / PolyLine / Polygon,
plus their Z/M variants with Z kept and M dropped) and the .dbf
attribute table (C/N/F/L/D field types) into one Arrow table with a WKB
`geometry` column — the engine's native geometry convention — and typed
attribute columns. Polygon ring assembly follows the spec: outer rings
are clockwise (negative signed area in y-up coordinates), holes
counter-clockwise and assigned to the outer ring containing their first
vertex; multiple outers become a MultiPolygon. Validated against the
reference's own poly.shp fixture and the attribute/geometry expectations
of autotest/ogr/ogr_shape.py. Reader only — the engine's write path is
GeoParquet/GeoJSON (sources/geoparquet.py, text.py)."""

from __future__ import annotations

import struct

import numpy as np

from gdal_ray.geo import wkb as W


def _ring_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    x, y = pt
    xs, ys = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    cond = (ys > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = xs + (y - ys) / (y2 - ys) * (x2 - xs)
    return bool(np.count_nonzero(cond & (x < xin)) % 2)


def _assemble_polygon(rings: list) -> bytes:
    outers = [r for r in rings if _ring_area(r) <= 0]  # CW in y-up
    holes = [r for r in rings if _ring_area(r) > 0]
    if not outers:         # degenerate: treat every ring as an outer
        outers, holes = rings, []
    groups = [[o] for o in outers]
    for hole in holes:
        placed = False
        for g in groups:
            if _point_in_ring(hole[0], g[0]):
                g.append(hole)
                placed = True
                break
        if not placed:
            groups[0].append(hole)
    if len(groups) == 1:
        return W.encode_polygon(groups[0])
    return W.encode_multi(
        "multipolygon", [W.encode_polygon(g) for g in groups])


def _shape_to_wkb(stype: int, rec: bytes):
    base = stype % 10  # Z (11..18) / M (21..28) variants share layouts
    if stype == 0:
        return None
    if base == 1:  # Point
        x, y = struct.unpack("<dd", rec[4:20])
        return W.encode_point(x, y)
    if base == 8:  # MultiPoint
        (n,) = struct.unpack("<i", rec[36:40])
        pts = np.frombuffer(rec, "<f8", 2 * n, 40).reshape(n, 2)
        return W.encode_multi(
            "multipoint", [W.encode_point(x, y) for x, y in pts])
    if base in (3, 5):  # PolyLine / Polygon
        nparts, npts = struct.unpack("<ii", rec[36:44])
        parts = np.frombuffer(rec, "<i4", nparts, 44)
        pts = np.frombuffer(rec, "<f8", 2 * npts,
                            44 + 4 * nparts).reshape(npts, 2)
        bounds = list(parts) + [npts]
        rings = [pts[bounds[i]:bounds[i + 1]].astype(np.float64)
                 for i in range(nparts)]
        if base == 3:
            if len(rings) == 1:
                return W.encode_linestring(rings[0])
            return W.encode_multi(
                "multilinestring",
                [W.encode_linestring(r) for r in rings])
        return _assemble_polygon(rings)
    raise ValueError(f"unsupported shape type {stype}")


def _read_dbf(path: str):
    """Parse a dBASE III .dbf into {name: list} typed columns."""
    buf = open(path, "rb").read()
    nrec, hdr_size, rec_size = struct.unpack("<IHH", buf[4:12])
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    cols: dict = {name: [] for name, *_ in fields}
    p = hdr_size
    for _ in range(nrec):
        rec = buf[p:p + rec_size]
        p += rec_size
        if rec[:1] == b"*":  # deleted
            continue
        fp = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[fp:fp + flen].decode("latin-1").strip()
            fp += flen
            if ftype in ("N", "F"):
                if raw in ("", "*" * flen):
                    v = None
                elif fdec > 0 or ftype == "F" or "." in raw:
                    v = float(raw)
                else:
                    v = int(raw)
            elif ftype == "L":
                v = (True if raw in "TtYy" else
                     False if raw in "FfNn" else None)
            else:  # C, D and anything else: text
                v = raw or None
            cols[name].append(v)
    return cols


def read_shapefile_table(path: str):
    """Read .shp (+ sibling .dbf) into one pyarrow Table: FID, WKB
    geometry, typed attributes."""
    import os

    import pyarrow as pa

    buf = open(path, "rb").read()
    (code,) = struct.unpack(">i", buf[:4])
    if code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    (flen,) = struct.unpack(">i", buf[24:28])
    end = flen * 2
    geoms, fids = [], []
    off = 100
    while off < end:
        rec_no, clen = struct.unpack(">ii", buf[off:off + 8])
        content = buf[off + 8:off + 8 + clen * 2]
        (stype,) = struct.unpack("<i", content[:4])
        geoms.append(_shape_to_wkb(stype, content))
        fids.append(rec_no - 1)  # shapefile records are 1-based
        off += 8 + clen * 2
    cols = {"FID": pa.array(fids, pa.int64()),
            "geometry": pa.array(geoms, pa.binary())}
    dbf = os.path.splitext(path)[0] + ".dbf"
    if not os.path.exists(dbf):
        dbf = os.path.splitext(path)[0] + ".DBF"
    if os.path.exists(dbf):
        for name, vals in _read_dbf(dbf).items():
            cols[name] = pa.array(vals)
    return pa.table(cols)


def read_shapefile(path: str, **kwargs):
    """Driver entry: .shp -> Dataset (one read on the driver —
    shapefiles are a fixture/exchange format; big vector data lives in
    GeoParquet)."""
    import ray.data as rd

    return rd.from_arrow(read_shapefile_table(path))
