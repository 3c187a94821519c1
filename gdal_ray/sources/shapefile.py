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


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _wkb_to_shape(g) -> tuple:
    """Parsed WKB geometry -> (shape_type, content bytes after the type
    int). Polygons re-orient rings to the spec (outer CW, holes CCW)."""
    kind = g[0]
    if kind == "point":
        x, y = np.asarray(g[1], np.float64)[0]
        return 1, struct.pack("<dd", float(x), float(y))
    if kind == "multipoint":
        pts = np.concatenate([np.asarray(p[1], np.float64) for p in g[1]])
        return 8, (_bbox(pts) + struct.pack("<i", len(pts))
                   + pts.astype("<f8").tobytes())
    if kind in ("linestring", "multilinestring", "polygon",
                "multipolygon"):
        if kind == "linestring":
            parts = [np.asarray(g[1], np.float64)]
            st = 3
        elif kind == "multilinestring":
            parts = [np.asarray(p[1], np.float64) for p in g[1]]
            st = 3
        else:
            polys = [g] if kind == "polygon" else g[1]
            parts = []
            for p in polys:
                rings = p[1]
                for i, r in enumerate(rings):
                    r = np.asarray(r, np.float64)
                    cw = _ring_area(r) <= 0
                    want_cw = i == 0
                    parts.append(r if cw == want_cw else r[::-1])
            st = 5
        pts = np.concatenate(parts)
        offs = np.cumsum([0] + [len(p) for p in parts[:-1]])
        return st, (_bbox(pts)
                    + struct.pack("<ii", len(parts), len(pts))
                    + np.asarray(offs, "<i4").tobytes()
                    + pts.astype("<f8").tobytes())
    raise ValueError(f"unsupported geometry kind {kind!r}")


def _bbox(pts: np.ndarray) -> bytes:
    return struct.pack("<dddd", pts[:, 0].min(), pts[:, 1].min(),
                       pts[:, 0].max(), pts[:, 1].max())


def write_shapefile(table, path: str) -> None:
    """Write an Arrow table (WKB `geometry` + attribute columns) as
    .shp/.shx/.dbf. All geometries must share a shape type family.
    Attribute typing: ints -> N(18,0), floats -> N(24,15), bools -> L,
    strings -> C(254) (the reference driver's 254-char max)."""
    import os

    import pyarrow as pa

    base = os.path.splitext(path)[0]
    geoms = table["geometry"].to_pylist()
    recs = []
    stype = 0
    gxmin = gymin = np.inf
    gxmax = gymax = -np.inf
    for b in geoms:
        if b is None:
            recs.append((0, b""))
            continue
        st, content = _wkb_to_shape(W.parse_wkb(bytes(b)))
        stype = st
        recs.append((st, content))
        pts = (np.frombuffer(content, "<f8", 2).reshape(1, 2)
               if st == 1 else
               np.frombuffer(content[:32], "<f8", 4).reshape(2, 2))
        gxmin = min(gxmin, pts[:, 0].min())
        gymin = min(gymin, pts[:, 1].min())
        gxmax = max(gxmax, pts[:, 0].max())
        gymax = max(gymax, pts[:, 1].max())
    if not np.isfinite(gxmin):
        gxmin = gymin = gxmax = gymax = 0.0

    shp = bytearray()
    shx = bytearray()
    off_words = 50  # header is 100 bytes = 50 words
    for i, (st, content) in enumerate(recs):
        body = struct.pack("<i", st) + content
        clen = len(body) // 2
        shx += struct.pack(">ii", off_words, clen)
        shp += struct.pack(">ii", i + 1, clen) + body
        off_words += 4 + clen

    def header(total_words: int) -> bytes:
        return (struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words)
                + struct.pack("<ii", 1000, stype)
                + struct.pack("<dddddddd", gxmin, gymin, gxmax, gymax,
                              0, 0, 0, 0))

    with open(base + ".shp", "wb") as f:
        f.write(header(50 + len(shp) // 2) + shp)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + len(shx) // 2) + shx)

    # dbf
    fields = []
    for name in table.column_names:
        if name in ("geometry", "FID"):
            continue
        col = table[name]
        t = col.type
        if pa.types.is_integer(t):
            fields.append((name[:10], "N", 18, 0))
        elif pa.types.is_floating(t):
            fields.append((name[:10], "N", 24, 15))
        elif pa.types.is_boolean(t):
            fields.append((name[:10], "L", 1, 0))
        else:
            fields.append((name[:10], "C", 254, 0))
    nrec = table.num_rows
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<BBBBIHH", 3, 95, 1, 1, nrec, hdr_size, rec_size)
    out += b"\x00" * 20
    for name, ftype, flen, fdec in fields:
        out += name.encode("latin-1").ljust(11, b"\x00")
        out += ftype.encode() + b"\x00" * 4
        out += bytes([flen, fdec]) + b"\x00" * 14
    out += b"\x0d"
    for r in range(nrec):
        out += b" "
        for name, ftype, flen, fdec in fields:
            src = table[[c for c in table.column_names
                         if c[:10] == name][0]][r].as_py()
            if src is None:
                out += b" " * flen
            elif ftype == "N":
                s = (f"{src:.{fdec}f}" if fdec else str(int(src)))
                out += s.rjust(flen)[:flen].encode("latin-1")
            elif ftype == "L":
                out += b"T" if src else b"F"
            else:
                out += str(src).ljust(flen)[:flen].encode("latin-1")
    out += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(out)
