"""WKB / WKT codec from scratch.

Geometry columns are WKB `binary` (GDAL's Arrow export convention:
ARROW:extension:name=ogc.wkb, ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:3315,
type codes ogr/ogr_core.h:422-457: Point=1 LineString=2 Polygon=3
MultiPoint=4 MultiLineString=5 MultiPolygon=6 GeometryCollection=7).

Point encode/decode is fully vectorized (the hot path: billions of page
points). Polygon/linestring parse is per-feature (only ever used on small
broadcast sides and oracle fixtures).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_POINT_LEN = 21  # 1 + 4 + 8 + 8


def encode_points(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    """Vectorized point WKB: build one (n, 21) byte matrix, split to rows."""
    n = lon.shape[0]
    buf = np.empty((n, _POINT_LEN), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1:5] = np.frombuffer(
        np.full(n, WKB_POINT, dtype="<u4").tobytes(), dtype=np.uint8
    ).reshape(n, 4)
    buf[:, 5:13] = lon.astype("<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = lat.astype("<f8").view(np.uint8).reshape(n, 8)
    return [row.tobytes() for row in buf]


def decode_points(wkbs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a homogeneous point-WKB column (binary array or
    list of bytes) -> (lon, lat). Zero Python per-row parsing: the column is
    one contiguous byte matrix."""
    if hasattr(wkbs, "to_numpy"):  # pyarrow array
        raw = b"".join(wkbs.to_pylist())
    else:
        raw = b"".join(wkbs)
    n = len(raw) // _POINT_LEN
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(n, _POINT_LEN)
    lon = mat[:, 5:13].copy().view("<f8").ravel()
    lat = mat[:, 13:21].copy().view("<f8").ravel()
    return lon, lat


# -- generic (small-side) geometry parse: nested (type, parts) tuples --------


def _parse(buf: bytes, off: int):
    little = buf[off] == 1
    bo = "<" if little else ">"
    raw_type = struct.unpack_from(bo + "I", buf, off + 1)[0]
    # EWKB dimension/SRID flags (0x80000000 Z, 0x40000000 M, 0x20000000 SRID)
    # and ISO 1000/2000/3000-series codes would shift every byte offset below;
    # refuse loudly instead of misreading Z doubles as coordinates.
    if raw_type & 0xE0000000:
        raise ValueError(
            f"EWKB Z/M/SRID-flagged geometry (type word 0x{raw_type:08x}) unsupported: "
            "only 2-D WKB is handled"
        )
    if raw_type >= 1000:
        raise ValueError(
            f"ISO WKB Z/M geometry (type code {raw_type}) unsupported: only 2-D WKB is handled"
        )
    gtype = raw_type & 0xFF
    off += 5
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(bo + "2d", buf, off)
        return ("point", np.array([[x, y]])), off + 16
    if gtype in (WKB_LINESTRING,):
        (npts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype=bo + "f8", count=npts * 2, offset=off).reshape(npts, 2)
        return ("linestring", pts.copy()), off + npts * 16
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            pts = np.frombuffer(buf, dtype=bo + "f8", count=npts * 2, offset=off).reshape(npts, 2)
            rings.append(pts.copy())
            off += npts * 16
        return ("polygon", rings), off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        (ngeom,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(ngeom):
            g, off = _parse(buf, off)
            parts.append(g)
        kind = {4: "multipoint", 5: "multilinestring", 6: "multipolygon", 7: "geometrycollection"}[gtype]
        return (kind, parts), off
    raise ValueError(f"unsupported wkb type {gtype}")


def parse_wkb(buf: bytes):
    g, _ = _parse(buf, 0)
    return g


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    out = [b"\x01", struct.pack("<I", WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        out.append(struct.pack("<I", len(ring)))
        out.append(np.asarray(ring, dtype="<f8").tobytes())
    return b"".join(out)


def encode_linestring(pts: np.ndarray) -> bytes:
    return b"".join(
        [b"\x01", struct.pack("<I", WKB_LINESTRING), struct.pack("<I", len(pts)),
         np.asarray(pts, dtype="<f8").tobytes()]
    )


def encode_multi(kind: str, parts: list[bytes]) -> bytes:
    code = {"multipoint": 4, "multilinestring": 5, "multipolygon": 6, "geometrycollection": 7}[kind]
    return b"".join([b"\x01", struct.pack("<I", code), struct.pack("<I", len(parts))] + parts)


def encode_point(x: float, y: float) -> bytes:
    return b"\x01" + struct.pack("<I", WKB_POINT) + struct.pack("<2d", x, y)


# -- WKT (tests / oracle fixtures only) --------------------------------------


def _fmt_coord(v: float) -> str:
    if v == int(v):
        return str(int(v))
    return repr(v)


def geom_to_wkt(g) -> str:
    kind, data = g
    if kind == "point":
        return f"POINT ({_fmt_coord(data[0][0])} {_fmt_coord(data[0][1])})"
    if kind == "linestring":
        inner = ",".join(f"{_fmt_coord(x)} {_fmt_coord(y)}" for x, y in data)
        return f"LINESTRING ({inner})"
    if kind == "polygon":
        rings = ",".join(
            "(" + ",".join(f"{_fmt_coord(x)} {_fmt_coord(y)}" for x, y in ring) + ")"
            for ring in data
        )
        return f"POLYGON ({rings})"
    if kind == "multipoint":
        inner = ",".join(
            "(" + f"{_fmt_coord(p[1][0][0])} {_fmt_coord(p[1][0][1])}" + ")" for p in data
        )
        return f"MULTIPOINT ({inner})"
    if kind in ("multilinestring", "multipolygon", "geometrycollection"):
        inner = ",".join(geom_to_wkt(p) if kind == "geometrycollection" else
                         geom_to_wkt(p).split(" ", 1)[1] for p in data)
        return f"{kind.upper()} ({inner})"
    raise ValueError(kind)


def wkt_to_geom_z(wkt: str):
    """Parse WKT that may carry Z coordinates. Returns (geom2d, z) where z
    mirrors the structure: polygon -> [ring z arrays], linestring -> array,
    None when the WKT is 2-D. (Z feeds rasterize BURN_VALUE_FROM=Z.)"""
    wkt = wkt.strip()
    head = wkt.split("(", 1)[0].strip().upper()
    body = wkt[wkt.index("(") :]

    def parse3(s: str):
        xs, zs = [], []
        has_z = False
        for pair in s.split(","):
            nums = pair.replace("(", " ").replace(")", " ").split()
            xs.append((float(nums[0]), float(nums[1])))
            if len(nums) >= 3:
                has_z = True
                zs.append(float(nums[2]))
            else:
                zs.append(0.0)
        return np.array(xs), (np.array(zs) if has_z else None)

    if head == "LINESTRING":
        pts, z = parse3(body.strip("() "))
        return ("linestring", pts), z
    if head == "POLYGON":
        rings, ring_z = [], []
        any_z = False
        for grp in _split_groups(body):
            pts, z = parse3(grp)
            rings.append(pts)
            ring_z.append(z)
            any_z = any_z or z is not None
        return ("polygon", rings), (ring_z if any_z else None)
    return wkt_to_geom(wkt), None


def wkt_to_geom(wkt: str):
    wkt = wkt.strip()
    head, _, rest = wkt.partition("(")
    head = head.strip().upper()
    body = wkt[wkt.index("(") :]

    def parse_ring(s: str) -> np.ndarray:
        pts = []
        for pair in s.split(","):
            xy = pair.replace("(", " ").replace(")", " ").split()
            pts.append((float(xy[0]), float(xy[1])))
        return np.array(pts)

    if head == "POINT":
        return ("point", parse_ring(body.strip("() ")))
    if head == "LINESTRING":
        return ("linestring", parse_ring(body.strip("() ")))
    if head == "POLYGON":
        rings = _split_groups(body)
        return ("polygon", [parse_ring(r) for r in rings])
    if head == "MULTIPOINT":
        groups = _split_groups(body)
        if not groups:  # MULTIPOINT (0.5 0.5) unparenthesized form
            groups = body.strip("() ").split(",")
        return ("multipoint", [("point", parse_ring(g)) for g in groups])
    if head == "MULTIPOLYGON":
        groups = _split_groups(body)
        return ("multipolygon", [("polygon", [parse_ring(r) for r in _split_groups("(" + g + ")")]) for g in groups])
    if head == "MULTILINESTRING":
        groups = _split_groups(body)
        return ("multilinestring", [("linestring", parse_ring(g)) for g in groups])
    raise ValueError(f"unsupported wkt {head}")


def _split_groups(body: str) -> list[str]:
    """Split '((...),(...))' into top-level paren groups' contents."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            if depth == 2:
                start = i + 1
        elif ch == ")":
            if depth == 2 and start is not None:
                out.append(body[start:i])
            depth -= 1
    return out


def geom_to_wkb(g) -> bytes:
    kind, data = g
    if kind == "point":
        return encode_point(data[0][0], data[0][1])
    if kind == "linestring":
        return encode_linestring(data)
    if kind == "polygon":
        return encode_polygon(data)
    if kind in ("multipoint", "multilinestring", "multipolygon", "geometrycollection"):
        return encode_multi(kind, [geom_to_wkb(p) for p in data])
    raise ValueError(kind)
