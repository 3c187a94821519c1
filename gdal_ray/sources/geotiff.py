"""Minimal (Geo)TIFF reader/writer — a REAL binary format driver.

Reference: frmts/gtiff (the reference's flagship driver). This is a
from-scratch, dependency-free subset sufficient for data exchange and
the reference's own golden fixtures: baseline TIFF 6.0 (II/MM byte
orders, uncompressed, strip-organized, 8/16/32-bit unsigned + 32/64-bit
float, single- or multi-sample contiguous) plus the three GeoTIFF tags
that carry georeferencing — ModelPixelScale (33550) + ModelTiepoint
(33922) or the full ModelTransformation (34264), and the
GeoKeyDirectory (34735) EPSG code. The writer emits a single-strip
uncompressed little-endian file round-trippable by this reader and by
any TIFF tool.

A whole image reads into one array (this is a FIXTURE/exchange driver:
reference test rasters are small); large-raster pipelines stay on the
parquet-backed tile/chunk tables — see read_geotiff_tiles for the
bridge that fans a file into the engine's tile rows.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q"}


def _read_ifd_value(buf: bytes, bo: str, typ: int, cnt: int, voff: bytes):
    size = _TYPE_SIZE.get(typ, 1) * cnt
    if size <= 4:
        data = voff[:size]
    else:
        (off,) = struct.unpack(bo + "I", voff)
        data = buf[off:off + size]
    if typ == 2:  # ASCII
        return data.rstrip(b"\x00").decode("latin-1")
    if typ == 5:  # RATIONAL
        vals = struct.unpack(bo + "II" * cnt, data)
        return [vals[i] / max(vals[i + 1], 1) for i in range(0, 2 * cnt, 2)]
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:
        return data
    return list(struct.unpack(bo + fmt * cnt, data))


def _unpackbits(s: bytes) -> bytes:
    """TIFF PackBits run-length decode."""
    out = bytearray()
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        i += 1
        if c < 128:
            out += s[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += s[i:i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def read_geotiff(path: str):
    """Read one (Geo)TIFF. Returns (array, geotransform, meta) where
    array is (H, W) or (H, W, S), geotransform is the 6-tuple GDAL
    convention (None when the file carries no georeferencing), and meta
    has 'epsg' (or None) plus the raw tag dict."""
    buf = open(path, "rb").read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic, ifd_off) = struct.unpack(bo + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (n,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
    tags: dict = {}
    for i in range(n):
        e = buf[ifd_off + 2 + 12 * i:ifd_off + 14 + 12 * i]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = _read_ifd_value(buf, bo, typ, cnt, e[8:12])
    w = int(tags[256][0])
    h = int(tags[257][0])
    comp = int(tags.get(259, [1])[0])
    if comp not in (1, 8, 32946, 32773):
        raise ValueError(f"unsupported TIFF compression {comp} "
                         "(none / Deflate / PackBits)")
    spp = int(tags.get(277, [1])[0])
    bps = tags.get(258, [8])
    if len(set(bps)) != 1:
        raise ValueError("mixed bits-per-sample unsupported")
    bits = int(bps[0])
    sf = int(tags.get(339, [1])[0])  # 1 uint, 2 int, 3 float
    dt = {(1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
          (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
          (3, 32): np.float32, (3, 64): np.float64}.get((sf, bits))
    if dt is None:
        raise ValueError(f"unsupported sample format {sf}/{bits}")
    planar = int(tags.get(284, [1])[0])
    offs = tags[273]
    counts = tags.get(279, [w * h * spp * (bits // 8)])
    strips = [bytes(buf[int(o):int(o) + int(c)])
              for o, c in zip(offs, counts)]
    if comp in (8, 32946):  # Adobe Deflate / legacy Deflate: zlib strips
        import zlib

        strips = [zlib.decompress(s) for s in strips]
    elif comp == 32773:  # PackBits run-length
        strips = [_unpackbits(s) for s in strips]
    data = b"".join(strips)
    arr = np.frombuffer(data, dtype=np.dtype(dt).newbyteorder(bo),
                        count=w * h * spp).astype(dt)
    if spp == 1:
        arr = arr.reshape(h, w)
    elif planar == 2:
        # planar: all strips of band 0, then band 1, ... -> interleave
        arr = arr.reshape(spp, h, w).transpose(1, 2, 0)
    else:
        arr = arr.reshape(h, w, spp)
    if int(tags.get(317, [1])[0]) == 2:
        # horizontal differencing predictor: cumsum along rows per sample
        arr = np.cumsum(arr, axis=1, dtype=arr.dtype)
    gt = None
    if 34264 in tags and len(tags[34264]) >= 16:
        m = tags[34264]
        gt = (m[3], m[0], m[1], m[7], m[4], m[5])
    elif 33550 in tags and 33922 in tags:
        sx, sy = tags[33550][0], tags[33550][1]
        tp = tags[33922]  # (i, j, k, x, y, z): pixel (i,j) -> model (x,y)
        gt = (tp[3] - tp[0] * sx, sx, 0.0,
              tp[4] + tp[1] * sy, 0.0, -sy)
    epsg = None
    if 34735 in tags:
        gk = tags[34735]
        # GeoKeyDirectory: header + 4-short entries; EPSG code lives in
        # GeographicTypeGeoKey (2048) or ProjectedCSTypeGeoKey (3072)
        for i in range(4, len(gk), 4):
            key, loc, cnt_, val = gk[i:i + 4]
            if key in (3072, 2048) and loc == 0:
                epsg = int(val)
                if key == 3072:
                    break
    return arr, gt, {"epsg": epsg, "tags": tags}


def write_geotiff(path: str, arr: np.ndarray, geotransform=None,
                  epsg: int | None = None) -> None:
    """Write a single-strip uncompressed little-endian (Geo)TIFF.
    Rotation-free geotransforms use PixelScale+Tiepoint; rotated ones the
    full ModelTransformation."""
    a = np.ascontiguousarray(arr)
    if a.ndim == 2:
        h, w = a.shape
        spp = 1
    elif a.ndim == 3:
        h, w, spp = a.shape
    else:
        raise ValueError("array must be 2-D or (H, W, S)")
    sf = {"u": 1, "i": 2, "f": 3}.get(a.dtype.kind)
    if sf is None:
        raise ValueError(f"unsupported dtype {a.dtype}")
    bits = a.dtype.itemsize * 8
    pix = a.astype(a.dtype.newbyteorder("<")).tobytes()

    entries = []  # (tag, type, count, packed-or-(data, type))
    deferred: list = []

    def ent(tag, typ, vals):
        vals = list(np.atleast_1d(vals))
        size = _TYPE_SIZE[typ] * len(vals)
        fmt = _TYPE_FMT[typ]
        data = struct.pack("<" + fmt * len(vals), *vals)
        entries.append([tag, typ, len(vals), data])

    ent(256, 4, w)
    ent(257, 4, h)
    ent(258, 3, [bits] * spp)
    ent(259, 3, 1)
    ent(262, 3, 1)          # BlackIsZero
    ent(273, 4, 0)          # strip offset patched below
    ent(277, 3, spp)
    ent(278, 4, h)
    ent(279, 4, len(pix))
    ent(339, 3, [sf] * spp)
    if geotransform is not None:
        gt = geotransform
        if gt[2] == 0.0 and gt[4] == 0.0:
            ent(33550, 12, [gt[1], -gt[5], 0.0])
            ent(33922, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
        else:
            ent(34264, 12, [gt[1], gt[2], 0.0, gt[0],
                            gt[4], gt[5], 0.0, gt[3],
                            0.0, 0.0, 0.0, 0.0,
                            0.0, 0.0, 0.0, 1.0])
    if epsg is not None:
        key = 3072 if epsg >= 20000 or 2000 <= epsg < 5000 else 2048
        # projected codes are the common case; geographic 4xxx use 2048
        if 4000 <= epsg < 5000:
            key = 2048
        ent(34735, 3, [1, 1, 0, 2, 1024, 0, 1, 1 if key == 2048 else 2,
                       key, 0, 1, epsg])

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    # lay out oversize tag payloads, then the pixel strip
    blobs = []
    for e in entries:
        if len(e[3]) > 4:
            blobs.append((e, data_off))
            data_off += len(e[3]) + (len(e[3]) & 1)
    strip_off = data_off
    for e in entries:
        if e[0] == 273:
            e[3] = struct.pack("<I", strip_off)
    out = [b"II", struct.pack("<HI", 42, ifd_off),
           struct.pack("<H", n)]
    blob_pos = {id(e): off for e, off in blobs}
    for e in entries:
        tag, typ, cnt, data = e
        if len(data) > 4:
            out.append(struct.pack("<HHII", tag, typ, cnt,
                                   blob_pos[id(e)]))
        else:
            out.append(struct.pack("<HHI", tag, typ, cnt)
                       + data.ljust(4, b"\x00"))
    out.append(struct.pack("<I", 0))  # no next IFD
    for e, off in blobs:
        pad = b"\x00" if len(e[3]) & 1 else b""
        out.append(e[3] + pad)
    out.append(pix)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def read_geotiff_tiles(path: str, *, tile: int = 256):
    """Fan a (Geo)TIFF into the engine's tile rows: Dataset of
    (tile_x, tile_y, w, h, data) covering the image on a tile-size grid
    (boundary tiles are partial). The file reads once on the driver
    (fixture-scale) and the tiles distribute; huge rasters belong in
    parquet tile tables to begin with."""
    import pyarrow as pa
    import ray.data as rd

    arr, gt, meta = read_geotiff(path)
    if arr.ndim != 2:
        raise ValueError("tile fan supports single-band rasters")
    h, w = arr.shape
    rows = {"tile_x": [], "tile_y": [], "w": [], "h": [], "data": []}
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            piece = arr[ty:ty + tile, tx:tx + tile]
            rows["tile_x"].append(tx // tile)
            rows["tile_y"].append(ty // tile)
            rows["w"].append(piece.shape[1])
            rows["h"].append(piece.shape[0])
            rows["data"].append(np.ascontiguousarray(piece).tobytes())
    t = pa.table({
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "data": pa.array(rows["data"], pa.binary()),
    })
    return rd.from_arrow(t)
