"""RMF (Raster Matrix Format, Panorama GIS .rsw / .mtw) reader — from
scratch, little-endian uncompressed scope.

Reference: frmts/rmf/rmfdataset.cpp. 320-byte header: magic RSW\\0
(raster) / MTW\\0 (elevation matrix), version, then at offset 48 the
raster block: reserved, depth-in-bits, width, height, tile counts, tile
width/height, last-tile width/height, two reserved, ROI offset, color
table offset, tile-table offset, tile-table size (8 bytes per tile:
offset + byte count), and doubles for scale/resolution/origin at
140-180. Tiles are row-major, top-down; 24-bit pixels are stored BGR
(readers return RGB); MTW data is raw float64.

Scope: big-endian (\\0WSR) files and RMF LZW/JPEG compression raise
NotImplementedError (documented; the LZW table variant is
Panorama-specific). Parity gate: byte.rsw 4672, rgbsmall.rsw bands
[21212, 21053, 21349], float64.mtw 4672 (autotest/gdrivers/rmf.py:30/
:50-:56/:43).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_rmf"]


def read_rmf(path: str):
    """-> (array (h, w) | (h, w, 3), geotransform)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic = buf[:4]
    if magic == b"\x00WSR" or magic == b"\x00WTM":
        raise NotImplementedError("big-endian RMF")
    if magic not in (b"RSW\x00", b"MTW\x00"):
        raise ValueError("not an RMF file")
    is_mtw = magic == b"MTW\x00"
    ints = struct.unpack("<20I", buf[48:128])
    depth, w, h = ints[1], ints[2], ints[3]
    tile_w, tile_h = ints[6], ints[7]
    tt_off, tt_size = ints[14], ints[15]
    res = struct.unpack("<d", buf[152:160])[0]
    y0 = struct.unpack("<d", buf[160:168])[0]
    x0 = struct.unpack("<d", buf[168:176])[0]
    n_tiles = tt_size // 8
    entries = struct.unpack(f"<{2 * n_tiles}I", buf[tt_off:tt_off + tt_size])
    tiles_x = -(-w // tile_w)
    tiles_y = -(-h // tile_h)
    if tiles_x * tiles_y != n_tiles:
        raise ValueError("RMF tile table does not cover the grid")

    if is_mtw:
        if depth != 64:
            raise NotImplementedError(f"MTW depth {depth}")
        out = np.zeros((h, w), np.float64)
        bpp = 8
    elif depth == 8:
        out = np.zeros((h, w), np.uint8)
        bpp = 1
    elif depth == 24:
        out = np.zeros((h, w, 3), np.uint8)
        bpp = 3
    elif depth == 32:
        out = np.zeros((h, w, 3), np.uint8)
        bpp = 4
    else:
        # 1/4-bit paletted files use a different block layout in the
        # wild fixtures (their nominal tile-table entries are sparse);
        # out of the uncompressed little-endian scope
        raise NotImplementedError(f"RMF depth {depth}")

    for ti in range(n_tiles):
        toff, tsize = entries[2 * ti], entries[2 * ti + 1]
        ty, tx = divmod(ti, tiles_x)
        th = min(tile_h, h - ty * tile_h)
        tw = min(tile_w, w - tx * tile_w)
        if toff == 0 and tsize == 0:
            continue  # sparse tile stays zero
        raw = np.frombuffer(buf, np.uint8, count=tsize, offset=toff)
        need = tile_w * th * bpp
        if len(raw) < need:
            raise ValueError("RMF tile truncated")
        if is_mtw:
            tile = np.frombuffer(buf, "<f8", count=tile_w * th,
                                 offset=toff).reshape(th, tile_w)[:, :tw]
            out[ty * tile_h:ty * tile_h + th,
                tx * tile_w:tx * tile_w + tw] = tile
        elif depth == 8:
            tile = raw[:need].reshape(th, tile_w)[:, :tw]
            out[ty * tile_h:ty * tile_h + th,
                tx * tile_w:tx * tile_w + tw] = tile
        else:
            px = raw[:need].reshape(th, tile_w, bpp)[:, :tw]
            # stored BGR(X) -> RGB
            out[ty * tile_h:ty * tile_h + th,
                tx * tile_w:tx * tile_w + tw] = px[:, :, 2::-1]
    gt = (x0, res, 0.0, y0 + h * res, 0.0, -res)
    return out, gt
