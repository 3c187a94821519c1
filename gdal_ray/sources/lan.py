"""Erdas 7.x .LAN/.GIS reader — from scratch.

Reference: frmts/raw/landataset.cpp. 128-byte header: magic "HEADER"
(pre-7.4, float32 size fields) or "HEAD74" (int32 fields), int16
packing at offset 6 (0 = 8-bit, 1 = 4-bit packed two-pixels-per-byte
high-nibble-first, 2 = 16-bit), int16 band count at 8, cols/rows at
16/20. Data at 128, band-interleaved-by-line.

Parity gate: the reference's fakelan.lan and fakelan4bit.lan fixtures
both decode to the pinned checksum 10 (autotest/gdrivers/lan.py:26/:36).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_lan"]


def read_lan(path: str):
    """-> (array (bands, rows, cols) uint8|uint16, geotransform)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic = buf[:6]
    if magic not in (b"HEADER", b"HEAD74"):
        raise ValueError("not an Erdas LAN/GIS file")
    (packing,) = struct.unpack("<h", buf[6:8])
    (nbands,) = struct.unpack("<h", buf[8:10])
    if magic == b"HEAD74":
        ncols, nrows = struct.unpack("<ii", buf[16:24])
    else:
        fc, fr = struct.unpack("<ff", buf[16:24])
        ncols, nrows = int(fc), int(fr)
    if ncols <= 0 or nrows <= 0 or nbands <= 0:
        raise ValueError("implausible LAN dimensions")
    data = buf[128:]
    if packing == 0:
        need = ncols * nrows * nbands
        arr = np.frombuffer(data, np.uint8, count=need)
        cube = arr.reshape(nrows, nbands, ncols).transpose(1, 0, 2)
    elif packing == 2:
        need = ncols * nrows * nbands
        arr = np.frombuffer(data, "<u2", count=need)
        cube = arr.reshape(nrows, nbands, ncols).transpose(1, 0, 2)
    elif packing == 1:
        # 4-bit: two pixels per byte, HIGH nibble first, rows padded to
        # whole bytes per band-line
        bpl = (ncols + 1) // 2
        need = bpl * nrows * nbands
        raw = np.frombuffer(data, np.uint8, count=need).reshape(
            nrows, nbands, bpl)
        hi = raw >> 4
        lo = raw & 0x0F
        inter = np.empty((nrows, nbands, bpl * 2), np.uint8)
        inter[:, :, 0::2] = hi
        inter[:, :, 1::2] = lo
        cube = inter[:, :, :ncols].transpose(1, 0, 2)
    else:
        raise NotImplementedError(f"LAN packing {packing}")
    # minimal georef: ground coords at 112 (float32 ulx, uly, xcell,
    # ycell in older layouts vary) — identity when absent/zero
    gt = (0.0, 1.0, 0.0, float(nrows), 0.0, -1.0)
    return np.ascontiguousarray(cube), gt
