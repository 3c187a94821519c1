"""VTP BT (Binary Terrain) 1.3 driver — read + write.

Reference: frmts/raw/btdataset.cpp; format spec is public (VTP).
256-byte header: magic "binterr1.3", int32 columns, int32 rows, int16
data size (2/4), int16 floating-point flag, int16 horizontal units,
int16 UTM zone, int16 datum, double left/right/bottom/top extents,
int16 external-projection flag, float32 vertical scale. Data is
COLUMN-major (west-to-east columns, each running south-to-north);
readers return the north-up row-major array.

Parity gate mirrors the reference's CreateCopy tests
(autotest/gdrivers/bt.py:44 — int16/int32/float32 byte.tif payloads all
checked at 4672): GeoTIFF -> BT -> read reproduces checksum 4672 and
the exact extents.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_bt", "write_bt"]


def read_bt(path: str):
    """-> (array (rows, cols), geotransform)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:10] != b"binterr1.3":
        raise ValueError("not a BT 1.3 file")
    cols, rows = struct.unpack("<ii", buf[10:18])
    dsize, isfloat = struct.unpack("<hh", buf[18:22])
    left, right, bottom, top = struct.unpack("<4d", buf[28:60])
    if isfloat:
        dt = np.dtype("<f4")
    elif dsize == 2:
        dt = np.dtype("<i2")
    elif dsize == 4:
        dt = np.dtype("<i4")
    else:
        raise ValueError(f"BT data size {dsize}")
    arr = np.frombuffer(buf, dt, count=cols * rows, offset=256)
    if arr.size != cols * rows:
        raise ValueError("BT data truncated")
    # column-major, south-to-north -> north-up row-major
    grid = arr.reshape(cols, rows).T[::-1]
    gt = (left, (right - left) / cols, 0.0, top, 0.0,
          -(top - bottom) / rows)
    return np.ascontiguousarray(grid), gt


def write_bt(arr: np.ndarray, path: str, *, geotransform=None):
    """int16/int32/float32 (rows, cols) -> BT 1.3."""
    arr = np.asarray(arr)
    rows, cols = arr.shape
    if arr.dtype == np.int16:
        dsize, isfloat = 2, 0
    elif arr.dtype == np.int32:
        dsize, isfloat = 4, 0
    elif arr.dtype == np.float32:
        dsize, isfloat = 4, 1
    else:
        raise ValueError(f"BT cannot store dtype {arr.dtype}")
    gt = geotransform or (0.0, 1.0, 0.0, float(rows), 0.0, -1.0)
    left, dx, _, top, _, neg_dy = gt
    right = left + dx * cols
    bottom = top + neg_dy * rows
    hdr = bytearray(256)
    hdr[:10] = b"binterr1.3"
    hdr[10:18] = struct.pack("<ii", cols, rows)
    hdr[18:22] = struct.pack("<hh", dsize, isfloat)
    hdr[22:28] = struct.pack("<hhh", 1, 0, 0)  # degrees, no zone/datum
    hdr[28:60] = struct.pack("<4d", left, right, bottom, top)
    hdr[60:62] = struct.pack("<h", 0)
    hdr[62:66] = struct.pack("<f", 1.0)
    data = arr[::-1].T.astype(arr.dtype.newbyteorder("<"))
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(np.ascontiguousarray(data).tobytes())
