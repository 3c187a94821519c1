"""DTED (Digital Terrain Elevation Data, MIL-PRF-89020) reader.

Reference: frmts/dted. Layout: UHL (80 B) + DSI (648 B) + ACC (2700 B)
headers, then one data record per LONGITUDE column: 0xAA sentinel,
3-byte data block count, 2-byte lon index, 2-byte lat index, nlat
big-endian 16-bit SIGNED-MAGNITUDE elevations (south -> north), 4-byte
byte-sum checksum (verified). Output is a north-up (nlat, nlon) int16
grid with the 1-degree-cell geotransform from the UHL origin.

Parity gate: the reference's n43.dt0 fixture decodes to its pinned
checksum 49187 (autotest/gdrivers/dted.py:31).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_dted"]


def _angle(field: bytes) -> float:
    """DDDMMSS.S?H or DDDMMSSH -> signed degrees."""
    s = field.decode().strip()
    hemi = s[-1]
    body = s[:-1]
    # DDDMMSS with optional fraction
    if "." in body:
        whole, frac = body.split(".")
    else:
        whole, frac = body, "0"
    whole = whole.rjust(7, "0")
    deg = int(whole[:-4])
    minutes = int(whole[-4:-2])
    sec = float(whole[-2:]) + float("0." + frac)
    v = deg + minutes / 60 + sec / 3600
    return -v if hemi in ("S", "W", "s", "w") else v


def read_dted(path: str):
    """-> (int16 array (nlat, nlon) north-up, geotransform)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] not in (b"UHL1", b"UHL "):
        raise ValueError("not a DTED file (missing UHL)")
    lon0 = _angle(buf[4:12])
    lat0 = _angle(buf[12:20])
    lon_int = int(buf[20:24]) / 10.0 / 3600.0   # tenths of arc-seconds
    lat_int = int(buf[24:28]) / 10.0 / 3600.0
    nlon = int(buf[47:51])
    nlat = int(buf[51:55])
    pos = 80 + 648 + 2700
    grid = np.zeros((nlat, nlon), np.int16)
    rec_len = 8 + 2 * nlat + 4
    for c in range(nlon):
        rec = buf[pos:pos + rec_len]
        if len(rec) < rec_len or rec[0] != 0xAA:
            raise ValueError(f"bad DTED record sentinel at column {c}")
        vals = np.frombuffer(rec[8:8 + 2 * nlat], ">u2").astype(np.int32)
        # signed magnitude: high bit = negative
        neg = (vals & 0x8000) != 0
        mag = (vals & 0x7FFF)
        elev = np.where(neg, -mag, mag).astype(np.int16)
        want = int.from_bytes(rec[-4:], "big")
        got = int(np.frombuffer(rec[:-4], np.uint8,
                                count=rec_len - 4).sum())
        if got != want:
            raise ValueError(f"DTED record checksum mismatch col {c}")
        # record runs south -> north; the grid is north-up
        grid[:, c] = elev[::-1]
        pos += rec_len
    gt = (lon0 - lon_int / 2, lon_int, 0.0,
          lat0 + (nlat - 1) * lat_int + lat_int / 2, 0.0, -lat_int)
    return grid, gt
