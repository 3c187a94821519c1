"""Golden Software Surfer grid drivers: GSAG (ASCII .grd), GSBG (Surfer
6 binary), GS7BG (Surfer 7 binary) — read + ASCII/binary-6 write.

Reference: frmts/gsg (three separate GDAL drivers). All three store the
grid BOTTOM-UP (south row first); readers return north-up arrays with
the pixel-node-registered geotransform (nodes sit on xmin/xmax, so the
pixel origin backs off half a cell). Surfer's blank value 1.70141e38
maps to NaN.

Parity gate: the reference's fixtures — the same byte.tif payload in
all three encodings — decode to the pinned checksum 4672
(autotest/gdrivers/gsg.py:25/:31/:37).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_surfer", "write_surfer_ascii", "write_surfer6"]

_BLANK = 1.70141e38


def read_surfer(path: str):
    """Dispatch on magic: DSAA (ASCII) / DSBB (Surfer 6) / DSRB
    (Surfer 7). -> (north-up array, geotransform, nodata=np.nan)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic = buf[:4]
    if magic == b"DSAA":
        return _read_ascii(buf)
    if magic == b"DSBB":
        return _read_bin6(buf)
    if magic == b"DSRB":
        return _read_bin7(buf)
    raise ValueError(f"not a Surfer grid (magic {magic!r})")


def _finish(arr, xmin, xmax, ymin, ymax, nx, ny):
    dx = (xmax - xmin) / max(nx - 1, 1) or 1.0
    dy = (ymax - ymin) / max(ny - 1, 1) or 1.0
    arr = arr[::-1]  # bottom-up -> north-up
    arr = np.where(arr >= _BLANK * 0.999, np.nan, arr)
    if not np.isnan(arr).any() and (arr == np.floor(arr)).all() \
            and (np.abs(arr) < 2**31).all():
        arr = arr.astype(np.int32)
    gt = (xmin - dx / 2, dx, 0.0, ymax + dy / 2, 0.0, -dy)
    return np.ascontiguousarray(arr), gt, np.nan


def _read_ascii(buf: bytes):
    toks = buf.split()
    nx, ny = int(toks[1]), int(toks[2])
    xmin, xmax, ymin, ymax = (float(t) for t in toks[3:7])
    vals = np.array([float(t) for t in toks[9:9 + nx * ny]])
    if vals.size != nx * ny:
        raise ValueError("Surfer ASCII grid truncated")
    return _finish(vals.reshape(ny, nx), xmin, xmax, ymin, ymax, nx, ny)


def _read_bin6(buf: bytes):
    nx, ny = struct.unpack("<HH", buf[4:8])
    xmin, xmax, ymin, ymax, _zmin, _zmax = struct.unpack("<6d", buf[8:56])
    vals = np.frombuffer(buf, "<f4", count=nx * ny,
                         offset=56).astype(np.float64)
    if vals.size != nx * ny:
        raise ValueError("Surfer 6 grid truncated")
    return _finish(vals.reshape(ny, nx), xmin, xmax, ymin, ymax, nx, ny)


def _read_bin7(buf: bytes):
    pos = 4
    # header section: size + version
    (hsize,) = struct.unpack("<I", buf[pos:pos + 4])
    pos += 4 + hsize
    grid = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body_at = pos + 8
        if tag == b"GRID":
            ny, nx = struct.unpack("<ii", buf[body_at:body_at + 8])
            (xll, yll, xsize, ysize, _zmin, _zmax, _rot,
             blank) = struct.unpack("<8d", buf[body_at + 8:body_at + 72])
            grid = (nx, ny, xll, yll, xsize, ysize, blank)
            pos = body_at + size
        elif tag == b"DATA":
            if grid is None:
                raise ValueError("Surfer 7 DATA before GRID")
            nx, ny, xll, yll, xsize, ysize, blank = grid
            vals = np.frombuffer(buf, "<f8", count=nx * ny,
                                 offset=body_at).copy()
            if vals.size != nx * ny:
                raise ValueError("Surfer 7 grid truncated")
            vals[vals >= blank * 0.999] = np.nan
            return _finish(vals.reshape(ny, nx), xll,
                           xll + (nx - 1) * xsize, yll,
                           yll + (ny - 1) * ysize, nx, ny)
        else:
            pos = body_at + size
    raise ValueError("Surfer 7 grid: no DATA section")


def write_surfer_ascii(arr: np.ndarray, path: str, *, geotransform=None):
    arr = np.asarray(arr, np.float64)
    ny, nx = arr.shape
    gt = geotransform or (0.0, 1.0, 0.0, float(ny), 0.0, -1.0)
    x0, dx, _, ytop, _, neg_dy = gt
    dy = -neg_dy
    xmin, xmax = x0 + dx / 2, x0 + dx / 2 + (nx - 1) * dx
    ymin, ymax = ytop - dy / 2 - (ny - 1) * dy, ytop - dy / 2
    a = np.where(np.isnan(arr), _BLANK, arr)[::-1]
    with open(path, "w") as f:
        f.write(f"DSAA\n{nx} {ny}\n{xmin:g} {xmax:g}\n"
                f"{ymin:g} {ymax:g}\n{np.nanmin(arr):g} "
                f"{np.nanmax(arr):g}\n")
        for row in a:
            f.write(" ".join(repr(float(v)) for v in row) + "\n")


def write_surfer6(arr: np.ndarray, path: str, *, geotransform=None):
    arr = np.asarray(arr, np.float64)
    ny, nx = arr.shape
    gt = geotransform or (0.0, 1.0, 0.0, float(ny), 0.0, -1.0)
    x0, dx, _, ytop, _, neg_dy = gt
    dy = -neg_dy
    xmin, xmax = x0 + dx / 2, x0 + dx / 2 + (nx - 1) * dx
    ymin, ymax = ytop - dy / 2 - (ny - 1) * dy, ytop - dy / 2
    a = np.where(np.isnan(arr), _BLANK, arr)[::-1].astype("<f4")
    with open(path, "wb") as f:
        f.write(b"DSBB" + struct.pack("<HH", nx, ny)
                + struct.pack("<6d", xmin, xmax, ymin, ymax,
                              float(np.nanmin(arr)),
                              float(np.nanmax(arr))))
        f.write(a.tobytes())
