"""XYZ ASCII gridded raster driver (read + write).

Reference: frmts/xyz/xyzdataset.cpp — one `x y z` line per pixel over a
regular grid; column order inferred from an optional header line; cell
size inferred from coordinate steps; rows may run north->south or
south->north. Separators: whitespace, comma, or semicolon.

Parity gate mirrors the reference's own test (autotest/gdrivers/
xyz.py:30, a CreateCopy of byte.tif checked at 4672): GeoTIFF -> XYZ ->
read reproduces checksum 4672 and the exact geotransform.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["read_xyz", "write_xyz"]


def read_xyz(path: str):
    """-> (array (rows, cols) float64|int32, geotransform)."""
    xs, ys, zs = [], [], []
    with open(path) as f:
        first = f.readline()
        cols = ("x", "y", "z")
        toks0 = re.split(r"[,;\s]+", first.strip())
        if any(t.lower().lstrip('"').rstrip('"') in ("x", "y", "z",
                                                     "lon", "lat")
               for t in toks0):
            low = [t.lower().strip('"') for t in toks0]
            def idx(names, default):
                for nm in names:
                    if nm in low:
                        return low.index(nm)
                return default
            cols = (idx(("x", "lon"), 0), idx(("y", "lat"), 1),
                    idx(("z",), 2))
        else:
            cols = (0, 1, 2)
            if first.strip():
                t = re.split(r"[,;\s]+", first.strip())
                xs.append(float(t[0]))
                ys.append(float(t[1]))
                zs.append(float(t[2]))
        for line in f:
            t = re.split(r"[,;\s]+", line.strip())
            if len(t) < 3:
                continue
            xs.append(float(t[cols[0]]))
            ys.append(float(t[cols[1]]))
            zs.append(float(t[cols[2]]))
    x = np.asarray(xs)
    y = np.asarray(ys)
    z = np.asarray(zs)
    ux = np.unique(x)
    uy = np.unique(y)
    w, h = len(ux), len(uy)
    if w * h != len(z):
        raise ValueError("XYZ points do not form a full regular grid")
    dx = (ux[-1] - ux[0]) / max(w - 1, 1) or 1.0
    dy = (uy[-1] - uy[0]) / max(h - 1, 1) or 1.0
    ci = np.rint((x - ux[0]) / dx).astype(np.int64)
    ri = np.rint((uy[-1] - y) / dy).astype(np.int64)  # top row = max y
    arr = np.full((h, w), np.nan)
    arr[ri, ci] = z
    if np.isnan(arr).any():
        raise ValueError("XYZ grid has holes")
    if (arr == np.floor(arr)).all() and (np.abs(arr) < 2**31).all():
        arr = arr.astype(np.int32)
    gt = (ux[0] - dx / 2, dx, 0.0, uy[-1] + dy / 2, 0.0, -dy)
    return arr, gt


def write_xyz(arr: np.ndarray, path: str, *, geotransform=None):
    """Row-major x y z lines, pixel-center coordinates (the layout the
    reference's CreateCopy emits)."""
    arr = np.asarray(arr)
    h, w = arr.shape
    gt = geotransform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    x0, dx, _, ytop, _, neg_dy = gt
    is_int = np.issubdtype(arr.dtype, np.integer)
    with open(path, "w") as f:
        for r in range(h):
            yc = ytop + neg_dy * (r + 0.5)
            for c in range(w):
                xc = x0 + dx * (c + 0.5)
                v = int(arr[r, c]) if is_int else float(arr[r, c])
                f.write(f"{xc} {yc} {v}\n")
