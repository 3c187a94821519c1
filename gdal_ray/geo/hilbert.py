"""2-D Hilbert curve codes — vectorized restatement of the reference's
GDALHilbertCode (alg/hilbert.cpp), used by `gdal vector sort` for spatial
ordering (apps/gdalalg_vector_sort.cpp:39-42). Physical-locality sort key:
sort by hilbert code before tiling so adjacent tiles land in adjacent blocks.
"""

from __future__ import annotations

import numpy as np


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """(x, y) integer grid coords in [0, 2^order) -> Hilbert distance (uint64).
    Standard rotate-and-accumulate xy2d, vectorized over all points."""
    x = x.astype(np.uint64).copy()
    y = y.astype(np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(order - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def lonlat_hilbert(lon: np.ndarray, lat: np.ndarray, order: int = 16) -> np.ndarray:
    """Degrees -> Hilbert code over an order-bit grid of the lon/lat plane."""
    n = np.uint64(1) << np.uint64(order)
    gx = np.clip(((lon + 180.0) / 360.0 * float(n)).astype(np.uint64), 0, int(n) - 1)
    gy = np.clip(((lat + 90.0) / 180.0 * float(n)).astype(np.uint64), 0, int(n) - 1)
    return hilbert_d(gx, gy, order)
