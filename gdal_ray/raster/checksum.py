"""GDAL-compatible image checksum, vectorized.

Behavioral spec from alg/gdalchecksum.cpp:55-60,319-324 (re-implemented, not
copied): walk pixel values in row-major order; for value index i add
value % primes[i % 11] with primes {7,11,13,17,19,23,29,31,37,41,43}; the
running sum is masked to 16 bits (equivalent to a final mod 65536 since all
addends are non-negative for non-negative data; C's % truncates toward zero
so negative values contribute negative remainders — replicated below).
Floating point data converts via GDALCopyWords' float->Int32 rule:
floor(v + 0.5) clamped to int32 (alg/gdalchecksum.cpp:68-89).
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def checksum(arr: np.ndarray) -> int:
    """16-bit checksum of a 2-D array (any integer dtype, or float)."""
    flat = np.asarray(arr).ravel()
    if flat.dtype.kind == "f":
        v = np.floor(flat + 0.5)
        v = np.clip(v, -2147483647, 2147483647)
        v = np.where(np.isfinite(flat), v, np.iinfo(np.int32).min).astype(np.int64)
    else:
        v = flat.astype(np.int64)
    p = _PRIMES[np.arange(v.size) % 11]
    # C-style remainder: truncation toward zero (numpy fmod matches for ints)
    rem = np.fmod(v, p)
    return int(rem.sum() & 0xFFFF)
