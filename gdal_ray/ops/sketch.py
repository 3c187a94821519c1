"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference has no sketches (SURVEY §2.5 'absent in reference') — this is
the training-pipeline extension, built the mergeable way the ray guide
prescribes: one sketch per batch inside map_batches, then a tiny merge
stage (sketches are bitwise-max mergeable). Standard HLL with the bias
correction from the published HyperLogLog paper (Flajolet et al.).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.pipelines.pages import _splitmix64


def _hash_col(t: pa.Table, col: str) -> np.ndarray:
    vals = t[col]
    if pa.types.is_integer(vals.type):
        return _splitmix64(vals.to_numpy(zero_copy_only=False).astype(np.int64))
    # strings/binary: FNV over bytes via numpy per-row (small cost per batch)
    out = np.empty(len(t), dtype=np.uint64)
    P = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for i, v in enumerate(vals.to_pylist()):
            h = np.uint64(0xCBF29CE484222325)
            for b in (v if isinstance(v, bytes) else str(v).encode()):
                h = (h ^ np.uint64(b)) * P
            out[i] = h
    return out


def hll_sketch(h: np.ndarray, p: int = 12) -> np.ndarray:
    """64-bit-hash HLL registers (2^p buckets of leading-zero ranks)."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64(1)  # sentinel stops the clz
    # rank = leading zeros of `rest` + 1, vectorized via float log2
    lz = np.zeros(h.size, dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        top = v >> np.uint64(64 - shift)
        has = top == 0
        lz += np.where(has, shift, 0)
        v = np.where(has, v << np.uint64(shift), v)
    rank = lz + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_count_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed HLL: one register array per batch, bitwise-max merged."""

    def sk(t: pa.Table) -> pa.Table:
        regs = hll_sketch(_hash_col(t, col), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = None
    for b in ds.map_batches(sk, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for buf in b["regs"].to_pylist():
            r = np.frombuffer(buf, dtype=np.int8)
            merged = r.copy() if merged is None else np.maximum(merged, r)
    if merged is None:
        return 0.0
    return hll_estimate(merged)
