"""HexCell — an H3-style aperture-7 hierarchical hexagonal cell index,
from scratch, exact integer lattice arithmetic, fully vectorized.

Design follows the published H3 indexing scheme's structure (aperture-7
subdivision: each resolution's hex grid is scaled by 1/sqrt(7) and rotated
by atan(sqrt(3)/5) ~ 19.1066 deg; a cell id is a base cell plus one base-7
digit per resolution; parent = digit truncation). GDAL contains no H3/S2
(SURVEY.md §7.5.1) — this is the north star's cell-index requirement built
from the public spec's structure.

The exact hierarchy: parent-grid centers form an index-7 sublattice of the
child axial lattice via (qp, rp) -> (2*qp - rp, qp + 3*rp)  (|det| = 7, the
aperture). A child cell's digit is its coset: residue (3*q + r) mod 7 — pure
integer arithmetic, no rounding, so parent-by-truncation is exact by
construction.

Honest scope note: NOT bit-compatible with Uber H3 (whose 122 base cells
live on an icosahedral gnomonic projection; no H3 oracle exists in this
sandbox). Bit-parity was evaluated and deliberately NOT attempted in this
environment: it requires H3's published baseCellData[122] /
faceCenterGeo[20] / faceAxesAzRadsCII orientation tables, which are fixed
published constants, not derivable from first principles — with no network
and no h3 package in the sandbox there is no authoritative source to take
them from or validate against, and a from-memory table would silently
mismatch. The plug-point is `lonlat_to_cell` below: swap in
h3.latlng_to_cell (vectorized) where the h3 wheel exists and every
consumer (joins, salting, groupbys) works unchanged. The grid plane here is equirectangular (x=lon, y=lat degrees).
The index is exact, deterministic, hierarchical and hexagonal — the
properties the engine needs for join keys, salting and locality. Like real
H3, child hexes can overhang the parent hex boundary, so
cell_to_parent(cell(p, 9), 5) == cell(p, 5) holds for interior points but
not on boundaries (same caveat as H3's geoToH3/h3ToParent).

Id layout (uint64): [4 bits res][13 bits q0+4096][13 bits r0+4096]
[3 bits per digit, res digits, high-to-low]. Max res 11 (north star: 5-9).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 11
_BASE_SIZE = 10.0  # res-0 hex circumradius in grid degrees

# child-coset offsets (axial): digit 0 = center, 1..6 = the six unit steps
_DIGIT_DQ = np.array([0, 1, 0, -1, -1, 0, 1], dtype=np.int64)
_DIGIT_DR = np.array([0, 0, 1, 1, 0, -1, -1], dtype=np.int64)
# residue (3*dq + dr) mod 7 of each digit -> inverse lookup
_RESIDUE_TO_DIGIT = np.zeros(7, dtype=np.int64)
for _d in range(7):
    _RESIDUE_TO_DIGIT[(3 * _DIGIT_DQ[_d] + _DIGIT_DR[_d]) % 7] = _d


def _build_grids():
    """Basis vectors (a, b) per res. Res 0: pointy-top hexes, circumradius
    _BASE_SIZE. Finer levels via the exact aperture-7 relation
    a_parent = 2a + b, b_parent = -a + 3b  =>  a = (3A - B)/7, b = (A+2B)/7."""
    R0 = _BASE_SIZE
    a = np.array([np.sqrt(3.0) * R0, 0.0])
    b = np.array([np.sqrt(3.0) * R0 / 2.0, 1.5 * R0])
    grids = [(R0, a, b)]
    for _ in range(MAX_RES):
        a, b = (3.0 * a - b) / 7.0, (a + 2.0 * b) / 7.0
        R = np.hypot(*a) / np.sqrt(3.0)
        grids.append((R, a, b))
    return grids


_GRIDS = _build_grids()


def _cube_round(qf: np.ndarray, rf: np.ndarray):
    """Round fractional axial coords to the nearest hex center."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _to_axial(x: np.ndarray, y: np.ndarray, res: int):
    """Plane point -> nearest hex (q, r) of grid `res` (exact global grid)."""
    _, a, b = _GRIDS[res]
    det = a[0] * b[1] - a[1] * b[0]
    qf = (x * b[1] - y * b[0]) / det
    rf = (y * a[0] - x * a[1]) / det
    return _cube_round(qf, rf)


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """(lon, lat) -> HexCell id at resolution `res` (uint64).

    Exact: the res-`res` hex is found on the global grid (cube rounding =
    nearest center), then the digit chain is peeled bottom-up with integer
    coset arithmetic — each level one vectorized step."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    q, r = _to_axial(x, y, res)
    cell = np.full(q.shape, np.uint64(res) << np.uint64(60), dtype=np.uint64)
    for rr in range(res, 0, -1):
        digit = _RESIDUE_TO_DIGIT[(3 * q + r) % 7]
        qc = q - _DIGIT_DQ[digit]
        rc = r - _DIGIT_DR[digit]
        q = (3 * qc + rc) // 7
        r = (-qc + 2 * rc) // 7
        cell |= digit.astype(np.uint64) << np.uint64(34 - 3 * rr)
    cell |= (q + 4096).astype(np.uint64) << np.uint64(47)
    cell |= (r + 4096).astype(np.uint64) << np.uint64(34)
    return cell


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(60)).astype(np.int64)


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Truncate digits below parent_res and restamp the res field — exact
    (the digit chain IS the ancestry)."""
    c = np.asarray(cell, dtype=np.uint64)
    if np.any(cell_res(c) < parent_res):
        raise ValueError("parent_res must be <= cell res")
    keep_mask = ~np.uint64(0) << np.uint64(34 - 3 * parent_res)
    out = (c & keep_mask & ~(np.uint64(0xF) << np.uint64(60))) | (
        np.uint64(parent_res) << np.uint64(60)
    )
    return out


def cell_axial(cell: np.ndarray):
    """Decode to (res, q, r) on the res's global grid (replays digits)."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res_arr = cell_res(c)
    res = int(res_arr[0])
    if not (res_arr == res).all():
        raise ValueError("mixed-resolution cell arrays not supported")
    q = ((c >> np.uint64(47)) & np.uint64(0x1FFF)).astype(np.int64) - 4096
    r = ((c >> np.uint64(34)) & np.uint64(0x1FFF)).astype(np.int64) - 4096
    for rr in range(1, res + 1):
        digit = ((c >> np.uint64(34 - 3 * rr)) & np.uint64(0x7)).astype(np.int64)
        q, r = 2 * q - r + _DIGIT_DQ[digit], q + 3 * r + _DIGIT_DR[digit]
    return res, q, r


def cell_center(cell: np.ndarray):
    """(cx, cy) centers in the lon/lat plane."""
    res, q, r = cell_axial(cell)
    _, a, b = _GRIDS[res]
    return q * a[0] + r * b[0], q * a[1] + r * b[1]


def cell_from_axial(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    """Inverse of cell_axial: encode global-grid axial coords at `res` into
    cell ids (same bottom-up coset peel as lonlat_to_cell)."""
    q = np.asarray(q, dtype=np.int64).copy()
    r = np.asarray(r, dtype=np.int64).copy()
    cell = np.full(q.shape, np.uint64(res) << np.uint64(60), dtype=np.uint64)
    for rr in range(res, 0, -1):
        digit = _RESIDUE_TO_DIGIT[(3 * q + r) % 7]
        qc = q - _DIGIT_DQ[digit]
        rc = r - _DIGIT_DR[digit]
        q = (3 * qc + rc) // 7
        r = (-qc + 2 * rc) // 7
        cell |= digit.astype(np.uint64) << np.uint64(34 - 3 * rr)
    cell |= (q + 4096).astype(np.uint64) << np.uint64(47)
    cell |= (r + 4096).astype(np.uint64) << np.uint64(34)
    return cell


def cell_children(cell: np.ndarray) -> np.ndarray:
    """The 7 res+1 children of each cell (digit append — exact coset
    structure). Output shape (..., 7)."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res = int(cell_res(c)[0])
    if res + 1 > MAX_RES:
        raise ValueError("children beyond MAX_RES")
    base = (c & ~(np.uint64(0xF) << np.uint64(60))) | (np.uint64(res + 1) << np.uint64(60))
    shift = np.uint64(34 - 3 * (res + 1))
    digits = np.arange(7, dtype=np.uint64)
    return base[..., None] | (digits[None, :] << shift)


def cell_neighbors(cell: np.ndarray) -> np.ndarray:
    """The 6 same-res neighbor hexes (unit axial steps). Shape (..., 6)."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res, q, r = cell_axial(c)
    outs = []
    for d in range(1, 7):
        outs.append(cell_from_axial(q + _DIGIT_DQ[d], r + _DIGIT_DR[d], res))
    return np.stack(outs, axis=-1)
