"""S2 cell IDs from scratch, vectorized in numpy.

Implements the public S2 geometry cell-indexing scheme (s2geometry.io:
cube-face decomposition, quadratic s/t projection, Hilbert curve position,
64-bit id = [face:3][hilbert pos:2*level][1][trailing zeros]). GDAL contains
no S2; this is the north-star cell-index requirement implemented from the
published spec (SURVEY.md §7.2.2). No bit-level oracle exists in this
sandbox, so tests assert the spec's structural invariants (trailing-bit
format, parent containment, determinism, face correctness, locality).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2

# Hilbert curve sub-cell orderings (public S2 constants)
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64
)

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level, i, j, orig_orientation, pos, orientation):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) | j
        _LOOKUP_POS[(ij << 2) | orig_orientation] = (pos << 2) | orientation
        _LOOKUP_IJ[(pos << 2) | orig_orientation] = (ij << 2) | orientation
        return
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        ij = int(r[index])
        _init_lookup(
            level + 1,
            (i << 1) | (ij >> 1),
            (j << 1) | (ij & 1),
            orig_orientation,
            (pos << 2) | index,
            orientation ^ int(_POS_TO_ORIENTATION[index]),
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi, theta = np.radians(lat), np.radians(lon)
    cos_phi = np.cos(phi)
    return np.cos(theta) * cos_phi, np.sin(theta) * cos_phi, np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (un, ud, vn, vd) in enumerate(
        [
            (1, 0, 2, 0),   # face 0 (+x): u=y/x  v=z/x
            (0, 1, 2, 1),   # face 1 (+y): u=-x/y v=z/y
            (0, 2, 1, 2),   # face 2 (+z): u=-x/z v=-y/z
            (2, 0, 1, 0),   # face 3 (-x): u=z/x  v=y/x
            (2, 1, 0, 1),   # face 4 (-y): u=z/y  v=-x/y
            (1, 2, 0, 2),   # face 5 (-z): u=-y/z v=-x/z
        ]
    ):
        m = face == f
        if not m.any():
            continue
        comp = [x, y, z]
        num_u, den = comp[un][m], comp[ud][m]
        num_v = comp[vn][m]
        uu = num_u / den
        vv = num_v / den
        # sign fixups to match the canonical S2 face frames
        if f == 1 or f == 2:
            uu = -uu
        if f == 2:
            vv = -vv
        if f == 4:
            vv = -vv
        if f == 5:
            uu, vv = -uu, -vv
        u[m] = uu
        v[m] = vv
    return face, u, v


def _uv_to_st(u):
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def cell_id_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """64-bit leaf cell id (level 30) via the Hilbert lookup tables."""
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP_MASK).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits = bits + ((((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)))
        bits = bits + ((((j >> (k * _LOOKUP_BITS)) & mask) << 2))
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits = bits & (_SWAP_MASK | _INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """(lon, lat) degrees -> S2 cell id at `level` (uint64)."""
    x, y, z = lonlat_to_xyz(np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64))
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = cell_id_from_face_ij(face, i, j)
    return parent(leaf, level)


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at `level` (level 30 = identity)."""
    if level >= MAX_LEVEL:
        return cell
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cell & ~(lsb * np.uint64(2) - np.uint64(1))) | lsb


def cell_to_lonlat(cell: np.ndarray):
    """Cell -> (lon, lat) degrees via the inverse Hilbert table. Exact cell
    center for LEAF cells; for coarser cells a representative interior point
    (the decoded leaf position of the id's center marker)."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    face = (c >> np.uint64(61)).astype(np.int64)
    # walk 8 nibble-pairs of the curve back to (i, j)
    i = np.zeros(c.shape, dtype=np.int64)
    j = np.zeros(c.shape, dtype=np.int64)
    bits = (face & _SWAP_MASK).astype(np.int64)
    # 60-bit hilbert position only — the face bits above contaminate the
    # top nibble-pair otherwise (face 0 round-trips, others flip)
    n = (c >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    for k in range(7, -1, -1):
        nbits = ((n >> np.uint64(k * 2 * _LOOKUP_BITS)) & np.uint64((1 << (2 * _LOOKUP_BITS)) - 1)).astype(np.int64)
        bits += nbits << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP_MASK | _INVERT_MASK
    si = (i.astype(np.uint64) << np.uint64(1)) + np.uint64(1)
    ti = (j.astype(np.uint64) << np.uint64(1)) + np.uint64(1)
    s = si.astype(np.float64) / float(1 << (MAX_LEVEL + 1))
    t = ti.astype(np.float64) / float(1 << (MAX_LEVEL + 1))

    def st_to_uv(x):
        return np.where(x >= 0.5, (4 * x * x - 1) / 3.0, (1 - 4 * (1 - x) * (1 - x)) / 3.0)

    u, v = st_to_uv(s), st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    frames = [
        lambda u, v: (np.ones_like(u), u, v),        # face 0
        lambda u, v: (-u, np.ones_like(u), v),       # face 1
        lambda u, v: (-u, -v, np.ones_like(u)),      # face 2
        lambda u, v: (-np.ones_like(u), -v, -u),     # face 3
        lambda u, v: (v, -np.ones_like(u), -u),      # face 4
        lambda u, v: (v, u, -np.ones_like(u)),       # face 5
    ]
    for f in range(6):
        m = face == f
        if m.any():
            xf, yf, zf = frames[f](u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    # level = 30 - (bit_position / 2)
    bitpos = np.zeros_like(c, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bitpos += np.where(big, shift, 0)
        v = np.where(big, v >> np.uint64(shift), v)
    return 30 - bitpos // 2
