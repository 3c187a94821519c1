"""ENVI raw-binary driver (read + write) — from scratch.

Reference: frmts/raw/envidataset.cpp. A `.hdr` text sidecar (key =
value, {...} blocks spanning lines) describes a raw array: samples /
lines / bands, `data type` codes (ENVI numbering), `interleave`
bsq|bil|bip, `byte order` (0 little, 1 big), `header offset`, `map
info` (geotransform). Parity gate: the reference's fixtures decode to
their pinned checksums (autotest/gdrivers/envi.py:34 aea.dat = 14823;
:424 all three rgbsmall interleaves = bands 20718/20669/20895).
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = ["read_envi", "write_envi", "read_envi_tiles"]

_DTYPES = {1: np.uint8, 2: np.int16, 3: np.int32, 4: np.float32,
           5: np.float64, 6: np.complex64, 9: np.complex128,
           12: np.uint16, 13: np.uint32, 14: np.int64, 15: np.uint64}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _parse_hdr(text: str) -> dict:
    if not text.lstrip().upper().startswith("ENVI"):
        raise ValueError("not an ENVI header")
    # fold {...} blocks (may span lines) into single values
    out = {}
    body = text[text.index("ENVI") + 4:]
    pos = 0
    for m in re.finditer(r"^\s*([\w ]+?)\s*=\s*", body, re.M):
        key = m.group(1).strip().lower()
        v_start = m.end()
        if body[v_start:v_start + 1] == "{":
            v_end = body.index("}", v_start)
            val = body[v_start + 1:v_end]
        else:
            nl = body.find("\n", v_start)
            val = body[v_start:nl if nl >= 0 else len(body)]
        out[key] = val.strip()
        pos = v_start
    return out


def _hdr_path(path: str) -> str:
    for cand in (path + ".hdr", os.path.splitext(path)[0] + ".hdr"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no .hdr sidecar for {path}")


def read_envi(path: str):
    """-> (array (bands, lines, samples), geotransform or None, hdr
    dict)."""
    hdr = _parse_hdr(open(_hdr_path(path)).read())
    w = int(hdr["samples"])
    h = int(hdr["lines"])
    nb = int(hdr.get("bands", "1"))
    code = int(hdr["data type"])
    if code not in _DTYPES:
        raise NotImplementedError(f"ENVI data type {code}")
    dt = np.dtype(_DTYPES[code])
    if int(hdr.get("byte order", "0")) == 1:
        dt = dt.newbyteorder(">")
    off = int(hdr.get("header offset", "0"))
    inter = hdr.get("interleave", "bsq").lower()
    if hdr.get("file compression", "0").strip() == "1":
        import gzip

        raw = gzip.open(path).read()[off:]
        arr = np.frombuffer(raw, dt, count=w * h * nb)
    else:
        arr = np.fromfile(path, dt, count=w * h * nb, offset=off)
    if arr.size != w * h * nb:
        raise ValueError("ENVI data truncated")
    if inter == "bsq":
        cube = arr.reshape(nb, h, w)
    elif inter == "bil":
        cube = arr.reshape(h, nb, w).transpose(1, 0, 2)
    elif inter == "bip":
        cube = arr.reshape(h, w, nb).transpose(2, 0, 1)
    else:
        raise ValueError(f"ENVI interleave {inter!r}")
    gt = None
    if "map info" in hdr:
        parts = [p.strip() for p in hdr["map info"].split(",")]
        try:
            px, py = float(parts[1]), float(parts[2])
            x0, y0 = float(parts[3]), float(parts[4])
            dx, dy = float(parts[5]), float(parts[6])
            # ENVI ties (px, py) (1-based pixel) to (x0, y0) top-left
            gt = (x0 - (px - 1) * dx, dx, 0.0,
                  y0 + (py - 1) * dy, 0.0, -dy)
        except (ValueError, IndexError):
            gt = None
    return np.ascontiguousarray(cube), gt, hdr


def write_envi(cube: np.ndarray, path: str, *, interleave: str = "bsq",
               geotransform=None):
    """(bands, lines, samples) or (lines, samples) -> raw file +
    .hdr sidecar."""
    cube = np.asarray(cube)
    if cube.ndim == 2:
        cube = cube[None]
    nb, h, w = cube.shape
    code = _DTYPE_CODES.get(cube.dtype.newbyteorder("="))
    if code is None:
        raise ValueError(f"dtype {cube.dtype} not representable in ENVI")
    inter = interleave.lower()
    if inter == "bsq":
        flat = cube
    elif inter == "bil":
        flat = cube.transpose(1, 0, 2)
    elif inter == "bip":
        flat = cube.transpose(1, 2, 0)
    else:
        raise ValueError(f"interleave {interleave!r}")
    np.ascontiguousarray(flat).astype(
        cube.dtype.newbyteorder("<")).tofile(path)
    lines = ["ENVI", f"samples = {w}", f"lines   = {h}",
             f"bands   = {nb}", "header offset = 0",
             "file type = ENVI Standard", f"data type = {code}",
             f"interleave = {inter}", "byte order = 0"]
    if geotransform is not None:
        x0, dx, _, ytop, _, neg_dy = geotransform
        lines.append("map info = {Arbitrary, 1, 1, "
                     f"{x0}, {ytop}, {dx}, {-neg_dy}}}")
    with open(_sidecar(path), "w") as f:
        f.write("\n".join(lines) + "\n")


def _sidecar(path: str) -> str:
    return path + ".hdr"


def read_envi_tiles(path: str, *, tile: int = 256):
    """open_source driver: per-band tile fan (band column + tile rows,
    same layout as read_pnm_tiles)."""
    import pyarrow as pa
    import ray.data as rd

    cube, gt, hdr = read_envi(path)
    rows = {"band": [], "tile_x": [], "tile_y": [], "w": [], "h": [],
            "data": []}
    for b in range(cube.shape[0]):
        plane = cube[b]
        h, w = plane.shape
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                piece = plane[ty:ty + tile, tx:tx + tile]
                rows["band"].append(b)
                rows["tile_x"].append(tx // tile)
                rows["tile_y"].append(ty // tile)
                rows["w"].append(piece.shape[1])
                rows["h"].append(piece.shape[0])
                rows["data"].append(np.ascontiguousarray(
                    piece.astype(np.float64)).tobytes())
    return rd.from_arrow(pa.table({
        "band": pa.array(rows["band"], pa.int64()),
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "data": pa.array(rows["data"], pa.binary()),
    }))
