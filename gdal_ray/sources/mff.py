"""Vexcel MFF raster reader — from scratch.

Reference: frmts/raw/mffdataset.cpp. A `key = value` .hdr describes
IMAGE_LINES x LINE_SAMPLES; band data lives in sibling files whose
extension encodes the type: .b* unsigned 8-bit, .i* 16-bit, .j* 32-bit
int, .r*/."f"* real — band index is the number after the letter. Tiled
variants (tile_size_rows/columns) read tile-row-major with edge crop.

Parity gate: the reference's fixtures — bytemff.hdr pinned at 4672,
fakemff.hdr and fakemfftiled.hdr at 1 (autotest/gdrivers/mff.py:27-47).
"""

from __future__ import annotations

import glob
import os

import numpy as np

__all__ = ["read_mff"]

_EXT_DTYPE = {"b": np.uint8, "i": np.int16, "j": np.int32,
              "r": np.float32, "f": np.float32, "d": np.float64}


def read_mff(path: str):
    """path = the .hdr file. -> (array (bands, rows, cols), hdr dict)."""
    hdr: dict[str, str] = {}
    for line in open(path):
        if "=" in line:
            k, _, v = line.partition("=")
            hdr[k.strip().lower()] = v.strip()
    if hdr.get("image_file_format", "").upper() != "MFF":
        raise ValueError("not an MFF header")
    h = int(hdr["image_lines"])
    w = int(hdr["line_samples"])
    big = hdr.get("byte_order", "LSB").upper() == "MSB"
    base = os.path.splitext(path)[0]
    band_files = []
    for cand in sorted(glob.glob(base + ".*")):
        ext = os.path.splitext(cand)[1][1:].lower()
        if ext and ext[0] in _EXT_DTYPE and ext[1:].isdigit():
            band_files.append((int(ext[1:]), _EXT_DTYPE[ext[0]], cand))
    if not band_files:
        raise ValueError(f"no MFF band files next to {path}")
    band_files.sort()
    tile_r = int(hdr.get("tile_size_rows", "0"))
    tile_c = int(hdr.get("tile_size_columns", "0"))
    planes = []
    for _idx, dt, fn in band_files:
        d = np.dtype(dt).newbyteorder(">" if big else "<")
        raw = np.fromfile(fn, d)
        if tile_r and tile_c:
            tx = -(-w // tile_c)
            ty = -(-h // tile_r)
            plane = np.zeros((ty * tile_r, tx * tile_c), d)
            per_tile = tile_r * tile_c
            for ti in range(min(len(raw) // per_tile + 1, tx * ty)):
                chunk = raw[ti * per_tile:(ti + 1) * per_tile]
                if len(chunk) == 0:
                    break
                tile = np.zeros(per_tile, d)
                tile[:len(chunk)] = chunk
                r, c = divmod(ti, tx)
                plane[r * tile_r:(r + 1) * tile_r,
                      c * tile_c:(c + 1) * tile_c] = \
                    tile.reshape(tile_r, tile_c)
            plane = plane[:h, :w]
        else:
            if raw.size < w * h:
                raise ValueError(f"MFF band file {fn} truncated")
            plane = raw[:w * h].reshape(h, w)
        planes.append(plane)
    return np.stack(planes), hdr
