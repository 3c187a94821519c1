"""PNM (Netpbm PGM/PPM) driver — read + write, from scratch.

Reference: frmts/pnmdataset.cpp (GDAL's PNM driver: P5/P6 binary and
P2/P3 ASCII, 8- and 16-bit maxval). Parity gate: the reference's own
autotest fixtures decode to their pinned GDALChecksumImage values
(autotest/gdrivers/pnm.py:27 byte.pgm band1 = 4672, :49 rgbsmall.ppm
band2 = 21053).

Comments (#...) are legal anywhere in the header per the spec and are
stripped token-wise. 16-bit binary samples are big-endian per Netpbm.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_pnm", "write_pnm", "read_pnm_tiles"]


def _tokens(buf: bytes):
    """Header tokenizer: whitespace-separated, # comments to EOL."""
    i = 0
    n = len(buf)
    while True:
        while i < n and buf[i:i + 1].isspace():
            i += 1
        if i < n and buf[i] == 0x23:  # '#'
            while i < n and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        start = i
        while i < n and not buf[i:i + 1].isspace() and buf[i] != 0x23:
            i += 1
        if start == i:
            return
        yield start, buf[start:i]


def read_pnm(path: str) -> np.ndarray:
    """-> (h, w) uint8/uint16 for PGM, (h, w, 3) for PPM."""
    with open(path, "rb") as f:
        buf = f.read()
    toks = _tokens(buf)
    _, magic = next(toks)
    magic = magic.decode()
    if magic not in ("P2", "P3", "P5", "P6"):
        raise ValueError(f"unsupported PNM magic {magic!r}")
    _, wtok = next(toks)
    _, htok = next(toks)
    mpos, mtok = next(toks)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    bands = 3 if magic in ("P3", "P6") else 1
    dt = np.uint16 if maxval > 255 else np.uint8
    count = w * h * bands
    if magic in ("P5", "P6"):
        # exactly ONE whitespace byte after maxval, then raster
        data_start = mpos + len(mtok) + 1
        raw = buf[data_start:]
        if maxval > 255:
            arr = np.frombuffer(raw, ">u2", count=count).astype(np.uint16)
        else:
            arr = np.frombuffer(raw, np.uint8, count=count)
    else:
        vals = buf[mpos + len(mtok):].split()
        arr = np.array([int(v) for v in vals[:count]], dtype=dt)
    arr = arr.reshape(h, w, bands) if bands == 3 else arr.reshape(h, w)
    return arr.astype(dt)


def write_pnm(arr: np.ndarray, path: str, *, ascii_format: bool = False):
    """uint8/uint16 (h, w) -> PGM, (h, w, 3) -> PPM."""
    arr = np.asarray(arr)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("PNM supports uint8/uint16")
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError("PPM needs 3 bands")
    maxval = 65535 if arr.dtype == np.uint16 else 255
    magic = ("P3" if ascii_format else "P6") if color else \
        ("P2" if ascii_format else "P5")
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"{magic}\n{w} {h}\n{maxval}\n".encode())
        if ascii_format:
            flat = arr.reshape(h, -1)
            for row in flat:
                f.write((" ".join(str(int(v)) for v in row) + "\n")
                        .encode())
        elif arr.dtype == np.uint16:
            f.write(arr.astype(">u2").tobytes())
        else:
            f.write(arr.tobytes())


def read_pnm_tiles(path: str, *, tile: int = 256):
    """open_source driver: fan the image into the engine's tile rows
    (same layout as read_geotiff_tiles; multi-band adds a `band`
    column)."""
    import pyarrow as pa
    import ray.data as rd

    arr = read_pnm(path)
    planes = ([(0, arr)] if arr.ndim == 2
              else [(b, arr[:, :, b]) for b in range(arr.shape[2])])
    rows = {"band": [], "tile_x": [], "tile_y": [], "w": [], "h": [],
            "data": []}
    for b, plane in planes:
        h, w = plane.shape
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                piece = plane[ty:ty + tile, tx:tx + tile]
                rows["band"].append(b)
                rows["tile_x"].append(tx // tile)
                rows["tile_y"].append(ty // tile)
                rows["w"].append(piece.shape[1])
                rows["h"].append(piece.shape[0])
                rows["data"].append(np.ascontiguousarray(piece).tobytes())
    t = pa.table({
        "band": pa.array(rows["band"], pa.int64()),
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "data": pa.array(rows["data"], pa.binary()),
    })
    return rd.from_arrow(t)
