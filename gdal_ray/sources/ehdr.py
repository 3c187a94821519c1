"""ESRI .hdr-labelled raw raster (EHdr / BIL-FLT) driver — read + write.

Reference: frmts/raw/ehdrdataset.cpp. A whitespace `key value` .hdr
sidecar describes the raw file: NCOLS/NROWS/NBANDS/NBITS, BYTEORDER
(I/lsbfirst little, M/msbfirst big), LAYOUT bil|bip|bsq, SKIPBYTES,
PIXELTYPE (FLOAT/SIGNEDINT), and either ULXMAP/ULYMAP (center of the
upper-left pixel) + XDIM/YDIM or xllcorner/yllcorner + cellsize.
Missing NBITS is inferred from the file size; 32 bits without a
PIXELTYPE decodes as float32 (the reference's rule — its own ehdr10.bil
fixture relies on it).

Parity gate: the reference's fixtures decode to their pinned checksums
(autotest/gdrivers/ehdr.py:54 float32.bil = 27, :186 ehdr10.bil = 8202,
:195 ehdr11.flt = 8202).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_ehdr", "write_ehdr"]


def _hdr_for(path: str) -> str:
    base = os.path.splitext(path)[0]
    for cand in (base + ".hdr", path + ".hdr", base + ".HDR"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no .hdr sidecar for {path}")


def read_ehdr(path: str):
    """-> (array (bands, rows, cols), geotransform, nodata or None)."""
    hdr: dict = {}
    for line in open(_hdr_for(path)):
        parts = line.split()
        if len(parts) >= 2:
            hdr[parts[0].lower()] = parts[1]
    ncols = int(hdr["ncols"])
    nrows = int(hdr["nrows"])
    nbands = int(hdr.get("nbands", "1"))
    skip = int(hdr.get("skipbytes", "0"))
    fsize = os.path.getsize(path) - skip
    nbits = int(hdr.get("nbits", "0"))
    if nbits == 0:
        nbits = max(8, (fsize * 8) // max(ncols * nrows * nbands, 1))
        nbits = 32 if nbits >= 32 else 16 if nbits >= 16 else 8
    ptype = hdr.get("pixeltype", "").lower()
    if path.lower().endswith(".flt"):
        ptype = ptype or "float"
    if nbits == 32:
        dt = np.dtype(np.int32) if ptype == "signedint" \
            else np.dtype(np.float32)
    elif nbits == 16:
        dt = np.dtype(np.int16) if ptype == "signedint" \
            else np.dtype(np.uint16)
    elif nbits == 8:
        dt = np.dtype(np.int8) if ptype == "signedint" \
            else np.dtype(np.uint8)
    else:
        raise NotImplementedError(f"EHdr NBITS {nbits}")
    bo = hdr.get("byteorder", "i").lower()
    if bo.startswith("m"):
        dt = dt.newbyteorder(">")
    arr = np.fromfile(path, dt, count=ncols * nrows * nbands, offset=skip)
    if arr.size != ncols * nrows * nbands:
        raise ValueError("EHdr data truncated")
    layout = hdr.get("layout", "bil").lower()
    if layout == "bil":
        cube = arr.reshape(nrows, nbands, ncols).transpose(1, 0, 2)
    elif layout == "bip":
        cube = arr.reshape(nrows, ncols, nbands).transpose(2, 0, 1)
    else:  # bsq
        cube = arr.reshape(nbands, nrows, ncols)
    if "ulxmap" in hdr:
        xdim = float(hdr.get("xdim", hdr.get("cellsize", "1")))
        ydim = float(hdr.get("ydim", hdr.get("cellsize", "1")))
        gt = (float(hdr["ulxmap"]) - xdim / 2, xdim, 0.0,
              float(hdr["ulymap"]) + ydim / 2, 0.0, -ydim)
    else:
        cs = float(hdr.get("cellsize", "1"))
        x0 = float(hdr.get("xllcorner", "0"))
        ylow = float(hdr.get("yllcorner", "0"))
        gt = (x0, cs, 0.0, ylow + nrows * cs, 0.0, -cs)
    nodata = hdr.get("nodata") or hdr.get("nodata_value")
    return (np.ascontiguousarray(cube), gt,
            float(nodata) if nodata is not None else None)


def write_ehdr(cube: np.ndarray, path: str, *, geotransform=None,
               nodata=None):
    """(bands, rows, cols) or (rows, cols) -> BIL raw + .hdr sidecar.
    uint8/int16/uint16/int32/float32 supported."""
    cube = np.asarray(cube)
    if cube.ndim == 2:
        cube = cube[None]
    nb, h, w = cube.shape
    dt = cube.dtype
    if dt == np.uint8:
        nbits, ptype = 8, None
    elif dt == np.int16:
        nbits, ptype = 16, "SIGNEDINT"
    elif dt == np.uint16:
        nbits, ptype = 16, None
    elif dt == np.int32:
        nbits, ptype = 32, "SIGNEDINT"
    elif dt == np.float32:
        nbits, ptype = 32, "FLOAT"
    else:
        raise ValueError(f"EHdr cannot store dtype {dt}")
    cube.transpose(1, 0, 2).astype(dt.newbyteorder("<")).tofile(path)
    gt = geotransform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    x0, dx, _, ytop, _, neg_dy = gt
    lines = [f"NCOLS {w}", f"NROWS {h}", f"NBANDS {nb}",
             f"NBITS {nbits}", "BYTEORDER I", "LAYOUT BIL",
             f"ULXMAP {x0 + dx / 2}", f"ULYMAP {ytop + neg_dy / 2}",
             f"XDIM {dx}", f"YDIM {-neg_dy}"]
    if ptype:
        lines.append(f"PIXELTYPE {ptype}")
    if nodata is not None:
        lines.append(f"NODATA {nodata}")
    with open(os.path.splitext(path)[0] + ".hdr", "w") as f:
        f.write("\n".join(lines) + "\n")
