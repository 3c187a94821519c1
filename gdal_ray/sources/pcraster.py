"""PCRaster CSF 2.0 (.map) reader — from scratch.

Reference: frmts/pcraster (GDAL wraps libcsf). CSF layout: 27-byte
signature "RUU CROSS SYSTEM MAP FORMAT", main header (version, file id,
projection, attribute-table offset, map type, byte order), raster
header at offset 64 (uint16 valueScale, uint16 cellRepr, min/max cells,
double xUL/yUL, uint32 nrRows/nrCols, double cellSizeX/Y, angle), data
at offset 256, row-major. Cell-representation codes from csftypes.h;
missing values are the type's all-ones pattern (255 for UINT1, NaN for
reals).

Parity gate: the reference's ldd.map fixture decodes to its pinned
checksum 4528 (autotest/gdrivers/pcraster.py:27).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_pcraster"]

_SIG = b"RUU CROSS SYSTEM MAP FORMAT"

_CELL_REPR = {
    0x00: np.uint8,    # CR_UINT1
    0x11: np.uint16,   # CR_UINT2
    0x22: np.uint32,   # CR_UINT4
    0x04: np.int8,     # CR_INT1
    0x15: np.int16,    # CR_INT2
    0x26: np.int32,    # CR_INT4
    0x5A: np.float32,  # CR_REAL4
    0xDB: np.float64,  # CR_REAL8
}

_MISSING = {
    np.uint8: 255, np.uint16: 0xFFFF, np.uint32: 0xFFFFFFFF,
    np.int8: -128, np.int16: -32768, np.int32: -2147483648,
}


def read_pcraster(path: str):
    """-> (array (rows, cols), geotransform, nodata, value_scale)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:27] != _SIG:
        raise ValueError("not a PCRaster CSF file")
    value_scale, cell_repr = struct.unpack("<HH", buf[64:68])
    if cell_repr not in _CELL_REPR:
        raise NotImplementedError(f"CSF cell representation 0x{cell_repr:x}")
    dt = np.dtype(_CELL_REPR[cell_repr])
    x_ul, y_ul = struct.unpack("<dd", buf[84:100])
    nrows, ncols = struct.unpack("<II", buf[100:108])
    csx, csy = struct.unpack("<dd", buf[108:124])
    if nrows * ncols * dt.itemsize > len(buf) - 256:
        raise ValueError("CSF data truncated")
    arr = np.frombuffer(buf, dt, count=nrows * ncols,
                        offset=256).reshape(nrows, ncols)
    nodata = (np.nan if dt.kind == "f"
              else _MISSING[_CELL_REPR[cell_repr]])
    gt = (x_ul, csx, 0.0, y_ul, 0.0, -csy)
    return arr.copy(), gt, nodata, value_scale
