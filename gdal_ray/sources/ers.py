"""ERMapper ERS driver (read) — from scratch.

Reference: frmts/ers/ersdataset.cpp. A `.ers` text header (nested
Begin/End blocks, `key = value`, # comments OUTSIDE quoted strings,
quoted strings with backslash escapes, { } multi-line values) describes
a raw BIL data file of the same name without the .ers suffix. CellType
names map to numpy dtypes; ByteOrder MSBFirst/LSBFirst; registration
cell + cell dimensions give the geotransform.

Parity gate: the reference's fixtures — srtm.ers (a header that
deliberately stresses comments/escapes) pinned at 64074 and ers_dem.ers
at 56588 (autotest/gdrivers/ers.py:29/:75).
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = ["read_ers"]

_CELLTYPES = {
    "unsigned8bitinteger": np.uint8,
    "signed8bitinteger": np.int8,
    "unsigned16bitinteger": np.uint16,
    "signed16bitinteger": np.int16,
    "unsigned32bitinteger": np.uint32,
    "signed32bitinteger": np.int32,
    "ieee4bytereal": np.float32,
    "ieee8bytereal": np.float64,
}


def _strip_comments(text: str) -> str:
    """Drop # comments, honoring quoted strings (with \\ escapes)."""
    out = []
    i = 0
    n = len(text)
    in_q = False
    while i < n:
        ch = text[i]
        if in_q:
            out.append(ch)
            if ch == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if ch == '"':
                in_q = False
            i += 1
            continue
        if ch == '"':
            in_q = True
            out.append(ch)
            i += 1
            continue
        if ch == "#":
            while i < n and text[i] != "\n":
                i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_header(text: str) -> dict:
    """Flatten `key = value` pairs (last wins; block structure not
    needed for the raster keys)."""
    text = _strip_comments(text)
    vals: dict[str, str] = {}
    # fold { ... } multi-line values onto one line
    text = re.sub(r"\{[^}]*\}",
                  lambda m: m.group(0).replace("\n", " "), text)
    for line in text.splitlines():
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        vals[key.strip().lower()] = val.strip().strip('"')
    return vals


def _dms(v: str) -> float:
    parts = v.strip().split(":")
    if len(parts) == 3:
        d = float(parts[0])
        sign = -1.0 if v.strip().startswith("-") else 1.0
        return d + sign * (float(parts[1]) / 60 + float(parts[2]) / 3600)
    return float(v)


def read_ers(path: str):
    """-> (array (bands, rows, cols), geotransform, nodata or None)."""
    hdr = _parse_header(open(path).read())
    w = int(hdr["nrofcellsperline"])
    h = int(hdr["nroflines"])
    nb = int(hdr.get("nrofbands", "1"))
    ct = hdr.get("celltype", "Unsigned8BitInteger").lower()
    if ct not in _CELLTYPES:
        raise NotImplementedError(f"ERS CellType {ct}")
    dt = np.dtype(_CELLTYPES[ct])
    if hdr.get("byteorder", "LSBFirst").lower() == "msbfirst":
        dt = dt.newbyteorder(">")
    data_path = hdr.get("datafile") or os.path.splitext(path)[0]
    if not os.path.isabs(data_path):
        data_path = os.path.join(os.path.dirname(path),
                                 os.path.basename(data_path))
    off = int(hdr.get("headeroffset", "0"))
    arr = np.fromfile(data_path, dt, count=w * h * nb, offset=off)
    if arr.size != w * h * nb:
        raise ValueError("ERS data truncated")
    cube = arr.reshape(h, nb, w).transpose(1, 0, 2)  # BIL
    xd = float(hdr.get("xdimension", "1"))
    yd = float(hdr.get("ydimension", "1"))
    rcx = float(hdr.get("registrationcellx", "0"))
    rcy = float(hdr.get("registrationcelly", "0"))
    lon = _dms(hdr.get("longitude", hdr.get("eastings", "0")))
    lat = _dms(hdr.get("latitude", hdr.get("northings", "0")))
    gt = (lon - rcx * xd, xd, 0.0, lat + rcy * yd, 0.0, -yd)
    nodata = hdr.get("nullcellvalue")
    return (np.ascontiguousarray(cube), gt,
            float(nodata) if nodata is not None else None)
