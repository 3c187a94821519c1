"""Arc/Info ASCII Grid (AAIGrid) driver — read + write, from scratch.

Reference: frmts/aaigrid/aaigriddataset.cpp. Header keys are
case-insensitive (`ncols nrows xllcorner|xllcenter yllcorner|yllcenter
cellsize|dx+dy [NODATA_value]`); corner registration converts to the
GDAL geotransform with origin at the TOP-left (rows run north->south).
European decimal commas (the reference's pixel_per_line_comma.asc
fixture) are accepted. Values parse as float64; an all-integral grid
(and an integral nodata) downcasts to int32, mirroring the reference's
Int32-vs-Float type sniffing.

Parity gate: the reference's own fixtures decode to their pinned
checksums (autotest/gdrivers/aaigrid.py:33 byte.tif.grd = 4672, :46
pixel_per_line.asc = 1123), and a GeoTIFF -> AAIGrid -> read round trip
reproduces the createcopy table (byte.tif -> 4672).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_aaigrid", "write_aaigrid", "read_aaigrid_tiles"]

_HEADER_KEYS = {"ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
                "yllcenter", "cellsize", "dx", "dy", "nodata_value"}


def read_aaigrid(path: str):
    """-> (array (nrows, ncols) float64|int32, geotransform 6-tuple,
    nodata or None)."""
    with open(path) as f:
        text = f.read()
    toks = text.split()
    hdr: dict = {}
    i = 0
    while i + 1 < len(toks) and toks[i].lower() in _HEADER_KEYS:
        key = toks[i].lower()
        hdr[key] = float(toks[i + 1].replace(",", "."))
        i += 2
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("AAIGrid header missing ncols/nrows")
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    if ncols <= 0 or nrows <= 0 or ncols * nrows > 1 << 30:
        raise ValueError("implausible AAIGrid dimensions")
    dx = hdr.get("dx", hdr.get("cellsize", 1.0))
    dy = hdr.get("dy", hdr.get("cellsize", 1.0))
    vals = np.array([float(t.replace(",", ".")) for t in
                     toks[i:i + ncols * nrows]], dtype=np.float64)
    if vals.size != ncols * nrows:
        raise ValueError("AAIGrid data truncated")
    arr = vals.reshape(nrows, ncols)
    nodata = hdr.get("nodata_value")
    # corner vs center registration -> top-left origin geotransform
    if "xllcenter" in hdr:
        x0 = hdr["xllcenter"] - dx / 2
    else:
        x0 = hdr.get("xllcorner", 0.0)
    if "yllcenter" in hdr:
        ylow = hdr["yllcenter"] - dy / 2
    else:
        ylow = hdr.get("yllcorner", 0.0)
    gt = (x0, dx, 0.0, ylow + nrows * dy, 0.0, -dy)
    if (np.isfinite(arr).all() and (arr == np.floor(arr)).all()
            and (np.abs(arr) < 2**31).all()
            and (nodata is None or (np.isfinite(nodata)
                                    and nodata == int(nodata)))):
        arr = arr.astype(np.int32)
    return arr, gt, nodata


def write_aaigrid(arr: np.ndarray, path: str, *, geotransform=None,
                  nodata=None):
    """(nrows, ncols) -> .asc with corner registration (square cells
    required, like the reference's CreateCopy)."""
    arr = np.asarray(arr)
    nrows, ncols = arr.shape
    if geotransform is None:
        geotransform = (0.0, 1.0, 0.0, float(nrows), 0.0, -1.0)
    x0, dx, _, ytop, _, neg_dy = geotransform
    dy = -neg_dy
    if abs(dx - dy) > 1e-9 * abs(dx):
        raise ValueError("AAIGrid requires square cells")
    ylow = ytop - nrows * dy
    is_int = np.issubdtype(arr.dtype, np.integer)
    with open(path, "w") as f:
        f.write(f"ncols        {ncols}\n")
        f.write(f"nrows        {nrows}\n")
        f.write(f"xllcorner    {x0:.12f}\n")
        f.write(f"yllcorner    {ylow:.12f}\n")
        f.write(f"cellsize     {dx:.12f}\n")
        if nodata is not None:
            f.write(f"NODATA_value {nodata}\n")
        for row in arr:
            if is_int:
                f.write(" ".join(str(int(v)) for v in row) + "\n")
            else:
                f.write(" ".join(repr(float(v)) for v in row) + "\n")


def read_aaigrid_tiles(path: str, *, tile: int = 256):
    """open_source driver: tile-fan (same layout as read_geotiff_tiles)."""
    import pyarrow as pa
    import ray.data as rd

    arr, gt, nodata = read_aaigrid(path)
    h, w = arr.shape
    rows = {"tile_x": [], "tile_y": [], "w": [], "h": [], "data": []}
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            piece = arr[ty:ty + tile, tx:tx + tile]
            rows["tile_x"].append(tx // tile)
            rows["tile_y"].append(ty // tile)
            rows["w"].append(piece.shape[1])
            rows["h"].append(piece.shape[0])
            rows["data"].append(
                np.ascontiguousarray(piece.astype(np.float64)).tobytes())
    return rd.from_arrow(pa.table({
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "data": pa.array(rows["data"], pa.binary()),
    }))
