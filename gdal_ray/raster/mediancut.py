"""Median-cut palette computation + palette remap over RGB tile tables.

Reference: alg/gdalmediancut.cpp (GDALComputeMedianCutPCT) — GDAL builds a
5-bits-per-channel (32768-cell) color histogram and recursively splits the
box with the largest pixel count along its longest axis at the median.
Distributed restatement: the histogram is a per-batch np.bincount partial
merged with groupby_agg (the shuffle moves <=32768 rows per block); the
median-cut recursion runs on the driver over the BOUNDED 32768-cell
histogram (independent of raster size); the remap broadcasts a 32768-entry
color->palette-index LUT and maps each tile vectorized.

Error-diffusion dithering (alg/gdaldither.cpp) is deliberately NOT
distributed: Floyd-Steinberg propagates error pixel-to-pixel across the
whole image, a documented-sequential algorithm (see VERDICT r1/r2 notes);
the palette remap here is the nearest-color (no-dither) path.

Tile model: packed 0x00RRGGBB uint32 buffers (the pansharpen output
layout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TILE = 256
_BITS = 5
_SIDE = 1 << _BITS
_CELLS = _SIDE**3


def _rgb_to_cell(rgb: np.ndarray) -> np.ndarray:
    r = (rgb >> np.uint32(16)) & np.uint32(0xFF)
    g = (rgb >> np.uint32(8)) & np.uint32(0xFF)
    b = rgb & np.uint32(0xFF)
    return ((r >> np.uint32(8 - _BITS)) * _SIDE * _SIDE
            + (g >> np.uint32(8 - _BITS)) * _SIDE
            + (b >> np.uint32(8 - _BITS))).astype(np.int64)


def color_histogram(tiles_ds, *, data_col: str = "data"):
    """Dataset of packed-RGB tiles -> Dataset (cell, n) over the 5-bit
    histogram (sparse rows)."""
    from gdal_ray.ops.relational import groupby_agg

    def part(t: pa.Table) -> pa.Table:
        counts = np.zeros(_CELLS, dtype=np.int64)
        for buf in t[data_col].to_pylist():
            rgb = np.frombuffer(buf, dtype=np.uint32)
            counts += np.bincount(_rgb_to_cell(rgb), minlength=_CELLS)
        nz = np.flatnonzero(counts)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    partials = tiles_ds.map_batches(part, batch_format="pyarrow", batch_size=None)
    return groupby_agg(partials, ["cell"], [("n", "sum", "n")])


def median_cut(hist_cells: np.ndarray, hist_counts: np.ndarray,
               n_colors: int = 256) -> np.ndarray:
    """Median-cut over the sparse 5-bit histogram -> (n, 3) uint8 palette
    (count-weighted mean color per final box, GDAL's choice)."""
    r = (hist_cells // (_SIDE * _SIDE)).astype(np.int64)
    g = ((hist_cells // _SIDE) % _SIDE).astype(np.int64)
    b = (hist_cells % _SIDE).astype(np.int64)
    chans = np.stack([r, g, b], axis=1)
    boxes = [np.arange(hist_cells.size)]
    while len(boxes) < n_colors:
        # split the box with the most pixels that still spans >1 cell
        sizes = [hist_counts[ix].sum() if ix.size > 1 else -1 for ix in boxes]
        i = int(np.argmax(sizes))
        if sizes[i] <= 0:
            break
        ix = boxes[i]
        spans = chans[ix].max(axis=0) - chans[ix].min(axis=0)
        ax = int(np.argmax(spans))
        if spans[ax] == 0:
            sizes[i] = -1
            boxes.append(boxes.pop(i))  # unsplittable; rotate to the back
            continue
        order = ix[np.argsort(chans[ix, ax], kind="mergesort")]
        cum = np.cumsum(hist_counts[order])
        half = cum[-1] / 2.0
        k = int(np.searchsorted(cum, half)) + 1
        k = min(max(k, 1), order.size - 1)
        boxes[i] = order[:k]
        boxes.append(order[k:])
    pal = np.zeros((len(boxes), 3), np.uint8)
    for j, ix in enumerate(boxes):
        w = hist_counts[ix].astype(np.float64)
        c = (chans[ix] * w[:, None]).sum(axis=0) / max(w.sum(), 1.0)
        # cell index -> 8-bit channel center
        pal[j] = np.clip(np.round(c * (1 << (8 - _BITS))
                                  + (1 << (8 - _BITS - 1))), 0, 255)
    return pal


def compute_median_cut_pct(tiles_ds, n_colors: int = 256,
                           *, data_col: str = "data") -> np.ndarray:
    """End-to-end GDALComputeMedianCutPCT: distributed histogram + driver
    median-cut. Returns the (n, 3) uint8 palette."""
    from gdal_ray.util import to_arrow

    h = to_arrow(color_histogram(tiles_ds, data_col=data_col))
    cells = h["cell"].to_numpy()
    counts = h["n"].to_numpy()
    return median_cut(cells, counts, n_colors)


def remap_to_palette(tiles_ds, palette: np.ndarray, *, data_col: str = "data"):
    """Map packed-RGB tiles to palette indices (nearest color in RGB
    space, via a broadcast 32768-entry LUT — one distance matmul per
    process, O(1) per pixel after that). Output rows keep all columns,
    with `data` replaced by uint8 palette indices."""
    import ray

    pal = np.asarray(palette, np.float64)
    # LUT over 5-bit cells: nearest palette entry per cell center
    idx = np.arange(_CELLS)
    centers = np.stack([
        idx // (_SIDE * _SIDE), (idx // _SIDE) % _SIDE, idx % _SIDE,
    ], axis=1) * (1 << (8 - _BITS)) + (1 << (8 - _BITS - 1))
    d2 = ((centers[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
    lut = np.argmin(d2, axis=1).astype(np.uint8)
    lut_ref = ray.put(lut)

    def remap(t: pa.Table) -> pa.Table:
        L = ray.get(lut_ref)
        out = []
        for buf in t[data_col].to_pylist():
            rgb = np.frombuffer(buf, dtype=np.uint32)
            out.append(L[_rgb_to_cell(rgb)].tobytes())
        i = t.column_names.index(data_col)
        return t.set_column(i, data_col, pa.array(out, pa.binary()))

    return tiles_ds.map_batches(remap, batch_format="pyarrow", batch_size=None)
