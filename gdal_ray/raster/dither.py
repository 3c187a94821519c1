"""Floyd-Steinberg error-diffusion dithering (RGB -> palette index).

Reference: alg/gdaldither.cpp (GDALDitherRGB2PCT) — serpentine-free
left-to-right Floyd-Steinberg with the classic 7/16, 3/16, 5/16, 1/16
kernel and nearest-palette matching. Error diffusion is inherently
sequential WITHIN an image (each pixel's quantization error feeds the
pixels right and below), so the distributed mapping dithers each TILE
independently: exact Floyd-Steinberg inside a tile, no error flow across
tile edges (a documented approximation — the reference dithers the whole
image in one sequential pass; per-tile independence is what makes the
operator parallel, and the boundary effect is one pixel row/column of
slightly different rounding per seam). Deterministic end-to-end.

The per-pixel loop is genuinely sequential (the algorithm's data
dependency, not a vectorization miss); rows buffer the downward error
vectorized, so the Python-level work is one small inner loop per pixel
over precomputed numpy rows. Tiles parallelize across the cluster.
"""

from __future__ import annotations

import numpy as np


def find_nearest_color(palette: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """Nearest palette index per pixel (squared-distance argmin — the
    color-cube acceleration in gdaldither.cpp approximates exactly this).
    rgb: (..., 3) float or uint8; palette: (n, 3)."""
    p = palette.astype(np.float64)
    v = rgb.astype(np.float64)
    d = ((v[..., None, :] - p[None, :, :]) ** 2).sum(axis=-1)
    return d.argmin(axis=-1).astype(np.uint8)


def dither_rgb_to_palette(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd-Steinberg dither one (H, W, 3) uint8 image to palette
    indices (H, W) uint8. Exact classic kernel:

        . * 7/16          (* = current pixel)
     3/16 5/16 1/16
    """
    h, w, _ = img.shape
    p = palette.astype(np.float64)
    out = np.empty((h, w), np.uint8)
    cur = img[0].astype(np.float64)  # working row with accumulated error
    for y in range(h):
        nxt = (img[y + 1].astype(np.float64) if y + 1 < h
               else np.zeros((w, 3)))
        for x in range(w):
            v = np.clip(cur[x], 0.0, 255.0)
            i = int(((v - p) ** 2).sum(axis=1).argmin())
            out[y, x] = i
            err = v - p[i]
            if x + 1 < w:
                cur[x + 1] += err * (7.0 / 16.0)
                nxt[x + 1] += err * (1.0 / 16.0)
            if x > 0:
                nxt[x - 1] += err * (3.0 / 16.0)
            nxt[x] += err * (5.0 / 16.0)
        cur = nxt
    return out


def dither_tiles(tiles_ds, palette: np.ndarray, *, width: int = 256,
                 height: int = 256, rgb_col: str = "data",
                 out_col: str = "indexed"):
    """Dither a Dataset of RGB tile rows (raw uint8 H*W*3 bytes in
    `rgb_col`) to palette-index tiles — each tile exactly
    Floyd-Steinberg, tiles independent (see module docstring). The
    palette broadcasts once via the task closure."""
    import pyarrow as pa

    pal = np.ascontiguousarray(palette, dtype=np.uint8)

    def f(t: pa.Table) -> pa.Table:
        outs = []
        for buf in t[rgb_col].to_pylist():
            img = np.frombuffer(buf, np.uint8).reshape(height, width, 3)
            outs.append(dither_rgb_to_palette(img, pal).tobytes())
        return (t.drop_columns([rgb_col])
                .append_column(out_col, pa.array(outs, pa.binary())))

    return tiles_ds.map_batches(f, batch_format="pyarrow", batch_size=None)
