"""WebMercatorQuad tile math — the reference's default tile matrix set
(apps/gdalalg_raster_tile.cpp:192-214, aliases GoogleMapsCompatible/mercator).

Pure vectorized numpy; all functions take/return ndarrays. The tile formulas
are the standard slippy-map equations, also expressible in ANSI SQL (the
DuckDB oracles replicate them verbatim).
"""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112877980659  # WebMercator latitude clamp
TILE_SIZE = 256


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, zoom: int):
    """(lon, lat) degrees -> (tile_x, tile_y) at zoom (int64)."""
    n = float(1 << zoom)
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    x = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def lonlat_to_pixel(lon: np.ndarray, lat: np.ndarray, zoom: int):
    """Global pixel coordinates at zoom (float64), 256px tiles."""
    n = float(1 << zoom) * TILE_SIZE
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    px = (lon + 180.0) / 360.0 * n
    lat_rad = np.radians(lat)
    py = (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    return px, py


def tile_bounds(tx: int, ty: int, zoom: int):
    """(lon_min, lat_min, lon_max, lat_max) of a tile."""
    n = float(1 << zoom)

    def lon(x):
        return x / n * 360.0 - 180.0

    def lat(y):
        t = np.pi * (1.0 - 2.0 * y / n)
        return np.degrees(np.arctan(np.sinh(t)))

    return lon(tx), lat(ty + 1), lon(tx + 1), lat(ty)


def parent_tile(tx: np.ndarray, ty: np.ndarray):
    """Tile at zoom-1 containing (tx, ty) — the overview reduce key
    (apps/gdalalg_raster_tile.cpp:1576-1696: one overview tile from up to
    four tiles of the zoom below)."""
    return tx >> 1, ty >> 1


def quadkey(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    """Interleaved-bit quadkey (int64) — a locality-preserving sort key."""
    q = np.zeros_like(tx, dtype=np.int64)
    for b in range(zoom - 1, -1, -1):
        q = (q << 2) | (((ty >> b) & 1) << 1) | ((tx >> b) & 1)
    return q
