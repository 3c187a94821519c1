"""Distributed (tiled) contour vs single-array contour + band polygons."""

import numpy as np
import pandas as pd
import ray.data as rd

from gdal_ray.raster.analysis import contour
from gdal_ray.stages.contour import TILE, contour_band_polygons, contour_tiles_ds


def _tiles_from(arr, n):
    rows = []
    for ty in range(n):
        for tx in range(n):
            sub = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            rows.append({"zoom": 5, "tile_x": tx, "tile_y": ty,
                         "data": np.ascontiguousarray(sub.astype(np.float32)).tobytes()})
    return rd.from_pandas(pd.DataFrame(rows))


def _vertex_set(lines):
    out = set()
    for line in lines:
        for p in line:
            out.add((round(float(p[0]), 5), round(float(p[1]), 5)))
    return out


def test_tiled_contour_matches_single_array():
    n = 2
    yy, xx = np.mgrid[0 : n * TILE, 0 : n * TILE]
    cx = cy = n * TILE / 2.0
    field = np.hypot(xx + 0.5 - cx, yy + 0.5 - cy).astype(np.float32)
    levels = [100.0, 200.0]
    tiled = contour_tiles_ds(_tiles_from(field, n), levels)
    single = contour(field, levels)

    for lv in levels:
        got = _vertex_set([l for v, l in tiled if v == lv])
        exp = _vertex_set([l for v, l in single if v == lv])
        assert got == exp, f"level {lv}: vertex sets differ"
    # circle contours: every vertex sits at radius ~level from the center
    for lv, line in tiled:
        r = np.hypot(line[:, 0] - cx, line[:, 1] - cy)
        assert np.abs(r - lv).max() < 0.51  # within half-pixel interpolation
        # the merged contour is CLOSED (crossed 4 tile seams)
        assert np.allclose(line[0], line[-1], atol=1e-6)


def test_band_polygons_conserve_pixels():
    n = 2
    yy, xx = np.mgrid[0 : n * TILE, 0 : n * TILE]
    field = np.hypot(xx + 0.5 - 256.0, yy + 0.5 - 256.0).astype(np.float32)
    levels = [100.0, 200.0]
    polys = contour_band_polygons(_tiles_from(field, n), levels)

    def area(rings):
        a = 0.0
        for r in rings:
            x, y = r[:, 0], r[:, 1]
            a += float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
        return -a / 2.0

    bands = np.digitize(field.astype(np.float64), levels)
    import collections

    by_band = collections.Counter()
    for v, rings in polys:
        by_band[int(v)] += area(rings)
    for b in (0, 1, 2):
        assert by_band[b] == int((bands == b).sum()), b
