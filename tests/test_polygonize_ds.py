"""Ray-task distributed polygonize wrapper."""

import numpy as np
import pandas as pd
import ray.data as rd

from gdal_ray.stages.raster import TILE, polygonize_tiles, polygonize_tiles_ds


def test_polygonize_tiles_ds_matches_local():
    rng = np.random.RandomState(21)
    arr = rng.randint(0, 2, size=(2 * TILE, 2 * TILE)).astype(np.uint32)
    rows, tiles = [], []
    for ty in range(2):
        for tx in range(2):
            sub = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            rows.append({"zoom": 3, "tile_x": tx, "tile_y": ty, "data": sub.tobytes()})
            tiles.append(((tx, ty), sub))
    via_ray = polygonize_tiles_ds(rd.from_pandas(pd.DataFrame(rows)), connectivity=4)
    local = polygonize_tiles(tiles, connectivity=4)

    def summarize(polys):
        out = []
        for v, rings in polys:
            a = 0.0
            for r in rings:
                x, y = r[:, 0], r[:, 1]
                a += float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
            out.append((int(v), round(-a / 2.0, 6)))
        return sorted(out)

    assert summarize(via_ray) == summarize(local)


def test_polygonize_ds_16x16_tile_grid():
    # VERDICT r1 item 5 done-criterion: a >=16x16-tile raster through the
    # Ray-native merge (border pairing + union-find + stitch as Ray stages).
    # Diagonal bands create components spanning MANY tiles in both axes.
    n = 16
    yy, xx = np.mgrid[0 : n * TILE, 0 : n * TILE]
    arr = (((xx + yy) // 700) % 3).astype(np.uint32)
    rows, tiles = [], []
    for ty in range(n):
        for tx in range(n):
            sub = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            rows.append({"zoom": 5, "tile_x": tx, "tile_y": ty,
                         "data": np.ascontiguousarray(sub).tobytes()})
            tiles.append(((tx, ty), sub))
    via_ray = polygonize_tiles_ds(rd.from_pandas(pd.DataFrame(rows)), connectivity=4)
    local = polygonize_tiles(tiles, connectivity=4)

    def area(rings):
        a = 0.0
        for r in rings:
            x, y = r[:, 0], r[:, 1]
            a += float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
        return round(-a / 2.0, 6)

    got = sorted((int(v), area(r)) for v, r in via_ray)
    exp = sorted((int(v), area(r)) for v, r in local)
    assert got == exp
    # pixel conservation: component areas per value == pixel counts per value
    import collections

    by_val = collections.Counter()
    for v, r in via_ray:
        by_val[int(v)] += area(r)
    for v in (0, 1, 2):
        assert by_val[v] == int((arr == v).sum()), v
