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
