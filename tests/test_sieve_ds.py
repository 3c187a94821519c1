"""Distributed cross-tile sieve vs the single-array sieve."""

import numpy as np
import pandas as pd
import ray.data as rd

from gdal_ray.raster.analysis import sieve
from gdal_ray.stages.sieve import TILE, sieve_tiles_ds
from gdal_ray.util import to_arrow


def _tiles_from(arr, n):
    rows = []
    for ty in range(n):
        for tx in range(n):
            sub = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            rows.append({"zoom": 5, "tile_x": tx, "tile_y": ty,
                         "data": np.ascontiguousarray(sub.astype(np.uint32)).tobytes()})
    return rd.from_pandas(pd.DataFrame(rows))


def _reassemble(t, n):
    full = np.zeros((n * TILE, n * TILE), np.uint32)
    for i in range(t.num_rows):
        tx, ty = t["tile_x"][i].as_py(), t["tile_y"][i].as_py()
        full[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE] = (
            np.frombuffer(t["data"][i].as_py(), np.uint32).reshape(TILE, TILE))
    return full


def test_sieve_ds_matches_single_array():
    # background 1 with distinct-size islands (no tie-break ambiguity),
    # including one island straddling all four tile borders
    n = 2
    arr = np.ones((n * TILE, n * TILE), np.uint32)
    arr[10:13, 10:14] = 2        # 12 px, small -> merges into background
    arr[100:140, 100:160] = 3    # 2400 px, survives
    arr[250:262, 250:265] = 4    # 180 px, straddles the 4-tile corner, survives at t=100
    arr[254:258, 254:258] = 5    # 16 px nested inside island 4 -> merges into 4
    arr[400:402, 400:403] = 6    # 6 px, merges
    tiles = _tiles_from(arr, n)

    got = _reassemble(to_arrow(sieve_tiles_ds(tiles, threshold=100)), n)
    exp = sieve(arr.copy(), threshold=100)
    assert (got == exp).all(), (np.unique(got), np.unique(exp))
    # sanity on the semantics themselves
    assert set(np.unique(got)) == {1, 3, 4}
    assert (got[10:13, 10:14] == 1).all()
    assert (got[254:258, 254:258] == 4).all()


def test_sieve_ds_threshold_keeps_everything():
    n = 2
    arr = np.ones((n * TILE, n * TILE), np.uint32)
    arr[0:50, 0:50] = 7
    got = _reassemble(to_arrow(sieve_tiles_ds(_tiles_from(arr, n), threshold=10)), n)
    assert (got == arr).all()
