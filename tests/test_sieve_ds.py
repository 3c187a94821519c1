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


def test_sieve_ds_connectivity8_corner_diagonal():
    """connectivity=8: a region touching only DIAGONALLY at the 4-tile
    corner must be united cross-tile (round-2 only paired face-adjacent
    border cells, so the two halves sieved independently)."""
    n = 2
    arr = np.ones((n * TILE, n * TILE), np.uint32)
    # two 40-px squares meeting only at the tile corner (255,255)/(256,256)
    arr[TILE - 8 : TILE, TILE - 5 : TILE] = 9      # 40 px, upper-left of corner
    arr[TILE : TILE + 8, TILE : TILE + 5] = 9      # 40 px, lower-right of corner
    # under conn8 they are ONE 80-px region -> survives threshold=60;
    # under conn4 each half (40 px) merges into background
    tiles = _tiles_from(arr, n)
    got8 = _reassemble(to_arrow(sieve_tiles_ds(tiles, threshold=60, connectivity=8)), n)
    exp8 = sieve(arr.copy(), threshold=60, connectivity=8)
    assert (got8 == exp8).all()
    assert (got8[TILE - 8 : TILE, TILE - 5 : TILE] == 9).all()
    got4 = _reassemble(to_arrow(sieve_tiles_ds(_tiles_from(arr, n), threshold=60, connectivity=4)), n)
    assert (got4 == 1).all()


def test_sieve_ds_connectivity8_edge_diagonal():
    """conn8 diagonal adjacency ALONG a shared edge (not at a corner):
    staircase region crossing the horizontal tile boundary diagonally."""
    n = 2
    arr = np.ones((n * TILE, n * TILE), np.uint32)
    # cells (255, 100..139) and (256, 101..140): offset by one column, so
    # they touch only diagonally across the tile edge
    arr[TILE - 1, 100:140] = 5
    arr[TILE, 101:141] = 5
    tiles = _tiles_from(arr, n)
    got = _reassemble(to_arrow(sieve_tiles_ds(tiles, threshold=60, connectivity=8)), n)
    exp = sieve(arr.copy(), threshold=60, connectivity=8)
    assert (got == exp).all()
    # the 80-px staircase survives threshold=60 only if united
    assert (got[TILE - 1, 100:140] == 5).all()
