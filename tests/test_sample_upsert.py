"""Pixel-info sampling + partitioned upsert."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import webmercator as wm
from gdal_ray.stages.raster import TILE, points_to_tile_counts, sample_tiles_at_points
from gdal_ray.state import manifest as M
from gdal_ray.util import to_arrow


def test_sample_tiles_at_points():
    zoom = 5
    rng = np.random.RandomState(3)
    lon = rng.uniform(0, 40, 8000)
    lat = rng.uniform(30, 60, 8000)
    tiles = points_to_tile_counts(
        rd.from_arrow(pa.table({"lon": lon, "lat": lat})), zoom=zoom
    ).materialize()
    # sample the density raster back at a subset of the SAME points:
    # every sampled value must be >= 1 (the point itself was counted there)
    q = pa.table({"pid": pa.array(np.arange(500), pa.int64()),
                  "lon": pa.array(lon[:500]), "lat": pa.array(lat[:500])})
    out = to_arrow(
        sample_tiles_at_points(tiles.drop_columns(["n_points"]), rd.from_arrow(q), zoom)
    ).to_pandas()
    assert len(out) == 500
    assert (out["value"] >= 1).all()
    # a point in an empty region samples nodata
    far = pa.table({"pid": pa.array([99], pa.int64()),
                    "lon": pa.array([-150.0]), "lat": pa.array([-60.0])})
    out2 = to_arrow(
        sample_tiles_at_points(tiles.drop_columns(["n_points"]), rd.from_arrow(far), zoom)
    ).to_pandas()
    assert out2["value"].iloc[0] == 0.0


def test_upsert_partitioned(tmp_path):
    out = str(tmp_path / "u")
    base = rd.from_arrow(pa.table({
        "cell": np.arange(300) % 5, "id": np.arange(300), "v": np.zeros(300)}))
    M.write_partitioned_resumable(base, out, "cell").materialize()
    before = M.completed_keys(out)
    # upsert: update 3 existing keys in cell 1, insert 2 new keys in cell 1
    new = pa.table({
        "cell": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
        "id": pa.array([1, 6, 11, 9001, 9002], type=pa.int64()),
        "v": pa.array([9.0, 9.0, 9.0, 9.0, 9.0]),
    })
    touched = M.upsert_partitioned(out, new, "cell", "id")
    assert touched == ["1"]
    after = M.completed_keys(out)
    # untouched partitions keep identical manifests
    for k in before:
        if k != "1":
            assert before[k]["checksum"] == after[k]["checksum"]
    df = to_arrow(M.read_partitioned(out)).to_pandas()
    assert len(df) == 302  # 300 + 2 inserts
    assert (df[df["id"].isin([1, 6, 11, 9001, 9002])]["v"] == 9.0).all()
    assert all(M.verify_manifest(out).values())
