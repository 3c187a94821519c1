"""Flagship resumable output + salted burn equivalence."""

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.stages.raster import burn_features_to_tiles
from gdal_ray.state import manifest as M
from gdal_ray.util import to_arrow


def test_flagship_resumable_write(tmp_path, sf_dir):
    from gdal_ray.pipelines.pages import flagship_to_parquet

    out = str(tmp_path / "tiles")
    res1 = to_arrow(flagship_to_parquet(sf_dir, out, repeat=1))
    total = M.read_partitioned(out).count()
    assert res1.num_rows >= 2 and total > 0
    assert all(M.verify_manifest(out).values())

    # kill one partition; resume rewrites only it and the data is identical
    done = M.completed_keys(out)
    victim = sorted(done)[0]
    os.remove(done[victim]["fragment"])
    for f in os.listdir(out + "/_manifest"):
        if f.startswith(M._keystr(victim)):
            os.remove(os.path.join(out, "_manifest", f))
    res2 = to_arrow(flagship_to_parquet(sf_dir, out, repeat=1))
    assert res2.num_rows == 1 and res2["key"][0].as_py() == victim
    assert M.read_partitioned(out).count() == total
    assert all(M.verify_manifest(out).values())


def test_salted_burn_equals_unsalted():
    rng = np.random.RandomState(17)
    # many small polygons crowding a few tiles (the hot-cell shape)
    polys, vals = [], []
    for i in range(120):
        cx = rng.uniform(0, 20)
        cy = rng.uniform(40, 50)
        ring = np.array(
            [(cx, cy), (cx + 0.5, cy), (cx + 0.5, cy + 0.5), (cx, cy + 0.5), (cx, cy)]
        )
        polys.append(W.encode_polygon([ring]))
        vals.append(float(rng.randint(1, 5)))
    ds = pa.table({"geometry": pa.array(polys, pa.binary()), "v": pa.array(vals)})
    plain = to_arrow(
        burn_features_to_tiles(rd.from_arrow(ds), zoom=5, burn_col="v",
                               merge="add", dtype=np.float32)
    ).to_pandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    salted = to_arrow(
        burn_features_to_tiles(rd.from_arrow(ds), zoom=5, burn_col="v",
                               merge="add", dtype=np.float32, salt=4)
    ).to_pandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    assert plain[["tile_x", "tile_y"]].equals(salted[["tile_x", "tile_y"]])
    for a, b in zip(plain["data"], salted["data"]):
        assert np.array_equal(
            np.frombuffer(a, np.float32), np.frombuffer(b, np.float32)
        )
