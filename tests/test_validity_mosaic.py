"""check-geometry / make-valid steps + tile mosaic ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.pipelines.steps import run_pipeline
from gdal_ray.stages.raster import TILE, mosaic_tiles
from gdal_ray.util import to_arrow
from gdal_ray.vector import geomfuncs as GF


def test_check_geometry_and_make_valid():
    good = W.wkt_to_geom("POLYGON ((0 0,0 4,4 4,4 0,0 0))")
    bowtie = ("polygon", [np.array([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)], float)])
    unclosed = ("polygon", [np.array([(0, 0), (0, 3), (3, 3), (3, 0)], float)])
    degenerate = ("polygon", [np.array([(0, 0), (1, 1), (2, 2), (0, 0)], float)])
    assert GF.check_geometry(good) == []
    assert any("self-intersection" in p for p in GF.check_geometry(bowtie))
    assert any("not closed" in p for p in GF.check_geometry(unclosed))
    assert any("zero area" in p for p in GF.check_geometry(degenerate))
    fixed = GF.make_valid(unclosed)
    assert GF.check_geometry(fixed) == []
    assert GF.make_valid(degenerate) is None

    ds = rd.from_arrow(pa.table({
        "fid": pa.array([1, 2, 3], pa.int64()),
        "geometry": pa.array([W.geom_to_wkb(g) for g in (good, bowtie, unclosed)], pa.binary()),
    }))
    checked = to_arrow(run_pipeline([("check-geometry", {})], ds)).to_pandas().sort_values("fid")
    assert checked["geom_problems"].tolist()[0] == ""
    assert "self-intersection" in checked["geom_problems"].tolist()[1]
    valid_only = to_arrow(run_pipeline([("make-valid", {})], ds))
    # unclosed repaired; the bowtie's zero SIGNED area classifies it as
    # degenerate and it is dropped (self-intersection repair out of scope)
    assert valid_only.num_rows == 2


def _tiles(vals, zoom=4):
    rows = []
    for (tx, ty), v in vals.items():
        arr = np.full((TILE, TILE), v, np.uint32)
        rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty, "data": arr.tobytes()})
    return rd.from_pandas(pd.DataFrame(rows))


def test_mosaic_first_and_sum():
    a = _tiles({(0, 0): 5, (1, 0): 0})     # tile (1,0) is nodata in A
    b = _tiles({(1, 0): 9, (2, 0): 7})
    out = to_arrow(mosaic_tiles(a, b, op="first")).to_pandas().sort_values("tile_x")
    vals = [np.frombuffer(d, np.uint32)[0] for d in out["data"]]
    assert out["tile_x"].tolist() == [0, 1, 2]
    assert vals == [5, 9, 7]  # A wins where present, B fills the hole
    out2 = to_arrow(mosaic_tiles(a, b, op="sum")).to_pandas().sort_values("tile_x")
    vals2 = [np.frombuffer(d, np.uint32)[0] for d in out2["data"]]
    assert vals2 == [5, 9, 7]
