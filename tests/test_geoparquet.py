"""GeoParquet write (geo metadata + bbox covering) and pruned read."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.sources.geoparquet import (
    read_geo_metadata,
    read_geoparquet,
    write_geoparquet,
)
from gdal_ray.util import to_arrow


def _points_ds(lons, lats, ids):
    geoms = W.encode_points(np.asarray(lons, float), np.asarray(lats, float))
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "geometry": pa.array(geoms, pa.binary()),
    }))


def test_geoparquet_roundtrip(tmp_path):
    out = str(tmp_path / "gp")
    lon = np.linspace(-10, 10, 100)
    lat = np.linspace(40, 50, 100)
    manifest = to_arrow(write_geoparquet(_points_ds(lon, lat, np.arange(100)), out))
    assert manifest["rows"].to_pylist() and sum(manifest["rows"].to_pylist()) == 100

    meta = read_geo_metadata(out)
    assert meta["version"] == "1.1.0"
    assert meta["primary_column"] == "geometry"
    col = meta["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert col["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]
    assert col["bbox"][0] == -10.0 and col["bbox"][2] == 10.0

    back = to_arrow(read_geoparquet(out)).to_pandas().sort_values("id")
    assert len(back) == 100
    blon, blat = W.decode_points(list(back["geometry"]))
    assert np.allclose(sorted(blon), lon)
    # bbox struct column round-trips and equals the point coords
    assert np.allclose(
        sorted(x["xmin"] for x in back["bbox"]), lon
    )


def test_geoparquet_bbox_pruning(tmp_path):
    out = str(tmp_path / "gp2")
    # two far-apart clusters, small row groups -> the far cluster's row
    # groups are prunable purely from bbox column statistics
    n = 3000
    lon = np.concatenate([np.random.RandomState(1).uniform(0, 1, n),
                          np.random.RandomState(2).uniform(100, 101, n)])
    lat = np.concatenate([np.random.RandomState(3).uniform(0, 1, n),
                          np.random.RandomState(4).uniform(50, 51, n)])
    to_arrow(write_geoparquet(_points_ds(lon, lat, np.arange(2 * n)),
                              out, row_group_size=500))

    got = to_arrow(read_geoparquet(out, bbox=(-1, -1, 2, 2))).to_pandas()
    assert len(got) == n
    assert (got["id"] < n).all()

    # the pruning mechanism: every fragment carries row-group statistics on
    # the bbox leaves
    import os

    frag = next(os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet"))
    pf = pq.ParquetFile(frag)
    names = [pf.schema_arrow.field(i).name for i in range(len(pf.schema_arrow))]
    assert "bbox" in names
    rg = pf.metadata.row_group(0)
    stats_cols = {rg.column(i).path_in_schema: rg.column(i).statistics
                  for i in range(rg.num_columns)}
    assert stats_cols.get("bbox.xmin") is not None
    assert stats_cols["bbox.xmin"].has_min_max


def test_geoparquet_polygon_envelopes(tmp_path):
    # non-point geometries go through the generic envelope path
    out = str(tmp_path / "gp3")
    tri = ("polygon", [np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 3.0], [0.0, 0.0]])])
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "geometry": pa.array([W.geom_to_wkb(tri)], pa.binary()),
    }))
    to_arrow(write_geoparquet(ds, out))
    back = to_arrow(read_geoparquet(out)).to_pylist()[0]
    assert back["bbox"] == {"xmin": 0.0, "ymin": 0.0, "xmax": 4.0, "ymax": 3.0}
    meta = read_geo_metadata(out)
    assert meta["columns"]["geometry"]["bbox"] == [0.0, 0.0, 4.0, 3.0]


def test_geoparquet_resumable(tmp_path):
    from gdal_ray.sources.geoparquet import write_geoparquet_resumable

    out = str(tmp_path / "gpr")
    lon = np.concatenate([np.linspace(0, 1, 50), np.linspace(100, 101, 50)])
    lat = np.concatenate([np.linspace(0, 1, 50), np.linspace(50, 51, 50)])
    geoms = W.encode_points(lon, lat)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(100), pa.int64()),
        "part": pa.array(["west"] * 50 + ["east"] * 50),
        "geometry": pa.array(geoms, pa.binary()),
    }))
    m1 = to_arrow(write_geoparquet_resumable(ds, out, "part")).to_pandas()
    assert sorted(m1["key"]) == ["east", "west"] and (~m1["skipped"]).all()
    # resume: nothing rewritten
    m2 = to_arrow(write_geoparquet_resumable(ds, out, "part")).to_pandas()
    assert len(m2) == 0

    # geo metadata + bbox pruning work on the fragment directory
    meta = read_geo_metadata(out + "/parts")
    assert meta and meta["columns"]["geometry"]["encoding"] == "WKB"
    got = to_arrow(read_geoparquet(out + "/parts", bbox=(-1, -1, 2, 2))).to_pandas()
    assert len(got) == 50 and (got["part"] == "west").all()
