"""ESRI Shapefile reader (sources/shapefile.py) vs the reference's own
poly.shp fixture and the expectations of autotest/ogr/ogr_shape.py:
10 features with (AREA real, EAS_ID int, PRFEDEA string); eas_id < 170
selects [168, 169, 166, 158, 165]; the AREA attribute equals the
shoelace area of the polygon geometry (the fixture was built that way)."""

import numpy as np
import pytest

from gdal_ray.geo import wkb as W
from gdal_ray.sources.shapefile import read_shapefile_table

POLY = "/root/reference/autotest/ogr/data/poly.shp"


def test_poly_shp_attributes():
    t = read_shapefile_table(POLY)
    df = t.to_pandas()
    assert len(df) == 10
    assert df["EAS_ID"].dtype.kind == "i"
    assert df["AREA"].dtype.kind == "f"
    assert df.loc[df["EAS_ID"] < 170, "EAS_ID"].tolist() == \
        [168, 169, 166, 158, 165]
    assert df["PRFEDEA"].iloc[0] == "35043411"
    assert abs(df["AREA"].iloc[0] - 215229.266) < 1e-3


def test_poly_shp_geometry_area_consistency():
    """The fixture's AREA field is the polygon area: our ring parse +
    shoelace must reproduce it for every feature (hole-aware)."""
    t = read_shapefile_table(POLY).to_pandas()
    for _, row in t.iterrows():
        g = W.parse_wkb(row["geometry"])
        kind, rings = g[0], g[1]
        assert kind == "polygon"
        area = 0.0
        for i, r in enumerate(rings):
            a = 0.5 * abs(np.dot(r[:, 0], np.roll(r[:, 1], -1))
                          - np.dot(r[:, 1], np.roll(r[:, 0], -1)))
            area += a if i == 0 else -a
        assert abs(area - row["AREA"]) / row["AREA"] < 1e-5


def test_shapefile_sql_pipeline(ray_session, sf_dir):
    """Shapefile -> register_table -> SQL: the ogr_shape.py attribute
    filter restated through the engine's own SQL surface."""
    from gdal_ray.ops.sql import execute, register_table, unregister_table
    from gdal_ray.sources import open_source
    from gdal_ray.util import to_arrow

    ds = open_source(POLY)
    register_table("tpoly", ds)
    try:
        out = to_arrow(execute(
            "SELECT EAS_ID, PRFEDEA FROM tpoly WHERE EAS_ID < 170 "
            "ORDER BY FID", sf_dir)).to_pandas()
    finally:
        unregister_table("tpoly")
    assert out["EAS_ID"].tolist() == [168, 169, 166, 158, 165]


def test_shapefile_write_roundtrip(tmp_path):
    """Writer round-trip on the reference's own poly.shp: write what we
    read, read it back, geometry bytes + attributes identical; .shx
    record offsets consistent with the .shp stream."""
    import struct

    from gdal_ray.sources.shapefile import write_shapefile

    t = read_shapefile_table(POLY)
    out = str(tmp_path / "copy.shp")
    write_shapefile(t, out)
    t2 = read_shapefile_table(out)
    a, b = t.to_pandas(), t2.to_pandas()
    assert len(a) == len(b)
    assert a["EAS_ID"].tolist() == b["EAS_ID"].tolist()
    assert a["PRFEDEA"].tolist() == b["PRFEDEA"].tolist()
    assert np.allclose(a["AREA"], b["AREA"], rtol=1e-12)
    for ga, gb in zip(a["geometry"], b["geometry"]):
        pa_, pb_ = W.parse_wkb(ga), W.parse_wkb(gb)
        assert pa_[0] == pb_[0]
        for ra, rb in zip(pa_[1], pb_[1]):
            np.testing.assert_allclose(ra, rb)
    shx = open(str(tmp_path / "copy.shx"), "rb").read()
    n = (len(shx) - 100) // 8
    assert n == len(a)
    off0, len0 = struct.unpack(">ii", shx[100:108])
    assert off0 == 50  # first record right after the header


def test_shapefile_write_points_and_lines(tmp_path):
    import pyarrow as pa

    from gdal_ray.sources.shapefile import write_shapefile

    pts = pa.table({
        "geometry": pa.array([W.encode_point(1.5, 2.5),
                              W.encode_point(-3.0, 4.0)], pa.binary()),
        "name": pa.array(["a", "b"]),
        "flag": pa.array([True, False]),
    })
    p = str(tmp_path / "pts.shp")
    write_shapefile(pts, p)
    back = read_shapefile_table(p).to_pandas()
    assert back["name"].tolist() == ["a", "b"]
    assert back["flag"].tolist() == [True, False]
    g0 = W.parse_wkb(back["geometry"].iloc[0])
    np.testing.assert_allclose(g0[1][0], [1.5, 2.5])

    lines = pa.table({
        "geometry": pa.array([W.encode_linestring(
            np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]]))], pa.binary()),
        "n": pa.array([7]),
    })
    p2 = str(tmp_path / "ln.shp")
    write_shapefile(lines, p2)
    back2 = read_shapefile_table(p2).to_pandas()
    assert back2["n"].tolist() == [7]
    g = W.parse_wkb(back2["geometry"].iloc[0])
    assert g[0] == "linestring" and len(g[1]) == 3
