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
