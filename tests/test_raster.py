"""Rasterize / checksum / polygonize vs reference-derived goldens."""

import numpy as np

from gdal_ray.geo import wkb as W
from gdal_ray.raster.checksum import checksum
from gdal_ray.raster.polygonize import label_array, polygonize
from gdal_ray.raster.rasterize import rasterize


def test_checksum_byte_tif_golden():
    """Canonical 20x20 byte.tif asserts checksum 4672 across dozens of
    reference driver tests (autotest/ogr/ogr_shape.py etc.)."""
    buf = open("/root/reference/autotest/gcore/data/byte.tif", "rb").read()
    arr = np.frombuffer(buf, np.uint8, count=400, offset=8).reshape(20, 20)
    assert checksum(arr) == 4672


def test_rasterize_golden_6452():
    """autotest/alg/rasterize.py:25-80 re-expressed: 100x100 uint8, GT
    (1000,1,0,1100,0,-1), burn polygon + line with 220 -> checksum 6452;
    256 clamps to 255; -1 clamps to 0."""
    gt = (1000, 1, 0, 1100, 0, -1)
    poly = W.wkt_to_geom("POLYGON((1020 1030,1020 1045,1050 1045,1050 1030,1020 1030))")
    line = W.wkt_to_geom("LINESTRING(1000 1000, 1100 1050)")
    band2 = rasterize([poly, line], 100, 100, gt, [220, 220])
    assert checksum(band2) == 6452
    band3 = rasterize([poly, line], 100, 100, gt, [256, 256])
    assert band3.max() == 255
    band1 = rasterize([poly, line], 100, 100, gt, [-1, -1])
    assert band1.min() == 0 and band1.max() == 0


def test_rasterize_merge_add():
    gt = (0, 1, 0, 10, 0, -1)
    p1 = W.wkt_to_geom("POLYGON((0 0,0 10,10 10,10 0,0 0))")
    p2 = W.wkt_to_geom("POLYGON((2 2,2 8,8 8,8 2,2 2))")
    out = rasterize([p1, p2], 10, 10, gt, [10, 5], merge="add")
    assert out.max() == 15 and out.min() == 10


def test_polygonize_square_and_donut():
    a = np.zeros((6, 6), np.uint8)
    a[1:4, 1:4] = 5
    res = polygonize(a, nodata=0)
    assert len(res) == 1
    v, rings = res[0]
    assert v == 5 and len(rings) == 1
    xs, ys = rings[0][:, 0], rings[0][:, 1]
    assert xs.min() == 1 and xs.max() == 4 and ys.min() == 1 and ys.max() == 4

    b = np.zeros((8, 8), np.uint8)
    b[1:6, 1:6] = 7
    b[2:4, 2:4] = 0
    res = {}
    for v, rings in polygonize(b):
        res.setdefault(int(v), []).append(rings)
    seven = res[7][0]
    assert len(seven) == 2  # exterior + hole
    assert len(res[0]) == 2  # outer background + inner hole region


def test_polygonize_connectivity():
    c = np.zeros((4, 4), np.uint8)
    c[1, 1] = 3
    c[2, 2] = 3
    assert label_array(c, 4, nodata=0).max() + 1 == 2
    assert label_array(c, 8, nodata=0).max() + 1 == 1
    assert len(polygonize(c, 4, nodata=0)) == 2
    assert len(polygonize(c, 8, nodata=0)) == 1


def test_polygonize_area_preservation():
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 3, size=(12, 12)).astype(np.uint8)
    polys = polygonize(arr, connectivity=4)

    def ring_area2(r):
        x, y = r[:, 0], r[:, 1]
        return float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))

    total = 0.0
    for v, rings in polys:
        # interior-on-left walking in y-down coords makes exterior rings
        # negative and holes positive under the y-up shoelace; the signed sum
        # over every ring of a region is minus twice its pixel area
        total += -sum(ring_area2(r) for r in rings)
    assert abs(total - 2 * 144.0) < 1e-9


def test_rasterize_all_touched_golden_121():
    """autotest/alg/rasterize.py test_rasterize_2 re-expressed: 12x12, GT
    (0,1,0,12,0,-1), cutline polygons, ALL_TOUCHED -> checksum 121."""
    wkts = [
        "POLYGON((6.25 1.25,7.25 1.25,7.25 2.25,6.25 2.25,6.25 1.25))",
        "POLYGON((4.25 4.25,6.25 4.25,6.25 6.25,4.25 6.25,4.25 4.25))",
        "POLYGON((1.001 1.001,3.999 3.999,3.2 1.6,1.001 1.001))",
    ]
    geoms = [W.wkt_to_geom(w) for w in wkts]
    band2 = rasterize(geoms, 12, 12, (0, 1, 0, 12, 0, -1), [220] * 3, all_touched=True)
    assert checksum(band2) == 121
    # all-touched burns a superset of the pixel-center fill
    plain = rasterize(geoms, 12, 12, (0, 1, 0, 12, 0, -1), [220] * 3)
    assert ((band2 > 0) | ~(plain > 0)).all()


def test_rasterize_attribute_golden_16265():
    """autotest/alg/rasterize.py test_rasterize_4 (ATTRIBUTE=CELSIUS):
    per-feature burn values over 3 polygons (one with a hole) + 2
    multi-segment linestrings -> band-2 checksum 16265."""
    wkts = [
        "POLYGON((1020 1030 40,1020 1045 30,1050 1045 20,1050 1030 35,1020 1030 40))",
        "POLYGON((1010 1046 85,1015 1055 35,1055 1060 26,1054 1048 35,1010 1046 85))",
        "POLYGON((1020 1076 190,1025 1085 35,1065 1090 26,1064 1078 35,1020 1076 190),"
        "(1023 1079 5,1061 1081 35,1062 1087 26,1028 1082 35,1023 1079 85))",
        "LINESTRING(1005 1000 10, 1100 1050 120)",
        "LINESTRING(1000 1000 150, 1095 1050 -5, 1080 1080 200)",
    ]
    vals = [50, 255, 60, 100, 180]
    geoms = [W.wkt_to_geom(w) for w in wkts]
    band2 = rasterize(geoms, 100, 100, (1000, 1, 0, 1100, 0, -1), vals)
    assert checksum(band2) == 16265


def test_rasterize_burn_value_from_z_golden_15037():
    """autotest/alg/rasterize.py test_rasterize_3 (BURN_VALUE_FROM=Z):
    polygons burn burn+Z(first vertex), lines interpolate Z along segments
    -> band-2 checksum 15037."""
    wkts = [
        "POLYGON((1020 1030 40,1020 1045 30,1050 1045 20,1050 1030 35,1020 1030 40))",
        "POLYGON((1010 1046 85,1015 1055 35,1055 1060 26,1054 1048 35,1010 1046 85))",
        "POLYGON((1020 1076 190,1025 1085 35,1065 1090 26,1064 1078 35,1020 1076 190),"
        "(1023 1079 5,1061 1081 35,1062 1087 26,1028 1082 35,1023 1079 85))",
        "LINESTRING(1005 1000 10, 1100 1050 120)",
        "LINESTRING(1000 1000 150, 1095 1050 -5, 1080 1080 200)",
    ]
    parsed = [W.wkt_to_geom_z(w) for w in wkts]
    band2 = rasterize(
        [g for g, _ in parsed], 100, 100, (1000, 1, 0, 1100, 0, -1),
        [10] * 5, z_values=[z for _, z in parsed],
    )
    assert checksum(band2) == 15037
