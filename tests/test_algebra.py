"""Layer algebra vs the reference's golden counts and WKTs
(autotest/pyscripts/test_ogr_layer_algebra.py:68-455,
autotest/ogr/ogr_layer_algebra.py:248-335)."""

import numpy as np
import pytest

from gdal_ray.geo import wkb as W
from gdal_ray.vector import algebra as ALG


def G(wkt):
    return W.wkt_to_geom(wkt)


A1 = "POLYGON((1 2, 1 3, 3 3, 3 2, 1 2))"
A2 = "POLYGON((5 2, 5 3, 7 3, 7 2, 5 2))"
B1 = "POLYGON((2 1, 2 4, 6 4, 6 1, 2 1))"
B2 = "POLYGON((2 4, 2 6, 6 6, 6 4, 2 4))"


def feats(*wkts):
    return [(G(w), {}) for w in wkts]


def total_area(geom):
    kind, data = geom
    if kind == "polygon":
        return sum(
            ALG._ring_area2(ALG._close(np.asarray(r))) for r in data
        ) / 2.0
    if kind == "multipolygon":
        return sum(total_area(p) for p in data)
    return 0.0


def test_intersection_count_and_geoms():
    out = ALG.layer_op("intersection", feats(A1, A2), feats(B1))
    assert len(out) == 2
    areas = sorted(abs(total_area(g)) for g, _ in out)
    assert areas == [1.0, 1.0]  # (2..3)x(2..3) and (5..6)x(2..3)


def test_union_count():
    out = ALG.layer_op("union", feats(A1, A2), feats(B1))
    assert len(out) == 5
    # total covered area = area(A∪B) counted with overlaps split:
    # 2 intersections (1+1) + a-remainders (1+1) + b-remainder (12-2)
    areas = sorted(round(abs(total_area(g)), 6) for g, _ in out)
    assert areas == [1.0, 1.0, 1.0, 1.0, 10.0]


def test_symdifference_count():
    out = ALG.layer_op("symdifference", feats(A1, A2), feats(B1, B2))
    assert len(out) == 4
    areas = sorted(round(abs(total_area(g)), 6) for g, _ in out)
    assert areas == [1.0, 1.0, 8.0, 10.0]


def test_identity_count():
    out = ALG.layer_op("identity", feats(A1, A2), feats(B1))
    assert len(out) == 4


def test_update_count():
    out = ALG.layer_op("update", feats(A1, A2), feats(B1))
    assert len(out) == 3


def test_clip_count():
    out = ALG.layer_op("clip", feats(A1, A2), feats(B1))
    assert len(out) == 2
    areas = sorted(abs(total_area(g)) for g, _ in out)
    assert areas == [1.0, 1.0]


def test_erase_count():
    out = ALG.layer_op("erase", feats(A1, A2), feats(B1))
    assert len(out) == 2
    areas = sorted(abs(total_area(g)) for g, _ in out)
    assert areas == [1.0, 1.0]


def test_crossing_lines_multipoint_golden():
    """autotest/ogr/ogr_layer_algebra.py:248-271: exactly
    MULTIPOINT ((0.5 0.5)) with PROMOTE_TO_MULTI."""
    out = ALG.layer_op(
        "intersection",
        [(G("LINESTRING (0 0, 1 1)"), {})],
        [(G("LINESTRING (0 1, 1 0)"), {})],
        promote=True,
    )
    assert len(out) == 1
    assert W.geom_to_wkt(out[0][0]) == "MULTIPOINT ((0.5 0.5))"


def test_keep_lower_dimension_matrix():
    """ogr_layer_algebra.py:273-335 count matrix 0/2/4/6."""
    l1 = [
        (G("POLYGON (( 140 360, 140 480, 220 480, 220 360, 140 360 ))"), {}),
        (G("LINESTRING (0 0, 1 0)"), {}),
    ]
    l2 = [
        (G("POLYGON (( 220 260, 220 360, 300 360, 300 260, 220 260 ))"), {}),
        (G("LINESTRING (1 0, 2 0)"), {}),
    ]
    assert len(ALG.layer_op("intersection", l1, l2, keep_lower_dim=False)) == 0
    assert len(ALG.layer_op("intersection", l1, l2, keep_lower_dim=True)) == 2
    assert len(ALG.layer_op("union", l1, l2, keep_lower_dim=False)) == 4
    assert len(ALG.layer_op("union", l1, l2, keep_lower_dim=True)) == 6
    assert len(ALG.layer_op("identity", l1, l2, keep_lower_dim=False)) == 2
    assert len(ALG.layer_op("identity", l1, l2, keep_lower_dim=True)) == 4


def test_difference_produces_l_shape():
    rem = ALG.difference_geom(G(B1), G(A1))
    a = abs(total_area(rem))
    assert abs(a - 11.0) < 1e-9  # 12 - overlap 1


def test_donut_difference():
    outer = G("POLYGON((0 0,0 10,10 10,10 0,0 0))")
    inner = G("POLYGON((4 4,4 6,6 6,6 4,4 4))")
    rem = ALG.difference_geom(outer, inner)
    assert abs(abs(total_area(rem)) - 96.0) < 1e-9
