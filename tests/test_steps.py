"""Pipeline step registry + geometry functions."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.pipelines.steps import STEPS, run_pipeline
from gdal_ray.util import to_arrow
from gdal_ray.vector import geomfuncs as GF


def _points_ds(n=100):
    rng = np.random.RandomState(1)
    return rd.from_arrow(
        pa.table(
            {
                "id": np.arange(n),
                "lon": rng.uniform(-10, 10, n),
                "lat": rng.uniform(40, 50, n),
            }
        )
    )


def test_pipeline_make_point_filter_limit(sf_dir):
    out = run_pipeline(
        [
            ("read", {"path": f"{sf_dir}/events.parquet", "columns": ["event_id", "value"]}),
            ("limit", {"n": 50}),
        ]
    )
    assert to_arrow(out).num_rows == 50


def test_make_point_and_reproject():
    ds = _points_ds(50)
    out = run_pipeline([("make-point", {}), ("reproject", {"dst": "webmercator"})], ds)
    t = to_arrow(out)
    g = W.parse_wkb(t["geometry"][0].as_py())
    assert g[0] == "point" and abs(g[1][0][0]) > 1000  # meters now


def test_reproject_roundtrip():
    lon = np.array([-10.0, 0.0, 120.5])
    lat = np.array([40.0, -85.0, 12.25])
    x, y = GF.lonlat_to_webmercator(lon, lat)
    lon2, lat2 = GF.webmercator_to_lonlat(x, y)
    assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)


def test_buffer_simplify_segmentize_hull():
    line = ("linestring", np.array([[0.0, 0.0], [10.0, 0.1], [20.0, 0.0]]))
    simp = GF.simplify(line, 0.5)
    assert len(simp[1]) == 2  # middle point dropped
    seg = GF.segmentize(line, 1.0)
    assert len(seg[1]) >= 20
    buf = GF.buffer(("point", np.array([[0.0, 0.0]])), 2.0)
    assert abs(GF.area(buf) - np.pi * 4) / (np.pi * 4) < 0.02  # 32-gon ~ circle
    hull = GF.convex_hull(("multipoint", [("point", np.array([[0.0, 0.0]])),
                                          ("point", np.array([[1.0, 0.0]])),
                                          ("point", np.array([[1.0, 1.0]])),
                                          ("point", np.array([[0.5, 0.5]]))]))
    assert hull[0] == "polygon" and abs(GF.area(hull) - 0.5) < 1e-12


def test_explode_collections_step():
    multi = W.geom_to_wkb(
        W.wkt_to_geom("MULTIPOLYGON (((0 0,0 1,1 1,0 0)),((5 5,5 6,6 6,5 5)))")
    )
    single = W.geom_to_wkb(W.wkt_to_geom("POINT (9 9)"))
    ds = rd.from_arrow(pa.table({"fid": [1, 2], "geometry": pa.array([multi, single], pa.binary())}))
    out = to_arrow(run_pipeline([("explode-collections", {})], ds))
    assert out.num_rows == 3
    assert sorted(out["fid"].to_pylist()) == [1, 1, 2]


def test_clip_step():
    ds = _points_ds(200)
    ds = run_pipeline([("make-point", {})], ds)
    out = to_arrow(run_pipeline([("clip", {"clip_wkt": "POLYGON ((0 40,0 50,10 50,10 40,0 40))"})], ds))
    assert 0 < out.num_rows < 200
    for b in out["geometry"].to_pylist():
        g = W.parse_wkb(b)
        assert 0 <= g[1][0][0] <= 10


def test_sort_hilbert_step():
    ds = _points_ds(100)
    ds = run_pipeline([("make-point", {})], ds)
    out = to_arrow(run_pipeline([("sort-hilbert", {})], ds))
    keys = out["hilbert_key"].to_pylist()
    assert keys == sorted(keys)


def test_dissolve_step():
    polys = [
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((0 0,0 2,2 2,2 0,0 0))")),
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((1 0,1 2,3 2,3 0,1 0))")),
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((10 10,10 11,11 11,11 10,10 10))")),
    ]
    ds = rd.from_arrow(
        pa.table({"grp": ["a", "a", "a"], "geometry": pa.array(polys, pa.binary())})
    )
    out = to_arrow(run_pipeline([("dissolve", {"by": "grp"})], ds))
    assert out.num_rows == 1
    g = W.parse_wkb(out["geometry"][0].as_py())
    assert g[0] == "multipolygon" and abs(GF.area(g) - (6.0 + 1.0)) < 1e-9


def test_registry_complete():
    for name in ["read", "write", "filter", "select", "limit", "make-point",
                 "reproject", "swap-xy", "simplify", "segmentize", "buffer",
                 "convex-hull", "clip", "explode-collections", "sort-hilbert",
                 "dissolve", "sql_like"]:
        assert name in STEPS


def test_reproject_utm_step():
    import ray.data as rd

    from gdal_ray.geo.crs import utm_zone_transformer
    from gdal_ray.pipelines.steps import run_pipeline

    lon = np.array([2.5, 3.0, 3.5])
    lat = np.array([48.0, 49.0, 50.0])
    geoms = W.encode_points(lon, lat)
    ds = rd.from_arrow(pa.table({"id": [1, 2, 3], "geometry": pa.array(geoms, pa.binary())}))
    out = run_pipeline([("reproject", {"dst": "EPSG:32631"})], ds)
    t = to_arrow(out)
    ge, gn = W.decode_points(t["geometry"].to_pylist())
    ee, en = utm_zone_transformer(31).forward(lon, lat)
    assert np.allclose(sorted(ge), sorted(ee))
    assert np.allclose(sorted(gn), sorted(en))
    # and back: utm -> lonlat
    back = to_arrow(run_pipeline([("reproject", {"src": "EPSG:32631", "dst": "lonlat"})], out))
    blon, blat = W.decode_points(back["geometry"].to_pylist())
    assert np.allclose(sorted(blon), sorted(lon), atol=1e-9)
    assert np.allclose(sorted(blat), sorted(lat), atol=1e-9)


def test_edit_step_fields_and_domains():
    ds = rd.from_arrow(pa.table({
        "a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]}))
    out = to_arrow(run_pipeline([("edit", {
        "rename": {"a": "ident"}, "set_fields": {"src": "events"},
        "drop": ["c"],
        "domains": {"a": {"kind": "range", "min": 0, "max": 10}},
    })], ds))
    assert out.column_names == ["ident", "b", "src"]
    assert out["src"].to_pylist() == ["events"] * 3

    # coded domain, error policy
    with pytest.raises(Exception, match="domain violation"):
        to_arrow(run_pipeline([("edit", {
            "domains": {"b": {"kind": "coded", "values": ["x", "y"]}},
        })], ds))
    # null policy coerces instead
    out2 = to_arrow(run_pipeline([("edit", {
        "domains": {"b": {"kind": "coded", "values": ["x", "y"], "policy": "null"}},
    })], ds))
    assert out2["b"].to_pylist() == ["x", "y", None]


def test_simplify_coverage_shared_boundary():
    # two polygons sharing a wiggly vertical boundary inside [0,2]x[0,1]:
    # coverage simplification must keep the shared arc IDENTICAL on both
    # sides so the union area is exactly the rectangle
    ys = np.linspace(0.0, 1.0, 21)
    wig = 1.0 + 0.05 * np.sin(ys * 40.0)
    shared_down = np.column_stack([wig, ys])[::-1]  # from (w,1) down to (w,0)
    left = np.vstack([[0.0, 0.0], [wig[0], 0.0],
                      np.column_stack([wig, ys])[1:],  # up the wiggle
                      [[0.0, 1.0], [0.0, 0.0]]])
    right = np.vstack([[wig[0], 0.0], [2.0, 0.0], [2.0, 1.0], [wig[-1], 1.0],
                       shared_down[1:]])
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "geometry": pa.array([W.geom_to_wkb(("polygon", [left])),
                              W.geom_to_wkb(("polygon", [right]))], pa.binary()),
    }))
    out = to_arrow(run_pipeline([("simplify-coverage", {"tolerance": 0.2})], ds))
    a = W.parse_wkb(out["geometry"][0].as_py())
    b = W.parse_wkb(out["geometry"][1].as_py())
    area_a, area_b = GF.area(a), GF.area(b)
    assert abs((area_a + area_b) - 2.0) < 1e-9  # no gaps, no overlaps
    # shared arc collapsed identically: both rings lost the wiggle verts
    assert len(a[1][0]) < len(left)
    va = {tuple(np.round(p, 9)) for p in a[1][0]}
    vb = {tuple(np.round(p, 9)) for p in b[1][0]}
    # the two simplified boundaries share exactly the simplified arc's verts
    shared = va & vb
    assert len(shared) >= 2


def test_vector_info_and_raster_info():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.info import raster_info, vector_info

    pts = [W.geom_to_wkb(("point", np.array([[float(i), float(2 * i)]])))
           for i in range(5)]
    ring = np.array([[0.0, 0.0], [9.0, 0.0], [9.0, 9.0], [0.0, 0.0]])
    polys = [W.geom_to_wkb(("polygon", [ring]))]
    t = pa.table({"id": pa.array(range(6), pa.int64()),
                  "geometry": pa.array(pts + polys, pa.binary())})
    info = vector_info(rd.from_arrow([t.slice(0, 3), t.slice(3)]))
    assert info["feature_count"] == 6
    assert info["geometry_types"] == {"point": 5, "polygon": 1}
    assert info["extent"] == (0.0, 0.0, 9.0, 9.0)
    assert ("id", "int64") in info["fields"]

    arr = np.arange(256 * 256, dtype=np.uint32)
    tiles = rd.from_pandas(pd.DataFrame([
        {"zoom": 5, "tile_x": 3, "tile_y": 4, "data": arr.tobytes()},
        {"zoom": 5, "tile_x": 4, "tile_y": 4, "data": arr.tobytes()},
    ]))
    ri = raster_info(tiles, dtype=np.uint32)
    assert ri["tile_count"] == 2 and ri["zoom_levels"] == (5, 5)
    assert ri["tile_range"] == (3, 4, 4, 4)
    assert ri["statistics"][0]["count"] == 2 * 256 * 256
    assert ri["statistics"][0]["max"] == 256 * 256 - 1


def test_wrap_dateline_polygon_splits_into_two_parts():
    """ogr2ogr -wrapdateline behavior (test_ogr2ogr.py:374 re-expressed
    without the UTM reprojection): a polygon whose segments jump across
    +/-180 splits into a 2-part multipolygon with all longitudes in
    [-180, 180]; counts and WKT pinned."""
    from gdal_ray.vector import geomfuncs as GF
    import numpy as np

    # raw data as a source would deliver it: lons jump 178 -> -178
    ring = np.array([[178.0, 10.0], [-178.0, 10.0], [-178.0, 20.0],
                     [178.0, 20.0], [178.0, 10.0]])
    out = GF.wrap_dateline(("polygon", [ring]))
    assert out[0] == "multipolygon"
    assert len(out[1]) == 2
    from gdal_ray.geo.wkb import geom_to_wkt

    wkt = geom_to_wkt(out)
    assert wkt == ("MULTIPOLYGON (((178 10,180 10,180 20,178 20,178 10)),"
                   "((-180 10,-178 10,-178 20,-180 20,-180 10)))"), wkt

    # every emitted longitude is within [-180, 180]
    for poly in out[1]:
        for r in poly[1]:
            assert (r[:, 0] >= -180).all() and (r[:, 0] <= 180).all()


def test_wrap_dateline_gate_and_line_and_point():
    from gdal_ray.vector import geomfuncs as GF
    import numpy as np

    # far from the dateline: untouched (DATELINEOFFSET gate)
    ring = np.array([[10.0, 0.0], [20.0, 0.0], [20.0, 5.0], [10.0, 0.0]])
    g = ("polygon", [ring])
    assert GF.wrap_dateline(g) is g

    # crossing line splits into 2 pieces at x=180 with interpolated y
    line = np.array([[179.0, 0.0], [-179.0, 1.0]])
    out = GF.wrap_dateline(("linestring", line))
    assert out[0] == "multilinestring" and len(out[1]) == 2
    (_, a), (_, b) = out[1]
    assert np.allclose(a, [[179.0, 0.0], [180.0, 0.5]])
    assert np.allclose(b, [[-180.0, 0.5], [-179.0, 1.0]])

    # out-of-range point normalizes
    assert np.allclose(GF.wrap_dateline(("point", np.array([[190.0, 3.0]])))[1],
                       [[-170.0, 3.0]])


def test_set_precision_snaps_and_cleans():
    from gdal_ray.vector import geomfuncs as GF
    from gdal_ray.geo.wkb import geom_to_wkt
    import numpy as np

    ring = np.array([[0.012, 0.0], [1.049, 0.012], [1.051, 0.98],
                     [0.012, 1.04], [0.012, 0.0]])
    out = GF.set_precision(("polygon", [ring]), 0.1)
    assert geom_to_wkt(out) == "POLYGON ((0 0,1 0,1.1 1,0 1,0 0))", geom_to_wkt(out)

    # duplicate collapse after snapping + degenerate line -> empty
    line = np.array([[0.01, 0.01], [0.04, 0.02]])
    assert GF.set_precision(("linestring", line), 0.1) == ("geometrycollection", [])

    # half-away-from-zero ties (dyadic values so the quotient is exact:
    # 0.25/0.5 == 0.5 -> 1, -0.25/0.5 == -0.5 -> -1; half-even would give 0)
    pt = GF.set_precision(("point", np.array([[-0.25, 0.25]])), 0.5)
    assert np.allclose(pt[1], [[-0.5, 0.5]])


def test_wrap_dateline_and_set_precision_steps_run(ray_session):
    """The registered pipeline steps transform a WKB geometry column."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.steps import run_pipeline

    ring = np.array([[178.0, 10.0], [-178.0, 10.0], [-178.0, 20.0],
                     [178.0, 20.0], [178.0, 10.0]])
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "geometry": pa.array([W.geom_to_wkb(("polygon", [ring]))],
                                       pa.binary())})
    ds = rd.from_arrow(t)
    out = run_pipeline([("wrap-dateline", {}), ("set-precision", {"gridsize": 0.5})],
                       ds).take_all()
    g = W.parse_wkb(out[0]["geometry"])
    assert g[0] == "multipolygon" and len(g[1]) == 2


def test_llm_text_steps_from_cli_strings(sf_dir):
    """The round-5 text/graph ops are reachable from the pipeline step
    surface with CLI-style string arguments."""
    import ray.data as rd

    from gdal_ray.util import to_arrow

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    chunks = to_arrow(run_pipeline([("chunk", {"chunk_tokens": "8"})], docs))
    assert set(chunks.column_names) == {"doc_id", "chunk_idx", "chunk",
                                        "n_tokens"}
    assert chunks.num_rows > docs.count()

    packed = to_arrow(run_pipeline(
        [("pack", {"max_tokens": "64", "num_parts": "4"})], docs))
    assert packed.num_rows == docs.count()

    mixed = to_arrow(run_pipeline(
        [("mix", {"weights": "en:0.5,de:0.5"})], docs))
    assert 0 < mixed.num_rows < docs.count()
    assert set(mixed["lang"].to_pylist()) <= {"en", "de"}

    scored = to_arrow(run_pipeline(
        [("bm25", {"terms": "data,query", "top_k": "5"})], docs))
    assert scored.num_rows == 5
    assert scored["score"].to_pylist() == sorted(
        scored["score"].to_pylist(), reverse=True)

    import numpy as np
    import pyarrow as pa

    def mkedges(t):
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(ids),
                         "dst": pa.array((ids + 7) % 43)})

    edges = docs.map_batches(mkedges, batch_format="pyarrow",
                             batch_size=None)
    pr = to_arrow(run_pipeline(
        [("pagerank", {"max_iters": "10", "num_parts": "4"})], edges))
    assert abs(sum(pr["rank"].to_pylist()) - 1.0) < 1e-9
