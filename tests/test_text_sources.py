"""CSV / GeoJSON sources (OGR csv + geojson driver analogs)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.text import read_csv, read_geojson, write_geojson
from gdal_ray.util import to_arrow


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text(
        "id,name,Longitude,Latitude,score\n"
        "1,alpha,10.5,45.25,3.5\n"
        "2,beta,-120.75,-33.5,7\n"
        "3,gamma,0.0,0.0,1\n")
    return str(p)


def test_read_csv_auto_point_geometry(csv_file):
    from gdal_ray.geo import wkb as W

    t = to_arrow(read_csv(csv_file))
    assert "geometry" in t.column_names
    # Arrow CSV inferred types (OGR autodetect analog)
    assert pa.types.is_integer(t.schema.field("id").type)
    assert pa.types.is_floating(t.schema.field("score").type)
    d = t.to_pandas().sort_values("id")
    kind, c = W.parse_wkb(d["geometry"].iloc[1])
    assert kind == "point" and c[0][0] == -120.75 and c[0][1] == -33.5


def test_read_csv_wkt_geometry(tmp_path):
    from gdal_ray.geo import wkb as W

    p = tmp_path / "geoms.csv"
    p.write_text('id,WKT\n1,"POINT (3 4)"\n2,"POLYGON ((0 0,2 0,2 2,0 2,0 0))"\n')
    t = to_arrow(read_csv(str(p))).to_pandas().sort_values("id")
    k1, _ = W.parse_wkb(t["geometry"].iloc[0])
    k2, rings = W.parse_wkb(t["geometry"].iloc[1])
    assert k1 == "point" and k2 == "polygon" and len(rings[0]) == 5


def test_read_csv_no_geometry(tmp_path):
    p = tmp_path / "plain.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    t = to_arrow(read_csv(str(p)))
    assert t.column_names == ["a", "b"] and t.num_rows == 2


def test_geojson_roundtrip(tmp_path):
    src = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"id": 1, "name": "pt"},
             "geometry": {"type": "Point", "coordinates": [5.0, 6.0]}},
            {"type": "Feature", "properties": {"id": 2, "name": "poly"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 0], [4, 0], [4, 3], [0, 0]]]}},
            {"type": "Feature", "properties": {"id": 3, "name": "mls"},
             "geometry": {"type": "MultiLineString", "coordinates":
                          [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]}},
        ],
    }
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(src))
    ds = read_geojson(str(p))
    t = to_arrow(ds)
    assert t.num_rows == 3 and set(t.column_names) == {"id", "name", "geometry"}
    # write back and compare geometry structure
    out = tmp_path / "out.geojson"
    write_geojson(ds, str(out))
    doc = json.loads(out.read_text())
    got = {f["properties"]["id"]: f["geometry"] for f in doc["features"]}
    assert got[1] == {"type": "Point", "coordinates": [5.0, 6.0]}
    assert got[2]["type"] == "Polygon"
    assert np.asarray(got[2]["coordinates"][0]).tolist() == [[0, 0], [4, 0], [4, 3], [0, 0]]
    assert got[3]["type"] == "MultiLineString" and len(got[3]["coordinates"]) == 2


def test_geojson_pipeline_step_chain(tmp_path):
    """read_csv step -> filter -> write_geojson step (CLI pipeline path)."""
    from gdal_ray.pipelines.steps import STEPS

    p = tmp_path / "pts.csv"
    p.write_text("id,lon,lat\n1,10,20\n2,30,40\n3,50,60\n")
    ds = STEPS["read_csv"](path=str(p))(None)
    out = tmp_path / "o.geojson"
    STEPS["write_geojson"](path=str(out))(ds)
    doc = json.loads(out.read_text())
    assert len(doc["features"]) == 3
    assert doc["features"][0]["geometry"]["type"] == "Point"


def test_jsonl_round_trip_and_duckdb_parity(ray_session, sf_dir, tmp_path):
    """write_jsonl -> Ray read_json AND DuckDB read_json_auto both
    reproduce the source table exactly; open_source dispatches on
    .jsonl / jsonl://."""
    import duckdb
    import ray.data as rd

    from gdal_ray.pipelines.steps import run_pipeline
    from gdal_ray.sources import open_source
    from gdal_ray.util import sf_path, to_arrow

    out = str(tmp_path / "docs_jsonl")
    run_pipeline([
        ("read", {"path": sf_path(sf_dir, "documents"),
                  "columns": ["doc_id", "lang", "n_chars"]}),
        ("write_jsonl", {"path": out}),
    ])

    back = to_arrow(open_source(f"jsonl://{out}")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    src = to_arrow(rd.read_parquet(sf_path(sf_dir, "documents"),
                                   columns=["doc_id", "lang", "n_chars"])) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(src)
    assert (back["doc_id"].to_numpy() == src["doc_id"].to_numpy()).all()
    assert (back["lang"].to_numpy() == src["lang"].to_numpy()).all()
    assert (back["n_chars"].to_numpy() == src["n_chars"].to_numpy()).all()

    con = duckdb.connect()
    dk = con.execute(
        f"SELECT doc_id, lang, n_chars FROM read_json_auto('{out}/*.json') "
        f"ORDER BY doc_id").df()
    assert (dk["doc_id"].to_numpy() == src["doc_id"].to_numpy()).all()
    assert (dk["lang"].to_numpy() == src["lang"].to_numpy()).all()
