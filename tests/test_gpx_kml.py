"""GPX / KML drivers: parse goldens + write->read round-trips + registry
dispatch. Reference behavior: ogr/ogrsf_frmts/gpx (waypoints/routes/tracks
layers), ogr/ogrsf_frmts/kml (Placemark geometry + ExtendedData)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.sources import open_source
from gdal_ray.sources.gpx_kml import (read_gpx, read_kml, write_gpx,
                                      write_kml)
from gdal_ray.util import to_arrow

GPX_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="test" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="48.2" lon="16.37"><name>Wien</name><ele>171.0</ele>
    <time>2024-01-01T00:00:00Z</time></wpt>
  <wpt lat="47.07" lon="15.44"><name>Graz</name></wpt>
  <rte><name>r1</name>
    <rtept lat="48.0" lon="16.0"/><rtept lat="47.5" lon="15.8"/></rte>
  <trk><name>t1</name>
    <trkseg><trkpt lat="48.0" lon="16.0"/><trkpt lat="48.1" lon="16.1"/></trkseg>
    <trkseg><trkpt lat="48.2" lon="16.2"/><trkpt lat="48.3" lon="16.3"/></trkseg>
  </trk>
</gpx>"""

KML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder>
  <Placemark><name>pt</name>
    <ExtendedData><Data name="pop"><value>1900000</value></Data></ExtendedData>
    <Point><coordinates>16.37,48.2,171</coordinates></Point></Placemark>
  <Placemark><name>ln</name>
    <LineString><coordinates>16,48 15.8,47.5</coordinates></LineString>
  </Placemark>
  <Placemark><name>pg</name>
    <Polygon><outerBoundaryIs><LinearRing>
      <coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>
    </LinearRing></outerBoundaryIs><innerBoundaryIs><LinearRing>
      <coordinates>1,1 2,1 2,2 1,2 1,1</coordinates>
    </LinearRing></innerBoundaryIs></Polygon></Placemark>
</Folder></Document></kml>"""


def _write(tmp_path, name, doc):
    p = tmp_path / name
    p.write_text(doc)
    return str(p)


def test_gpx_parse_layers(tmp_path):
    t = to_arrow(read_gpx(_write(tmp_path, "a.gpx", GPX_DOC)))
    by = {r["layer"]: r for r in t.to_pylist() if r["layer"] != "waypoints"}
    wpts = [r for r in t.to_pylist() if r["layer"] == "waypoints"]
    assert [w["name"] for w in wpts] == ["Wien", "Graz"]
    assert wpts[0]["ele"] == 171.0
    assert wpts[0]["time"] == "2024-01-01T00:00:00Z"
    k, body = W.parse_wkb(wpts[0]["geometry"])
    assert k == "point" and tuple(body[0]) == (16.37, 48.2)
    k, body = W.parse_wkb(by["routes"]["geometry"])
    assert k == "linestring" and body.shape == (2, 2)
    k, body = W.parse_wkb(by["tracks"]["geometry"])
    assert k == "multilinestring" and len(body) == 2
    assert np.asarray(body[1][1]).shape == (2, 2)


def test_gpx_roundtrip(tmp_path):
    src = to_arrow(read_gpx(_write(tmp_path, "a.gpx", GPX_DOC)))
    out = str(tmp_path / "b.gpx")
    n = write_gpx(rd.from_arrow(src), out)
    assert n == src.num_rows
    back = to_arrow(read_gpx(out)).sort_by("layer")
    src = src.sort_by("layer")
    assert back["layer"].to_pylist() == src["layer"].to_pylist()
    assert back["name"].to_pylist() == src["name"].to_pylist()
    assert back["geometry"].to_pylist() == src["geometry"].to_pylist()


def test_kml_parse(tmp_path):
    t = to_arrow(read_kml(_write(tmp_path, "a.kml", KML_DOC)))
    rows = {r["name"]: r for r in t.to_pylist()}
    assert rows["pt"]["pop"] == "1900000"
    k, body = W.parse_wkb(rows["pt"]["geometry"])
    assert k == "point" and tuple(body[0]) == (16.37, 48.2)
    k, body = W.parse_wkb(rows["ln"]["geometry"])
    assert k == "linestring" and body.shape == (2, 2)
    k, rings = W.parse_wkb(rows["pg"]["geometry"])
    assert k == "polygon" and len(rings) == 2
    assert np.asarray(rings[0]).shape == (5, 2)


def test_kml_roundtrip(tmp_path):
    src = to_arrow(read_kml(_write(tmp_path, "a.kml", KML_DOC)))
    out = str(tmp_path / "b.kml")
    n = write_kml(rd.from_arrow(src), out)
    assert n == src.num_rows
    back = to_arrow(read_kml(out)).sort_by("name")
    src = src.sort_by("name")
    assert back["name"].to_pylist() == src["name"].to_pylist()
    assert back["pop"].to_pylist() == src["pop"].to_pylist()
    assert back["geometry"].to_pylist() == src["geometry"].to_pylist()


def test_registry_dispatch(tmp_path):
    g = _write(tmp_path, "a.gpx", GPX_DOC)
    k = _write(tmp_path, "a.kml", KML_DOC)
    assert to_arrow(open_source(g)).num_rows == 4
    assert to_arrow(open_source(f"kml://{k}")).num_rows == 3


def test_kml_multigeometry_roundtrip(tmp_path):
    mp = W.geom_to_wkb(("multipoint", [("point", np.array([[1.0, 2.0]])),
                                       ("point", np.array([[3.0, 4.0]]))]))
    t = pa.table({"name": pa.array(["m"]),
                  "geometry": pa.array([mp], pa.binary())})
    out = str(tmp_path / "m.kml")
    write_kml(rd.from_arrow(t), out)
    back = to_arrow(read_kml(out))
    k, parts = W.parse_wkb(back["geometry"][0].as_py())
    assert k == "geometrycollection" and len(parts) == 2
    assert tuple(parts[1][1][0]) == (3.0, 4.0)
