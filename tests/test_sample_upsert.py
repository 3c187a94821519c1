"""Pixel-info sampling + partitioned upsert."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import webmercator as wm
from gdal_ray.stages.raster import TILE, points_to_tile_counts, sample_tiles_at_points
from gdal_ray.state import manifest as M
from gdal_ray.util import to_arrow


def test_sample_tiles_at_points():
    zoom = 5
    rng = np.random.RandomState(3)
    lon = rng.uniform(0, 40, 8000)
    lat = rng.uniform(30, 60, 8000)
    tiles = points_to_tile_counts(
        rd.from_arrow(pa.table({"lon": lon, "lat": lat})), zoom=zoom
    ).materialize()
    # sample the density raster back at a subset of the SAME points:
    # every sampled value must be >= 1 (the point itself was counted there)
    q = pa.table({"pid": pa.array(np.arange(500), pa.int64()),
                  "lon": pa.array(lon[:500]), "lat": pa.array(lat[:500])})
    out = to_arrow(
        sample_tiles_at_points(tiles.drop_columns(["n_points"]), rd.from_arrow(q), zoom)
    ).to_pandas()
    assert len(out) == 500
    assert (out["value"] >= 1).all()
    # a point in an empty region samples nodata
    far = pa.table({"pid": pa.array([99], pa.int64()),
                    "lon": pa.array([-150.0]), "lat": pa.array([-60.0])})
    out2 = to_arrow(
        sample_tiles_at_points(tiles.drop_columns(["n_points"]), rd.from_arrow(far), zoom)
    ).to_pandas()
    assert out2["value"].iloc[0] == 0.0


def test_upsert_partitioned(tmp_path):
    out = str(tmp_path / "u")
    base = rd.from_arrow(pa.table({
        "cell": np.arange(300) % 5, "id": np.arange(300), "v": np.zeros(300)}))
    M.write_partitioned_resumable(base, out, "cell").materialize()
    before = M.completed_keys(out)
    # upsert: update 3 existing keys in cell 1, insert 2 new keys in cell 1
    new = pa.table({
        "cell": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
        "id": pa.array([1, 6, 11, 9001, 9002], type=pa.int64()),
        "v": pa.array([9.0, 9.0, 9.0, 9.0, 9.0]),
    })
    touched = M.upsert_partitioned(out, new, "cell", "id")
    assert touched == ["1"]
    after = M.completed_keys(out)
    # untouched partitions keep identical manifests
    for k in before:
        if k != "1":
            assert before[k]["checksum"] == after[k]["checksum"]
    df = to_arrow(M.read_partitioned(out)).to_pandas()
    assert len(df) == 302  # 300 + 2 inserts
    assert (df[df["id"].isin([1, 6, 11, 9001, 9002])]["v"] == 9.0).all()
    assert all(M.verify_manifest(out).values())


def test_sample_bilinear_linear_field():
    # zoom 1: a 2x2 tile world; value = gx + 2*gy is linear in global pixel
    # coords, so bilinear sampling must reproduce it EXACTLY — including at
    # points whose 2x2 window straddles a tile border (halo strips).
    zoom = 1
    rows = []
    for ty in range(2):
        for tx in range(2):
            gx = tx * TILE + np.arange(TILE)[None, :]
            gy = ty * TILE + np.arange(TILE)[None, :].T
            arr = (gx + 2.0 * gy).astype(np.float64)
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": arr.tobytes()})
    tiles = rd.from_pandas(pd.DataFrame(rows))

    n = float(1 << zoom) * TILE
    # sample pixels: interior fractional + straddling the x=256 and y=256
    # tile borders
    px = np.array([100.3, 255.9, 256.1, 400.0, 255.5, 300.7])
    py = np.array([200.8, 100.2, 300.6, 255.9, 256.4, 257.0])
    lon = px / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * py / n))))
    pts = rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(px.size), pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    out = to_arrow(sample_tiles_at_points(
        tiles, pts, zoom, method="bilinear", dtype=np.float64
    )).to_pandas().sort_values("pid")
    expect = (px - 0.5) + 2.0 * (py - 0.5)
    assert np.allclose(out["value"].to_numpy(), expect, atol=1e-9), out


def test_sample_rejects_unknown_method():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_tiles_at_points(None, None, 5, method="sinc2")


def _tile_world(zoom, field):
    rows = []
    for ty in range(1 << zoom):
        for tx in range(1 << zoom):
            gx = tx * TILE + np.arange(TILE)[None, :]
            gy = ty * TILE + np.arange(TILE)[None, :].T
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": field(gx, gy).astype(np.float64).tobytes()})
    return rows


def test_sample_kernels_tiled_equals_single_array():
    """interpolate-at-point cubic/cubicspline/lanczos
    (alg/gdal_interpolateatpoint.cpp:172-202): the tiled distributed
    sampler with halo strips must equal _sample_kernel over the full
    tile dict — including points whose kernel window straddles tile
    borders and the raster edge."""
    from gdal_ray.stages.raster import _sample_kernel

    zoom = 1
    rng = np.random.RandomState(7)
    vals = {}

    def field(gx, gy):
        a = rng.standard_normal(gx.shape) * 10.0 + np.sin(gx * 0.1) + gy * 0.01
        vals[(int(gx.min()) // TILE, int(gy.min()) // TILE)] = a
        return a

    rows = _tile_world(zoom, field)
    tiles = rd.from_pandas(pd.DataFrame(rows))
    n = float(1 << zoom) * TILE
    px = np.array([100.3, 255.9, 256.1, 400.0, 255.5, 300.7, 1.2, 510.9, 2.0, 509.5])
    py = np.array([200.8, 100.2, 300.6, 255.9, 256.4, 257.0, 0.7, 511.3, 300.0, 2.2])
    lon = px / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * py / n))))
    pts = rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(px.size), pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    for method in ("bilinear", "cubic", "cubicspline", "lanczos"):
        out = to_arrow(sample_tiles_at_points(
            tiles, pts, zoom, method=method, dtype=np.float64, nodata=-999.0
        )).to_pandas().sort_values("pid")
        # recompute the EXACT sample positions the stage uses
        spx, spy = wm.lonlat_to_pixel(lon, lat, zoom)
        expect = _sample_kernel(vals, spx, spy, method, -999.0)
        assert np.allclose(out["value"].to_numpy(), expect, atol=1e-9), method


def test_sample_cubic_exact_on_quadratic_field():
    """Cubic convolution (A=-0.5) is exact for polynomials up to degree 2;
    the cubic B-spline reproduces linear fields. Tiled sampling across
    borders must hit those identities to 1e-6."""
    zoom = 1
    rows = _tile_world(zoom, lambda gx, gy: (0.01 * (gx - 200.0) ** 2
                                             + 0.5 * gx + 2.0 * gy + 7.0))
    tiles = rd.from_pandas(pd.DataFrame(rows)).materialize()
    n = float(1 << zoom) * TILE
    px = np.array([100.3, 255.9, 256.1, 400.0, 255.5, 300.7])
    py = np.array([200.8, 100.2, 300.6, 255.9, 256.4, 257.0])
    lon = px / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * py / n))))
    pts = rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(px.size), pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    spx, spy = wm.lonlat_to_pixel(lon, lat, zoom)
    fx, fy = spx - 0.5, spy - 0.5
    out = to_arrow(sample_tiles_at_points(
        tiles, pts, zoom, method="cubic", dtype=np.float64
    )).to_pandas().sort_values("pid")
    expect = 0.01 * (fx - 200.0) ** 2 + 0.5 * fx + 2.0 * fy + 7.0
    assert np.allclose(out["value"].to_numpy(), expect, rtol=1e-9), out

    rows_lin = _tile_world(zoom, lambda gx, gy: (0.5 * gx + 2.0 * gy + 7.0))
    tiles_lin = rd.from_pandas(pd.DataFrame(rows_lin))
    out2 = to_arrow(sample_tiles_at_points(
        tiles_lin, pts, zoom, method="cubicspline", dtype=np.float64
    )).to_pandas().sort_values("pid")
    expect2 = 0.5 * fx + 2.0 * fy + 7.0
    assert np.allclose(out2["value"].to_numpy(), expect2, rtol=1e-9), out2
