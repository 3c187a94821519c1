"""Distributed raster stages: tile burn shuffle, overview reduce,
cross-tile polygonize merge."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import webmercator as wm
from gdal_ray.geo import wkb as W
from gdal_ray.raster.polygonize import polygonize
from gdal_ray.stages import raster as RS
from gdal_ray.util import to_arrow


def test_points_to_tile_counts_and_overview():
    rng = np.random.RandomState(9)
    n = 20000
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(40, 50, n)
    ds = rd.from_arrow(pa.table({"lon": lon, "lat": lat}))
    tiles = to_arrow(RS.points_to_tile_counts(ds, zoom=6))
    assert tiles["n_points"].to_pylist() and sum(tiles["n_points"].to_pylist()) == n
    # every point is in the right tile
    tx, ty = wm.lonlat_to_tile(lon, lat, 6)
    import collections

    exp = collections.Counter(zip(tx.tolist(), ty.tolist()))
    got = {
        (x, y): c
        for x, y, c in zip(
            tiles["tile_x"].to_pylist(), tiles["tile_y"].to_pylist(), tiles["n_points"].to_pylist()
        )
    }
    assert got == dict(exp)
    # overview reduce preserves the total count
    parents = to_arrow(RS.overview_reduce(rd.from_arrow(tiles)))
    assert sum(parents["n_points"].to_pylist()) == n
    assert (np.array(parents["zoom"].to_pylist()) == 5).all()


def test_burn_features_to_tiles():
    polys = [
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((0 40,0 50,10 50,10 40,0 40))")),
        W.geom_to_wkb(W.wkt_to_geom("POLYGON ((-20 30,-20 35,-15 35,-15 30,-20 30))")),
    ]
    ds = rd.from_arrow(pa.table({"geometry": pa.array(polys, pa.binary()),
                                 "val": pa.array([7.0, 3.0])}))
    tiles = to_arrow(RS.burn_features_to_tiles(ds, zoom=5, burn_col="val", dtype=np.uint8))
    assert tiles.num_rows >= 2
    data = np.frombuffer(tiles["data"][0].as_py(), dtype=np.uint8)
    assert set(np.unique(data)) <= {0, 3, 7}
    assert any(v > 0 for v in tiles["checksum"].to_pylist())


def test_distributed_polygonize_matches_single():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 3, size=(16, 16)).astype(np.uint8)
    # single-array truth
    truth = polygonize(arr, connectivity=4)

    def summarize(polys):
        # multiset of (value, region area) — ring-order independent
        out = []
        for v, rings in polys:
            a = -sum(RS._ring_area2_list([tuple(p) for p in r.tolist()]) for r in rings) / 2.0
            out.append((int(v), round(a, 6)))
        return sorted(out)

    # split into 4 tiles of 8x8
    tiles = []
    for ty in range(2):
        for tx in range(2):
            tiles.append(((tx, ty), arr[ty * 8 : (ty + 1) * 8, tx * 8 : (tx + 1) * 8]))
    dist = RS.polygonize_tiles(tiles, connectivity=4)
    assert summarize(dist) == summarize(truth)


def test_distributed_polygonize_8conn_and_nodata():
    arr = np.zeros((8, 8), np.uint8)
    arr[1, 1] = arr[2, 2] = 5  # diagonal pair crossing nothing
    arr[5, 5] = arr[6, 6] = 5  # diagonal pair crossing the tile border at (6,6)? inside tile
    tiles = [((0, 0), arr[:, :4].copy()), ((1, 0), arr[:, 4:].copy())]
    d4 = RS.polygonize_tiles(tiles, connectivity=4, nodata=0)
    d8 = RS.polygonize_tiles(tiles, connectivity=8, nodata=0)
    assert len(d4) == 4 and len(d8) == 2


def test_cross_tile_region_merged():
    # one region spanning two tiles horizontally
    left = np.zeros((4, 4), np.uint8)
    right = np.zeros((4, 4), np.uint8)
    left[1:3, 2:4] = 9
    right[1:3, 0:2] = 9
    out = RS.polygonize_tiles([((0, 0), left), ((1, 0), right)], connectivity=4, nodata=0)
    assert len(out) == 1
    v, rings = out[0]
    assert v == 9 and len(rings) == 1
    xs = rings[0][:, 0]
    assert xs.min() == 2.0 and xs.max() == 6.0  # spans the border seamlessly


def test_tiles_as_features_roundtrip():
    """as-features of a density raster recovers every counted point's pixel."""
    rng = np.random.RandomState(31)
    lon = rng.uniform(-5, 5, 3000)
    lat = rng.uniform(45, 55, 3000)
    ds = rd.from_arrow(pa.table({"lon": lon, "lat": lat}))
    tiles = RS.points_to_tile_counts(ds, zoom=6).materialize()
    feats = to_arrow(
        RS.tiles_as_features(tiles.drop_columns(["n_points"]), 6, nodata=0)
    )
    assert sum(feats["value"].to_pylist()) == 3000  # every point accounted
    # feature lon/lat are pixel centers inside the original bbox (padded)
    assert min(feats["lon"].to_pylist()) > -6 and max(feats["lat"].to_pylist()) < 56


def test_band_statistics_exact():
    TILE = RS.TILE
    rng = np.random.RandomState(44)
    arr = rng.randint(0, 1000, size=(2 * TILE, 2 * TILE)).astype(np.uint32)
    rows = []
    for ty in range(2):
        for tx in range(2):
            sub = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            rows.append({"zoom": 5, "tile_x": tx, "tile_y": ty,
                         "data": np.ascontiguousarray(sub).tobytes()})
    import pandas as pd

    out = to_arrow(RS.band_statistics(
        rd.from_pandas(pd.DataFrame(rows)), dtype=np.uint32)).to_pandas()
    a = arr.astype(np.float64)
    assert out["count"].iloc[0] == a.size
    assert out["min"].iloc[0] == a.min() and out["max"].iloc[0] == a.max()
    assert abs(out["mean"].iloc[0] - a.mean()) < 1e-9
    assert abs(out["std"].iloc[0] - a.std()) < 1e-9
    # nodata excluded
    out2 = to_arrow(RS.band_statistics(
        rd.from_pandas(pd.DataFrame(rows)), dtype=np.uint32, nodata=0)).to_pandas()
    nz = a[a != 0]
    assert out2["count"].iloc[0] == nz.size
    assert abs(out2["mean"].iloc[0] - nz.mean()) < 1e-9


def test_pansharpen_brovey():
    TILE = RS.TILE
    rows_rgb, rows_pan = [], []
    r = np.full((TILE, TILE), 80, np.uint32)
    g = np.full((TILE, TILE), 40, np.uint32)
    b = np.full((TILE, TILE), 30, np.uint32)
    pan = np.full((TILE, TILE), 100, np.uint32)  # pseudo_pan = 50 -> ratio 2
    import pandas as pd

    for band, arr in ((0, r), (1, g), (2, b)):
        rows_rgb.append({"tile_x": 0, "tile_y": 0, "band": band,
                         "data": arr.tobytes()})
    rows_pan.append({"tile_x": 0, "tile_y": 0, "data": pan.tobytes()})
    out = to_arrow(RS.pansharpen_tiles(
        rd.from_pandas(pd.DataFrame(rows_rgb)),
        rd.from_pandas(pd.DataFrame(rows_pan))))
    assert out.num_rows == 1
    packed = np.frombuffer(out["data"][0].as_py(), np.uint32).reshape(TILE, TILE)
    assert (packed & 255 == 160).all()
    assert ((packed >> 8) & 255 == 80).all()
    assert ((packed >> 16) & 255 == 60).all()
    assert (packed >> 24 == 255).all()


def test_footprint_tiles_ds():
    """raster footprint: valid-data mask polygons across a tile seam,
    with min_ring_area pruning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.geo import wkb as W
    from gdal_ray.stages.raster import TILE, footprint_tiles_ds
    from gdal_ray.vector.geomfuncs import area

    full = np.zeros((TILE, 2 * TILE), np.uint32)
    full[50:200, 200:320] = 7       # big region straddling the tile seam
    full[10:13, 10:13] = 5          # tiny 9-px island
    rows = []
    for tx in range(2):
        rows.append({"zoom": 4, "tile_x": tx, "tile_y": 0,
                     "data": np.ascontiguousarray(
                         full[:, tx * TILE:(tx + 1) * TILE]).tobytes()})
    tiles = rd.from_pandas(pd.DataFrame(rows))
    fp = footprint_tiles_ds(tiles, nodata=0)
    assert fp.num_rows == 2
    areas = sorted(area(W.parse_wkb(b)) for b in fp["geometry"].to_pylist())
    assert areas == [9.0, 150 * 120]
    fp2 = footprint_tiles_ds(tiles, nodata=0, min_ring_area=100.0)
    assert fp2.num_rows == 1
    assert area(W.parse_wkb(fp2["geometry"][0].as_py())) == 150 * 120


def test_overview_reduce_nearest():
    import numpy as np

    from gdal_ray.stages.raster import _reduce2x2

    r = np.array([[9, 1], [2, 3]], dtype=np.float64).reshape(1, 2, 1, 2)
    assert _reduce2x2(r, "nearest")[0, 0] == 9.0


def test_crop_tiles_drops_and_masks():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo import webmercator as wm
    from gdal_ray.stages.raster import TILE, crop_tiles
    from gdal_ray.util import to_arrow

    zoom = 4
    arr = np.ones((TILE, TILE), np.uint32)
    rows = [{"zoom": zoom, "tile_x": tx, "tile_y": ty, "data": arr.tobytes()}
            for tx in range(4, 8) for ty in range(4, 8)]
    tiles = rd.from_pandas(pd.DataFrame(rows))
    # bbox covering roughly tiles (5..6, 5..6) at zoom 4
    lon0, _, _, lat1 = wm.tile_bounds(5, 5, zoom)   # west edge + NORTH lat
    _, lat0, lon1, _ = wm.tile_bounds(6, 6, zoom)   # SOUTH lat + east edge
    eps = 1e-6
    out = to_arrow(crop_tiles(tiles, zoom, (lon0 + eps, lat0 + eps,
                                            lon1 - eps, lat1 - eps)))
    keys = {(r["tile_x"], r["tile_y"]) for r in out.to_pylist()}
    assert keys == {(tx, ty) for tx in (5, 6) for ty in (5, 6)}
    # fully-inside tiles untouched; total surviving pixels ~= bbox area
    total = sum(np.frombuffer(r["data"], np.uint32).sum() for r in out.to_pylist())
    assert 4 * TILE * TILE * 0.95 <= total <= 4 * TILE * TILE


def test_hillshade_multidirectional_range_and_flat():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.raster.mapops import dem_hillshade_multidirectional
    from gdal_ray.stages.raster import TILE
    from gdal_ray.util import to_arrow

    yy, xx = np.meshgrid(np.arange(TILE, dtype=float),
                         np.arange(TILE, dtype=float), indexing="ij")
    dem = (0.2 * xx + 0.1 * yy).astype(np.float32)
    tiles = rd.from_pandas(pd.DataFrame([
        {"zoom": 0, "tile_x": 0, "tile_y": 0, "data": dem.tobytes()}]))
    out = to_arrow(dem_hillshade_multidirectional(tiles))
    sh = np.frombuffer(out["data"][0].as_py(), np.float32).reshape(TILE, TILE)
    assert 0 <= sh.min() and sh.max() <= 255
    # a constant-gradient plane shades to one interior value
    interior = sh[2:-2, 2:-2]
    assert interior.std() < 1e-3
    # flat terrain -> uniform sin(alt) * 255
    flat = rd.from_pandas(pd.DataFrame([
        {"zoom": 0, "tile_x": 0, "tile_y": 0,
         "data": np.zeros((TILE, TILE), np.float32).tobytes()}]))
    outf = to_arrow(dem_hillshade_multidirectional(flat))
    shf = np.frombuffer(outf["data"][0].as_py(), np.float32)
    assert np.allclose(shf, np.sin(np.radians(45)) * 255, atol=1e-3)


def test_zonal_stats_raster_matches_numpy():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.stages.raster import TILE, zonal_stats_raster
    from gdal_ray.util import to_arrow

    rng = np.random.RandomState(4)
    zones_full = rng.randint(0, 5, (TILE, 2 * TILE)).astype(np.uint32)
    vals_full = rng.randint(0, 1000, (TILE, 2 * TILE)).astype(np.uint32)

    def tiles_of(full):
        rows = []
        for tx in range(2):
            rows.append({"tile_x": tx, "tile_y": 0,
                         "data": np.ascontiguousarray(
                             full[:, tx * TILE:(tx + 1) * TILE]).tobytes()})
        return rd.from_pandas(pd.DataFrame(rows))

    out = to_arrow(zonal_stats_raster(
        tiles_of(zones_full), tiles_of(vals_full),
        zone_nodata=0)).to_pandas().sort_values("zone").reset_index(drop=True)
    assert out["zone"].tolist() == [1, 2, 3, 4]   # 0 is nodata
    for _, r in out.iterrows():
        sel = vals_full[zones_full == r["zone"]].astype(np.float64)
        assert r["count"] == sel.size
        assert abs(r["sum"] - sel.sum()) < 1e-6
        assert abs(r["mean"] - sel.mean()) < 1e-9
        assert r["min"] == sel.min() and r["max"] == sel.max()
        assert abs(r["std"] - sel.std()) < 1e-9
