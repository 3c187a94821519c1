"""Warp: WebMercator tile table -> plate-carrée grid, vs direct evaluation."""

import numpy as np
import pandas as pd
import ray.data as rd

from gdal_ray.geo import webmercator as wm
from gdal_ray.stages.raster import TILE, warp_tiles_to_platecarree
from gdal_ray.util import to_arrow


def field(lon, lat):
    """Smooth deterministic scalar field, quantized to uint32."""
    return (1000 + 400 * np.sin(np.radians(lon)) + 300 * np.cos(np.radians(lat * 2))).astype(np.uint32)


def _source_tiles(zoom):
    """Materialize every tile intersecting lon [0,90], lat [0,60], sampled
    at true mercator pixel centers."""
    tx0, ty1 = wm.lonlat_to_tile(np.array([0.0]), np.array([0.0]), zoom)
    tx1, ty0 = wm.lonlat_to_tile(np.array([89.9]), np.array([59.9]), zoom)
    rows = []
    for tx in range(int(tx0[0]), int(tx1[0]) + 1):
        for ty in range(int(ty0[0]), int(ty1[0]) + 1):
            gx = tx * TILE + np.arange(TILE) + 0.5
            gy = ty * TILE + np.arange(TILE) + 0.5
            n = (1 << zoom) * TILE
            lon = gx / n * 360.0 - 180.0
            lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * gy / n))))
            LON, LAT = np.meshgrid(lon, lat)
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": field(LON, LAT).tobytes()})
    return rd.from_pandas(pd.DataFrame(rows))


def test_warp_nearest_and_bilinear():
    zoom = 3
    tiles = _source_tiles(zoom)
    out = to_arrow(
        warp_tiles_to_platecarree(tiles, zoom, out_cell_deg=0.5, method="nearest",
                                  out_block=64)
    ).to_pandas()
    assert len(out) > 0
    # pick a block fully inside the source coverage and compare to truth
    blk = out[(out.block_x == (int((30 + 180) / 32))) & (out.block_y == int((90 - 50) / 32))]
    assert len(blk) == 1
    arr = np.frombuffer(blk["data"].iloc[0], np.uint32).reshape(64, 64)
    bx, by = int(blk["block_x"].iloc[0]), int(blk["block_y"].iloc[0])
    lons = -180.0 + (bx * 64 + np.arange(64) + 0.5) * 0.5
    lats = 90.0 - (by * 64 + np.arange(64) + 0.5) * 0.5
    LON, LAT = np.meshgrid(lons, lats)
    truth = field(LON, LAT).astype(np.float64)
    # the smooth field reproduces to within uint32 quantization + the
    # source-pixel sampling offset (a few counts at zoom 3)
    err = np.abs(arr.astype(np.float64) - truth)
    assert err.max() <= 3 and err.mean() < 1.0

    out_b = to_arrow(
        warp_tiles_to_platecarree(tiles, zoom, out_cell_deg=0.5, method="bilinear",
                                  out_block=64)
    ).to_pandas()
    blk_b = out_b[(out_b.block_x == bx) & (out_b.block_y == by)]
    arr_b = np.frombuffer(blk_b["data"].iloc[0], np.uint32).reshape(64, 64)
    err_b = np.abs(arr_b.astype(np.float64) - truth)
    assert err_b.max() <= 3 and err_b.mean() < 1.0


def test_warp_to_utm_analytic_field():
    # analytic field f(lon, lat) = floor(lon) + 2*floor(lat) burned into z6
    # tiles over the UTM zone 31 area; warping to a UTM-31N grid must
    # reproduce f at every output cell whose center maps into the source
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo import webmercator as wm
    from gdal_ray.geo.crs import utm_zone_transformer
    from gdal_ray.stages.raster import TILE, warp_tiles_to_crs

    zoom = 6
    tm = utm_zone_transformer(31)
    # source tiles covering lon 0..6, lat 44..52
    tx0, ty1 = wm.lonlat_to_tile(np.array([0.0]), np.array([44.0]), zoom)
    tx1, ty0 = wm.lonlat_to_tile(np.array([6.0]), np.array([52.0]), zoom)
    rows = []
    n = float(1 << zoom) * TILE
    for tx in range(int(tx0[0]), int(tx1[0]) + 1):
        for ty in range(int(ty0[0]), int(ty1[0]) + 1):
            gx = tx * TILE + np.arange(TILE)[None, :]
            gy = ty * TILE + np.arange(TILE)[None, :].T
            lon = (gx + 0.5) / n * 360.0 - 180.0
            lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (gy + 0.5) / n))))
            arr = (np.floor(lon) + 2.0 * np.floor(lat) + 200.0).astype(np.uint32)
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": np.ascontiguousarray(arr).tobytes()})
    tiles = rd.from_pandas(pd.DataFrame(rows))

    # target: UTM grid around the middle of the area (lon 2..4, lat 46..50)
    e0, n0 = tm.forward(np.array([2.0]), np.array([46.0]))
    e1, n1 = tm.forward(np.array([4.0]), np.array([50.0]))
    extent = (float(e0[0]), float(n0[0]), float(e1[0]), float(n1[0]))
    out = warp_tiles_to_crs(tiles, zoom, tm, extent=extent, out_cell=2000.0,
                            out_block=32, dtype=np.uint32, nodata=0)
    from gdal_ray.util import to_arrow

    t = to_arrow(out)
    assert t.num_rows > 0
    checked = 0
    for i in range(t.num_rows):
        bx, by = t["block_x"][i].as_py(), t["block_y"][i].as_py()
        arr = np.frombuffer(t["data"][i].as_py(), np.uint32).reshape(32, 32)
        xs = extent[0] + (bx * 32 + np.arange(32) + 0.5) * 2000.0
        ys = extent[3] - (by * 32 + np.arange(32) + 0.5) * 2000.0
        XX, YY = np.meshgrid(xs, ys)
        lon, lat = tm.inverse(XX.ravel(), YY.ravel())
        expect = (np.floor(lon) + 2.0 * np.floor(lat) + 200.0)
        got = arr.ravel().astype(np.float64)
        m = got != 0  # inside source coverage
        # nearest-neighbor resample: allow the half-pixel boundary cells to
        # differ (floor() jumps at integer lon/lat); the bulk must be exact
        frac_exact = (got[m] == expect[m]).mean()
        assert frac_exact > 0.97, frac_exact
        checked += int(m.sum())
    assert checked > 1000


def test_warp_kernel_family_linear_field_and_tiled_equals_single():
    """cubic / cubicspline / lanczos / mode kernels:
    (1) on a LINEAR field (in mercator pixel coords) bilinear, cubic and
        cubicspline reproduce the field exactly (all three kernels are
        exact on linear polynomials); lanczos is near-exact;
    (2) each kernel's tiled (distributed) output equals a single-array
        reference evaluation built from the same mosaic — cross-tile seams
        introduce no error."""
    from gdal_ray.stages.raster import _sample_kernel

    zoom = 3
    n = (1 << zoom) * TILE

    def lin_field(gx, gy):
        # linear in GLOBAL mercator pixel coords (the interpolation domain)
        return (3.0 * gx + 2.0 * gy + 100.0)

    # mosaic 2x2 tiles around lon~33,lat~40 and a dict for the sampler
    txs = range(4, 6)
    tys = range(2, 4)
    rows = []
    src = {}
    for tx in txs:
        for ty in tys:
            gx = tx * TILE + np.arange(TILE) + 0.5
            gy = ty * TILE + np.arange(TILE) + 0.5
            GX, GY = np.meshgrid(gx, gy)
            arr = lin_field(GX, GY)
            src[(tx, ty)] = arr
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": arr.astype(np.float64).tobytes()})
    tiles = rd.from_pandas(pd.DataFrame(rows))

    # sample positions well inside the mosaic (away from outer edges)
    rng = np.random.RandomState(3)
    px = (4 * TILE + 20) + rng.uniform(0, 2 * TILE - 40, size=500)
    py = (2 * TILE + 20) + rng.uniform(0, 2 * TILE - 40, size=500)
    truth = lin_field(px, py)
    for method, tol in (("bilinear", 1e-9), ("cubic", 1e-9),
                        ("cubicspline", 1e-9), ("lanczos", 0.2)):
        got = _sample_kernel(src, px, py, method, nodata=0)
        err = np.abs(got - truth)
        assert err.max() < tol, (method, err.max())

    # distributed warp == single-array reference for every kernel
    from gdal_ray.stages.raster import warp_tiles_to_platecarree

    for method in ("cubic", "cubicspline", "lanczos", "mode"):
        out = to_arrow(warp_tiles_to_platecarree(
            tiles, zoom, out_cell_deg=0.5, method=method, out_block=32,
            dtype=np.float64)).to_pandas()
        for _, blk in out.iterrows():
            bx, by = int(blk["block_x"]), int(blk["block_y"])
            lons = -180.0 + (bx * 32 + np.arange(32) + 0.5) * 0.5
            lats = 90.0 - (by * 32 + np.arange(32) + 0.5) * 0.5
            LON, LAT = np.meshgrid(lons, lats)
            ppx, ppy = wm.lonlat_to_pixel(LON.ravel(), LAT.ravel(), zoom)
            ref = _sample_kernel(src, ppx, ppy, method, nodata=0)
            got = np.frombuffer(blk["data"], np.float64)
            assert np.array_equal(got, ref), (method, bx, by)


def test_warp_mode_preserves_categories():
    """mode warp on a categorical raster: every output value is one of the
    input category labels (no blending), and constant regions stay exact."""
    from gdal_ray.stages.raster import _sample_kernel

    src = {(0, 0): np.full((TILE, TILE), 7.0)}
    src[(0, 0)][:, :128] = 3.0
    rng = np.random.RandomState(1)
    px = rng.uniform(2, TILE - 2, size=300)
    py = rng.uniform(2, TILE - 2, size=300)
    got = _sample_kernel(src, px, py, "mode", nodata=0)
    assert set(np.unique(got)) <= {3.0, 7.0}
    deep_left = (px < 100)
    assert np.all(got[deep_left] == 3.0)


def test_overview_reduce_mode_and_rms():
    from gdal_ray.stages.raster import _reduce2x2

    r = np.array([[1, 1], [2, 3]], dtype=np.float64).reshape(1, 2, 1, 2)
    assert _reduce2x2(r, "mode")[0, 0] == 1.0      # majority
    r2 = np.array([[5, 5], [2, 2]], dtype=np.float64).reshape(1, 2, 1, 2)
    assert _reduce2x2(r2, "mode")[0, 0] == 2.0     # tie -> smallest
    r3 = np.array([[3, 4], [0, 0]], dtype=np.float64).reshape(1, 2, 1, 2)
    assert abs(_reduce2x2(r3, "rms")[0, 0] - np.sqrt((9 + 16) / 4)) < 1e-12
