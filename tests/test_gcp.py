"""GCP polynomial / TPS / RPC transformers (alg/gdal_crs.cpp,
alg/thinplatespline.cpp, alg/gdal_rpc.cpp analogs)."""

import numpy as np
import pytest

from gdal_ray.geo.gcp import GCPPolynomial, RPCTransformer, ThinPlateSpline


def _affine_gcps(n=12, seed=0):
    rng = np.random.RandomState(seed)
    px = rng.uniform(0, 1000, n)
    py = rng.uniform(0, 800, n)
    # true affine: x = 100 + 0.5 px - 0.1 py ; y = 40 - 0.05 px - 0.4 py
    x = 100 + 0.5 * px - 0.1 * py
    y = 40 - 0.05 * px - 0.4 * py
    return np.column_stack([px, py, x, y]), (px, py, x, y)


def test_gcp_polynomial_order1_recovers_affine_exactly():
    gcps, (px, py, x, y) = _affine_gcps()
    tr = GCPPolynomial(gcps, order=1)
    fx, fy = tr.forward(px, py)
    assert np.abs(fx - x).max() < 1e-9 and np.abs(fy - y).max() < 1e-9
    ix, iy = tr.inverse(x, y)
    assert np.abs(ix - px).max() < 1e-8 and np.abs(iy - py).max() < 1e-8
    assert tr.residuals(gcps).max() < 1e-9


def test_gcp_polynomial_order2_recovers_quadratic():
    rng = np.random.RandomState(1)
    px = rng.uniform(0, 100, 20)
    py = rng.uniform(0, 100, 20)
    x = 5 + px + 0.01 * px * py
    y = py - 0.002 * px * px
    tr = GCPPolynomial(np.column_stack([px, py, x, y]), order=2)
    fx, fy = tr.forward(px, py)
    assert np.abs(fx - x).max() < 1e-8 and np.abs(fy - y).max() < 1e-8


def test_gcp_polynomial_min_points():
    with pytest.raises(ValueError, match="order 3 needs"):
        GCPPolynomial(np.zeros((5, 4)), order=3)


def test_tps_interpolates_gcps_exactly_and_bends():
    rng = np.random.RandomState(2)
    px = rng.uniform(0, 10, 15)
    py = rng.uniform(0, 10, 15)
    # warped target with a non-polynomial bump
    x = px + np.sin(py)
    y = py + 0.3 * np.cos(px)
    gcps = np.column_stack([px, py, x, y])
    tps = ThinPlateSpline(gcps)
    fx, fy = tps.forward(px, py)
    # TPS passes through every control point exactly
    assert np.abs(fx - x).max() < 1e-8 and np.abs(fy - y).max() < 1e-8
    # in-hull interpolation stays close to the smooth truth
    qx, qy = np.array([5.0]), np.array([5.0])
    gx, gy = tps.forward(qx, qy)
    assert abs(gx[0] - (5 + np.sin(5))) < 0.1
    assert abs(gy[0] - (5 + 0.3 * np.cos(5))) < 0.1


def test_rpc_affine_embedding_and_newton_inverse():
    """An RPC whose numerators are affine and denominators 1 reduces to an
    exact affine camera — forward must match analytic, inverse must invert
    to <1e-9 normalized units."""
    num_l = np.zeros(20)
    num_l[0], num_l[1], num_l[2] = 0.02, 0.3, -1.1   # 1, L, P terms
    den = np.zeros(20)
    den[0] = 1.0
    num_s = np.zeros(20)
    num_s[0], num_s[1], num_s[2] = -0.01, 1.2, 0.25
    rpc = RPCTransformer(
        line_off=5000, samp_off=4000, lat_off=45.0, lon_off=10.0,
        height_off=500, line_scale=5000, samp_scale=4000, lat_scale=0.5,
        lon_scale=0.5, height_scale=500,
        line_num_coeff=num_l, line_den_coeff=den,
        samp_num_coeff=num_s, samp_den_coeff=den)
    lon = np.array([10.1, 9.8, 10.3])
    lat = np.array([45.2, 44.9, 45.05])
    col, row = rpc.forward(lon, lat)
    L = (lon - 10.0) / 0.5
    P = (lat - 45.0) / 0.5
    assert np.abs(row - ((0.02 + 0.3 * L - 1.1 * P) * 5000 + 5000)).max() < 1e-9
    assert np.abs(col - ((-0.01 + 1.2 * L + 0.25 * P) * 4000 + 4000)).max() < 1e-9
    ilon, ilat = rpc.inverse(col, row)
    assert np.abs(ilon - lon).max() < 1e-9
    assert np.abs(ilat - lat).max() < 1e-9


def test_rpc_nonlinear_inverse_converges():
    rng = np.random.RandomState(4)
    num_l = rng.uniform(-0.01, 0.01, 20)
    num_l[1], num_l[2] = 0.9, -0.15   # dominant linear part keeps it invertible
    num_s = rng.uniform(-0.01, 0.01, 20)
    num_s[1], num_s[2] = 0.2, 1.05
    den = np.zeros(20)
    den[0] = 1.0
    den[1], den[2] = 0.001, -0.002
    rpc = RPCTransformer(
        line_off=1000, samp_off=1000, lat_off=0.0, lon_off=0.0,
        height_off=0, line_scale=1000, samp_scale=1000, lat_scale=1.0,
        lon_scale=1.0, height_scale=100,
        line_num_coeff=num_l, line_den_coeff=den,
        samp_num_coeff=num_s, samp_den_coeff=den)
    lon = np.array([0.2, -0.3, 0.45])
    lat = np.array([-0.1, 0.25, 0.4])
    col, row = rpc.forward(lon, lat)
    ilon, ilat = rpc.inverse(col, row)
    assert np.abs(ilon - lon).max() < 1e-8
    assert np.abs(ilat - lat).max() < 1e-8


def test_gcp_transformer_drives_warp(tmp_path):
    """A GCPPolynomial plugs into warp_tiles_to_crs as the transformer
    (the composable-transformer-chain surface, alg/gdaltransformer.cpp)."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo import webmercator as wm
    from gdal_ray.stages.raster import TILE, warp_tiles_to_crs
    from gdal_ray.util import to_arrow

    zoom = 3
    rows = []
    for tx in range(4, 6):
        for ty in range(2, 4):
            gx = tx * TILE + np.arange(TILE) + 0.5
            gy = ty * TILE + np.arange(TILE) + 0.5
            GX, GY = np.meshgrid(gx, gy)
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": (GX + GY).astype(np.float64).tobytes()})
    tiles = rd.from_pandas(pd.DataFrame(rows))
    # GCPs define lon/lat -> fake projected meters (affine)
    lon = np.array([0.0, 40.0, 0.0, 40.0, 20.0, 10.0])
    lat = np.array([20.0, 20.0, 50.0, 50.0, 35.0, 42.0])
    X = 1000.0 + lon * 10.0
    Y = 2000.0 + lat * 10.0
    tr = GCPPolynomial(np.column_stack([lon, lat, X, Y]), order=1)
    out = to_arrow(warp_tiles_to_crs(
        tiles, zoom, tr, extent=(1000.0, 2150.0, 1450.0, 2550.0),
        out_cell=5.0, method="bilinear", dtype=np.float64, out_block=32))
    assert out.num_rows > 0


def test_geolocation_transformer_roundtrip():
    """Geoloc arrays from a warped analytic mapping: forward matches the
    analytic field where bilinear is exact-ish (smooth), inverse recovers
    pixel coords < 0.01 px."""
    from gdal_ray.geo.gcp import GeolocationTransformer

    h, w = 120, 160
    rr, cc = np.meshgrid(np.arange(h, dtype=float), np.arange(w, dtype=float),
                         indexing="ij")
    lon = 10.0 + 0.01 * cc + 0.002 * rr + 0.3 * np.sin(rr / 40.0)
    lat = 45.0 - 0.008 * rr + 0.001 * cc + 0.2 * np.cos(cc / 50.0)
    tr = GeolocationTransformer(lon, lat)
    rng = np.random.RandomState(6)
    px = rng.uniform(2, w - 3, 200)
    py = rng.uniform(2, h - 3, 200)
    flon, flat = tr.forward(px, py)
    # forward = bilinear of the arrays; inverse must return the input
    ipx, ipy = tr.inverse(flon, flat)
    assert np.abs(ipx - px).max() < 0.01, np.abs(ipx - px).max()
    assert np.abs(ipy - py).max() < 0.01, np.abs(ipy - py).max()


def test_geolocation_with_offsets_and_steps():
    """Decimated geoloc arrays (GEOLOCATION PIXEL_STEP/LINE_STEP > 1)."""
    from gdal_ray.geo.gcp import GeolocationTransformer

    h, w = 30, 40
    rr, cc = np.meshgrid(np.arange(h) * 4.0, np.arange(w) * 4.0, indexing="ij")
    lon = cc * 0.01
    lat = rr * -0.01
    tr = GeolocationTransformer(lon, lat, pixel_step=4.0, line_step=4.0)
    flon, flat = tr.forward(np.array([40.0]), np.array([20.0]))
    assert abs(flon[0] - 0.40) < 1e-9 and abs(flat[0] + 0.20) < 1e-9
    ipx, ipy = tr.inverse(np.array([0.40]), np.array([-0.20]))
    assert abs(ipx[0] - 40.0) < 1e-6 and abs(ipy[0] - 20.0) < 1e-6


def test_homography_roundtrip_and_exact_corners():
    """alg/gdal_homography.cpp:77 — DLT fit to 4 corner GCPs maps them
    exactly and inverse(forward(p)) round-trips to < 1e-9 everywhere."""
    from gdal_ray.geo.gcp import Homography

    # a genuinely projective quad (not affine): unit square -> trapezoid
    src = np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0]])
    dst = np.array([[10.0, 20.0], [210.0, 10.0], [180.0, 150.0], [40.0, 120.0]])
    tr = Homography(np.column_stack([src, dst]))
    fx, fy = tr.forward(src[:, 0], src[:, 1])
    assert np.allclose(np.column_stack([fx, fy]), dst, atol=1e-9)
    assert tr.residuals(np.column_stack([src, dst])).max() < 1e-9
    rng = np.random.RandomState(5)
    px = rng.uniform(0, 100, 500)
    py = rng.uniform(0, 100, 500)
    X, Y = tr.forward(px, py)
    bx, by = tr.inverse(X, Y)
    assert np.hypot(bx - px, by - py).max() < 1e-9


def test_homography_overdetermined_recovers_projective_field():
    """With > 4 GCPs sampled from a true projective map the LSQ fit
    recovers it to machine precision (and a pure affine map reduces to
    the order-1 polynomial answer)."""
    from gdal_ray.geo.gcp import GCPPolynomial, Homography

    H = np.array([[1.2, 0.1, 5.0], [-0.2, 0.9, 3.0], [0.001, 0.0005, 1.0]])

    def proj(x, y):
        w = H[2, 0] * x + H[2, 1] * y + 1.0
        return ((H[0, 0] * x + H[0, 1] * y + H[0, 2]) / w,
                (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / w)

    rng = np.random.RandomState(11)
    px = rng.uniform(0, 50, 25)
    py = rng.uniform(0, 50, 25)
    X, Y = proj(px, py)
    tr = Homography(np.column_stack([px, py, X, Y]))
    qx = rng.uniform(0, 50, 200)
    qy = rng.uniform(0, 50, 200)
    ex, ey = proj(qx, qy)
    gx, gy = tr.forward(qx, qy)
    assert np.hypot(gx - ex, gy - ey).max() < 1e-9

    # affine GCPs: homography degenerates to the affine (= order-1 poly)
    lon = np.array([0.0, 40.0, 0.0, 40.0, 20.0, 10.0])
    lat = np.array([20.0, 20.0, 50.0, 50.0, 35.0, 42.0])
    Xa, Ya = 1000.0 + lon * 10.0, 2000.0 + lat * 10.0
    g = np.column_stack([lon, lat, Xa, Ya])
    th = Homography(g)
    tp = GCPPolynomial(g, order=1)
    hx, hy = th.forward(lon, lat)
    ppx, ppy = tp.forward(lon, lat)
    assert np.allclose(hx, ppx, atol=1e-8) and np.allclose(hy, ppy, atol=1e-8)


def test_homography_drives_warp_equal_to_analytic(tmp_path):
    """warp_tiles_to_crs with a fitted Homography produces byte-identical
    blocks to the same warp driven by the analytic projective transformer
    it was fitted from."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo.gcp import Homography
    from gdal_ray.stages.raster import TILE, warp_tiles_to_crs
    from gdal_ray.util import to_arrow

    zoom = 3
    rows = []
    for tx in range(4, 6):
        for ty in range(2, 4):
            gx = tx * TILE + np.arange(TILE) + 0.5
            gy = ty * TILE + np.arange(TILE) + 0.5
            GX, GY = np.meshgrid(gx, gy)
            rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                         "data": (GX + 2.0 * GY).astype(np.float64).tobytes()})
    H = np.array([[12.0, 1.0, 1000.0], [-1.0, 11.0, 2000.0],
                  [0.0002, 0.0001, 1.0]])

    class Analytic:
        def forward(self, x, y):
            return Homography._apply(H, x, y)

        def inverse(self, x, y):
            return Homography._apply(np.linalg.inv(H), x, y)

    lon = np.array([0.0, 40.0, 0.0, 40.0])
    lat = np.array([20.0, 20.0, 50.0, 50.0])
    X, Y = Analytic().forward(lon, lat)
    fitted = Homography(np.column_stack([lon, lat, X, Y]))
    assert np.allclose(fitted.H, H, rtol=1e-9)

    extent = (1000.0, 2150.0, 1450.0, 2550.0)
    outs = []
    for tr in (Analytic(), fitted):
        tiles = rd.from_pandas(pd.DataFrame(rows))
        t = to_arrow(warp_tiles_to_crs(
            tiles, zoom, tr, extent=extent, out_cell=5.0,
            method="cubic", dtype=np.float64, out_block=32)).to_pandas()
        outs.append(t.sort_values(["block_x", "block_y"]).reset_index(drop=True))
    a, b = outs
    assert len(a) == len(b) and len(a) > 0
    # the DLT fit recovers H to ~1e-12 relative, so blocks agree to float
    # noise (not bit-exact: the last interpolation bits differ)
    for i in range(len(a)):
        va = np.frombuffer(a["data"].iloc[i], np.float64)
        vb = np.frombuffer(b["data"].iloc[i], np.float64)
        assert np.allclose(va, vb, atol=1e-6, equal_nan=True)
