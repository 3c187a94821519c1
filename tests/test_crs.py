"""CRS transforms: Krueger-series UTM validated against an INDEPENDENT
Snyder-series implementation + analytic invariants; LAEA validated by the
equal-area property and projection-center definition."""

import numpy as np
import pytest

from gdal_ray.geo.crs import (
    A_WGS84,
    F_WGS84,
    LambertAzimuthalEqualArea,
    TransverseMercator,
    epsg_transformer,
    utm_zone_transformer,
)


def snyder_utm_forward(lon_deg, lat_deg, zone):
    """Independent check implementation: Snyder 1987 eq. 8-9..8-17 series
    (different derivation, eccentricity powers instead of n-series)."""
    a, f = A_WGS84, F_WGS84
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lon0 = np.radians(zone * 6 - 183)
    lam = np.radians(np.asarray(lon_deg, float))
    phi = np.radians(np.asarray(lat_deg, float))
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A_ = (lam - lon0) * np.cos(phi)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    E = 500000.0 + k0 * N * (
        A_ + (1 - T + C) * A_**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A_**5 / 120
    )
    Nn = k0 * (
        M + N * np.tan(phi) * (
            A_**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A_**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A_**6 / 720
        )
    )
    return E, Nn


def test_utm_matches_independent_snyder_series():
    rng = np.random.RandomState(7)
    for zone in (1, 17, 31, 33, 60):
        lon0 = zone * 6 - 183
        lon = lon0 + rng.uniform(-2.8, 2.8, 200)
        lat = rng.uniform(0.5, 83.0, 200)
        tm = utm_zone_transformer(zone)
        e1, n1 = tm.forward(lon, lat)
        e2, n2 = snyder_utm_forward(lon, lat, zone)
        # two independent derivations must agree to the Snyder truncation
        # level (~mm within a zone)
        assert np.abs(e1 - e2).max() < 2e-3
        assert np.abs(n1 - n2).max() < 2e-3


def test_utm_invariants():
    tm = utm_zone_transformer(31)  # lon0 = 3
    # central meridian -> easting exactly 500000
    e, n = tm.forward(np.array([3.0, 3.0]), np.array([0.0, 45.0]))
    assert np.allclose(e, 500000.0, atol=1e-6)
    assert abs(n[0]) < 1e-6  # equator -> northing 0 (northern hemisphere)
    # rectifying radius: the well-known WGS84 constant 6367449.1458 m
    assert abs(tm.A - 6367449.145823) < 1e-3
    # scale factor on the central meridian is k0 = 0.9996
    lat = np.array([40.0])
    _, n1 = tm.forward(np.array([3.0]), lat)
    _, n2 = tm.forward(np.array([3.0]), lat + 1e-6)
    dn = (n2 - n1)[0]
    # geodesic meridian arc for dphi: M(phi) * dphi
    e2_ = F_WGS84 * (2 - F_WGS84)
    M = A_WGS84 * (1 - e2_) / (1 - e2_ * np.sin(np.radians(40.0)) ** 2) ** 1.5
    assert abs(dn / (M * np.radians(1e-6)) - 0.9996) < 1e-6


def test_utm_roundtrip_and_south():
    rng = np.random.RandomState(3)
    lon = rng.uniform(0.2, 5.8, 500)
    lat = rng.uniform(-80, 84, 500)
    north = lat >= 0
    for hemi, tr in ((True, utm_zone_transformer(31, north=True)),
                     (False, utm_zone_transformer(31, north=False))):
        sel = north if hemi else ~north
        e, n = tr.forward(lon[sel], lat[sel])
        lo, la = tr.inverse(e, n)
        assert np.abs(lo - lon[sel]).max() < 1e-9
        assert np.abs(la - lat[sel]).max() < 1e-9
        if not hemi:
            assert (n > 0).all()  # false northing keeps south positive


def test_laea_center_and_equal_area():
    laea = epsg_transformer("EPSG:3035")
    # projection center maps to the false origin BY DEFINITION
    x, y = laea.forward(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
    # equal-area property: |det J| == M * N * cos(phi) (ellipsoid area
    # element) at scattered points
    rng = np.random.RandomState(5)
    lon = rng.uniform(-10, 30, 50)
    lat = rng.uniform(35, 70, 50)
    d = 1e-6
    x0, y0 = laea.forward(lon, lat)
    xl, yl = laea.forward(lon + d, lat)
    xp, yp = laea.forward(lon, lat + d)
    det = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (np.radians(d) ** 2)
    e2_ = F_WGS84 * (2 - F_WGS84)
    s = np.sin(np.radians(lat))
    M = A_WGS84 * (1 - e2_) / (1 - e2_ * s * s) ** 1.5
    N = A_WGS84 / np.sqrt(1 - e2_ * s * s)
    expect = M * N * np.cos(np.radians(lat))
    assert np.abs(det / expect - 1.0).max() < 1e-5

    # round trip
    lo, la = laea.inverse(*laea.forward(lon, lat))
    assert np.abs(lo - lon).max() < 1e-7
    assert np.abs(la - lat).max() < 1e-7


def test_epsg_parsing():
    assert epsg_transformer(32617).fn == 0.0
    assert epsg_transformer("EPSG:32717").fn == 10000000.0
    with pytest.raises(ValueError, match="not in the implemented family"):
        epsg_transformer(4326 + 100000)
    with pytest.raises(ValueError):
        utm_zone_transformer(0)


# ---------------------------------------------------------------------------
# round 3: general CRS family — TM with natural origin + datum (27700),
# LCC-2SP (2154), Albers (5070), Helmert 7-parameter shifts
# ---------------------------------------------------------------------------


def test_epsg_27700_worked_example():
    """EPSG Guidance Note 7-2 worked example for the British National Grid
    (method 9807): OSGB36 lat 50d30'N, lon 0d30'E -> E 577274.98 m,
    N 69740.49 m (published to cm). Must match < 1 cm."""
    import numpy as np

    from gdal_ray.geo.crs import epsg_27700

    bng = epsg_27700()
    e, n = bng.forward_local(np.array([0.5]), np.array([50.5]))
    assert abs(e[0] - 577274.98) < 0.01
    assert abs(n[0] - 69740.49) < 0.01
    lon, lat = bng.inverse_local(e, n)
    assert abs(lon[0] - 0.5) < 1e-9 and abs(lat[0] - 50.5) < 1e-9


def test_epsg_27700_datum_shift_magnitude_and_roundtrip():
    """OSGB36<->WGS84 Helmert: the published datum separation in southern
    England is ~100-130 m horizontally; WGS84 roundtrip through the full
    chain (geocentric + Helmert + TM) must close < 1e-7 deg (~1 cm)."""
    import numpy as np

    from gdal_ray.geo.crs import epsg_27700

    bng = epsg_27700()
    lon = np.array([-0.1278])  # London
    lat = np.array([51.5074])
    e_wgs, n_wgs = bng.forward(lon, lat)       # WGS84 input (datum-shifted)
    e_loc, n_loc = bng.forward_local(lon, lat)  # same numbers read as OSGB36
    shift = float(np.hypot(e_wgs - e_loc, n_wgs - n_loc)[0])
    assert 50.0 < shift < 200.0, shift
    lon2, lat2 = bng.inverse(e_wgs, n_wgs)
    assert abs(lon2[0] - lon[0]) < 1e-7 and abs(lat2[0] - lat[0]) < 1e-7


def test_epsg_2154_lambert93():
    """Lambert-93 (LCC-2SP on GRS80): the natural origin maps exactly to
    (FE, FN); both standard parallels are true-scale (k=1 to 1e-9,
    finite-difference scale along meridian == along parallel: conformal);
    roundtrip closes."""
    import numpy as np

    from gdal_ray.geo.crs import epsg_2154

    l93 = epsg_2154()
    x0, y0 = l93.forward(np.array([3.0]), np.array([46.5]))
    assert abs(x0[0] - 700000.0) < 1e-6 and abs(y0[0] - 6600000.0) < 1e-6

    a, f = l93.a, l93.f
    e2 = f * (2 - f)
    for lat_sp in (44.0, 49.0):
        d = 1e-6  # degrees
        x1, y1 = l93.forward(np.array([3.0]), np.array([lat_sp - d / 2]))
        x2, y2 = l93.forward(np.array([3.0]), np.array([lat_sp + d / 2]))
        ground_m = np.radians(d) * a * (1 - e2) / (
            1 - e2 * np.sin(np.radians(lat_sp)) ** 2) ** 1.5
        k_meridian = float(np.hypot(x2 - x1, y2 - y1)[0]) / ground_m
        assert abs(k_meridian - 1.0) < 1e-6, (lat_sp, k_meridian)

    lon, lat = np.array([2.337229]), np.array([48.836449])
    x, y = l93.forward(lon, lat)
    lon2, lat2 = l93.inverse(x, y)
    assert abs(lon2[0] - lon[0]) < 1e-11 and abs(lat2[0] - lat[0]) < 1e-11


def test_albers_equal_area_property():
    """EPSG:5070 (Conus Albers): a small geodesic quad keeps its ellipsoidal
    area under projection (the defining property), and roundtrip closes."""
    import numpy as np

    from gdal_ray.geo.crs import ELLIPSOIDS, epsg_transformer

    aea = epsg_transformer(5070)
    a, inv_f = ELLIPSOIDS["GRS80"]
    f = 1.0 / inv_f
    e2 = f * (2 - f)
    lon0, lat0, dd = -98.0, 38.0, 0.01
    lons = np.array([lon0, lon0 + dd, lon0 + dd, lon0])
    lats = np.array([lat0, lat0, lat0 + dd, lat0 + dd])
    xs, ys = aea.forward(lons, lats)
    proj_area = 0.5 * abs(
        np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1)))
    phi = np.radians(lat0 + dd / 2)
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    true_area = np.radians(dd) ** 2 * M * N * np.cos(phi)
    assert abs(proj_area / true_area - 1.0) < 1e-6
    lon2, lat2 = aea.inverse(xs, ys)
    assert np.abs(lon2 - lons).max() < 1e-9
    assert np.abs(lat2 - lats).max() < 1e-9


def test_helmert_exact_inverse():
    import numpy as np

    from gdal_ray.geo.crs import Helmert7

    h = Helmert7(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
    X = np.array([3980000.0, 3875000.0])
    Y = np.array([-10000.0, 116000.0])
    Z = np.array([4970000.0, 5047000.0])
    X2, Y2, Z2 = h.inverse(*h.apply(X, Y, Z))
    assert np.abs(X2 - X).max() < 1e-8
    assert np.abs(Y2 - Y).max() < 1e-8
    assert np.abs(Z2 - Z).max() < 1e-8


def test_reproject_step_epsg_27700(tmp_path):
    """The `reproject` CLI/pipeline step accepts dst=27700 end-to-end."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from gdal_ray.geo import wkb as W
    from gdal_ray.pipelines.steps import STEPS
    from gdal_ray.util import to_arrow

    pts = [W.geom_to_wkb(("point", np.array([[-0.1278, 51.5074]])))]
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "geometry": pa.array(pts, pa.binary())})
    ds = rd.from_arrow(t)
    out = to_arrow(STEPS["reproject"](dst="27700")(ds))
    kind, coords = W.parse_wkb(out["geometry"][0].as_py())
    x, y = coords[0]
    # London in BNG: ~ (530000, 180000)
    assert 500000 < x < 560000 and 150000 < y < 210000, (x, y)
