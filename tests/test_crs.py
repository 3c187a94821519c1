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
    with pytest.raises(ValueError, match="not in the analytic family"):
        epsg_transformer(4326 + 100000)
    with pytest.raises(ValueError):
        utm_zone_transformer(0)
