"""Coordinate reference system transforms from scratch (no PROJ in the
sandbox) — the analytically implementable family the reference reaches via
PROJ (ogr/ogrct.cpp:847 batch Transform(nCount, x[], y[])).

Implemented, all vectorized numpy over coordinate arrays:

* WGS84 <-> UTM zones 1-60 N/S (EPSG:326xx / 327xx): ellipsoidal
  transverse Mercator via the Krueger series in the conformal-latitude
  formulation (Karney 2011, public), accurate to nanometers within a zone
  — validated in tests against an INDEPENDENT Snyder-series implementation
  and against analytic invariants (central-meridian easting, rectifying
  radius, k0 scale).
* WGS84 <-> Lambert azimuthal equal-area (ellipsoidal, authalic-latitude
  form; the EPSG:3035-style family) — Snyder 1987 ch. 24.
* EPSG-code parsing for the supported family (epsg_transformer).

This is a deliberate plug-point: `Transformer` has the same
forward/inverse array signature a pyproj-backed actor stage would have, so
swapping PROJ in (where available) is a one-class change.
"""

from __future__ import annotations

import re

import numpy as np

# WGS84
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563


class TransverseMercator:
    """Ellipsoidal transverse Mercator (Krueger series, 4th order in
    n = f/(2-f); max error ~nm). k0/false easting/northing per UTM.
    lat0_deg is the latitude of natural origin (EPSG method 9807): the
    meridian-arc distance to lat0 is subtracted from the raw northing, so
    e.g. EPSG:27700 (lat0=49N, FN=-100000) works directly."""

    def __init__(self, lon0_deg: float, *, k0: float = 0.9996,
                 false_e: float = 500000.0, false_n: float = 0.0,
                 a: float = A_WGS84, f: float = F_WGS84,
                 lat0_deg: float = 0.0):
        self.lon0 = np.radians(lon0_deg)
        self.k0, self.fe, self.fn = k0, false_e, false_n
        n = f / (2.0 - f)
        self.n = n
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
        self.alpha = np.array([
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
            61 * n**3 / 240 - 103 * n**4 / 140,
            49561 * n**4 / 161280,
        ])
        self.beta = np.array([
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
            17 * n**3 / 480 - 37 * n**4 / 840,
            4397 * n**4 / 161280,
        ])
        self.delta = np.array([
            2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45,
            7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45,
            56 * n**3 / 15 - 136 * n**4 / 35,
            4279 * n**4 / 630,
        ])
        self.e2s = 2 * np.sqrt(n) / (1 + n)
        # meridian-arc offset for a non-equatorial natural origin: raw
        # northing at (lon0, lat0) is k0 * A * xi_s(lat0), folded into fn
        self._n0 = 0.0
        if lat0_deg != 0.0:
            _, n_raw = self.forward(np.array([lon0_deg]), np.array([lat0_deg]))
            self._n0 = float(n_raw[0]) - self.fn

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, np.float64)) - self.lon0
        phi = np.radians(np.asarray(lat_deg, np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e2s * np.arctanh(self.e2s * s))
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
        xi_s, eta_s = xi.copy(), eta.copy()
        for j in range(1, 5):
            aj = self.alpha[j - 1]
            xi_s += aj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_s += aj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        e = self.fe + self.k0 * self.A * eta_s
        nn = self.fn - self._n0 + self.k0 * self.A * xi_s
        return e, nn

    def inverse(self, e: np.ndarray, n: np.ndarray):
        xi = (np.asarray(n, np.float64) - self.fn + self._n0) / (self.k0 * self.A)
        eta = (np.asarray(e, np.float64) - self.fe) / (self.k0 * self.A)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j in range(1, 5):
            bj = self.beta[j - 1]
            xi_p -= bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        phi = chi.copy()
        for j in range(1, 5):
            phi += self.delta[j - 1] * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.degrees(lam + self.lon0), np.degrees(phi)


class LambertAzimuthalEqualArea:
    """Ellipsoidal LAEA (Snyder 1987 ch. 24, authalic-latitude form) —
    the EPSG:3035 family: laea(lon0=10, lat0=52, fe=4321000, fn=3210000)."""

    def __init__(self, lon0_deg: float, lat0_deg: float, *,
                 false_e: float = 0.0, false_n: float = 0.0,
                 a: float = A_WGS84, f: float = F_WGS84):
        self.a, self.fe, self.fn = a, false_e, false_n
        self.lon0 = np.radians(lon0_deg)
        e2 = f * (2 - f)
        self.e = np.sqrt(e2)
        self.e2 = e2
        self.qp = self._q(np.array([np.pi / 2]))[0]
        self.Rq = a * np.sqrt(self.qp / 2.0)
        phi0 = np.radians(lat0_deg)
        q0 = self._q(np.array([phi0]))[0]
        self.beta0 = np.arcsin(q0 / self.qp)
        self.D = a * np.cos(phi0) / (
            np.sqrt(1 - e2 * np.sin(phi0) ** 2) * self.Rq * np.cos(self.beta0))

    def _q(self, phi: np.ndarray) -> np.ndarray:
        s = np.sin(phi)
        e = self.e
        return (1 - self.e2) * (s / (1 - self.e2 * s * s)
                                - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, np.float64)) - self.lon0
        phi = np.radians(np.asarray(lat_deg, np.float64))
        q = self._q(phi)
        beta = np.arcsin(np.clip(q / self.qp, -1, 1))
        b0 = self.beta0
        B = self.Rq * np.sqrt(
            2.0 / (1 + np.sin(b0) * np.sin(beta)
                   + np.cos(b0) * np.cos(beta) * np.cos(lam)))
        x = self.fe + B * self.D * np.cos(beta) * np.sin(lam)
        y = self.fn + (B / self.D) * (np.cos(b0) * np.sin(beta)
                                      - np.sin(b0) * np.cos(beta) * np.cos(lam))
        return x, y

    def inverse(self, x: np.ndarray, y: np.ndarray):
        xr = (np.asarray(x, np.float64) - self.fe) / self.D
        yr = (np.asarray(y, np.float64) - self.fn) * self.D
        rho = np.hypot(xr, yr)
        ce = 2 * np.arcsin(np.clip(rho / (2 * self.Rq), -1, 1))
        b0 = self.beta0
        with np.errstate(invalid="ignore", divide="ignore"):
            beta = np.where(
                rho == 0, b0,
                np.arcsin(np.clip(np.cos(ce) * np.sin(b0)
                                  + yr * np.sin(ce) * np.cos(b0) / np.where(rho == 0, 1, rho), -1, 1)))
            lam = np.arctan2(
                xr * np.sin(ce),
                rho * np.cos(b0) * np.cos(ce) - yr * np.sin(b0) * np.sin(ce))
        # authalic -> geodetic latitude (Snyder 3-term series)
        e2 = self.e2
        phi = beta + (
            (e2 / 3 + 31 * e2**2 / 180 + 517 * e2**3 / 5040) * np.sin(2 * beta)
            + (23 * e2**2 / 360 + 251 * e2**3 / 3780) * np.sin(4 * beta)
            + (761 * e2**3 / 45360) * np.sin(6 * beta)
        )
        return np.degrees(lam + self.lon0), np.degrees(phi)


class LambertConformalConic2SP:
    """Ellipsoidal Lambert conformal conic, two standard parallels (EPSG
    method 9802; Snyder 1987 ch. 15 eq. 15-1..15-11). The EPSG:2154
    (RGF93 / Lambert-93) family: lcc(lat1=44, lat2=49, lat0=46.5, lon0=3,
    fe=700000, fn=6600000, GRS80)."""

    def __init__(self, lat1_deg: float, lat2_deg: float, lat0_deg: float,
                 lon0_deg: float, *, false_e: float = 0.0, false_n: float = 0.0,
                 a: float = A_WGS84, f: float = F_WGS84):
        self.a, self.fe, self.fn = a, false_e, false_n
        self.lon0 = np.radians(lon0_deg)
        e2 = f * (2 - f)
        self.e = np.sqrt(e2)
        p1, p2, p0 = (np.radians(v) for v in (lat1_deg, lat2_deg, lat0_deg))

        def m(phi):
            return np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2)

        def t(phi):
            es = self.e * np.sin(phi)
            return (np.tan(np.pi / 4 - phi / 2)
                    / ((1 - es) / (1 + es)) ** (self.e / 2))

        m1, m2 = m(p1), m(p2)
        t1, t2, t0 = t(p1), t(p2), t(p0)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = a * self.F * t0 ** self.n
        self._t = t

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, np.float64)) - self.lon0
        phi = np.radians(np.asarray(lat_deg, np.float64))
        rho = self.a * self.F * self._t(phi) ** self.n
        th = self.n * lam
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x: np.ndarray, y: np.ndarray):
        xp = np.asarray(x, np.float64) - self.fe
        yp = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        sign = np.sign(self.n) or 1.0
        rho = sign * np.hypot(xp, yp)
        tp = (rho / (self.a * self.F)) ** (1.0 / self.n)
        th = np.arctan2(sign * xp, sign * yp)
        lam = th / self.n + self.lon0
        phi = np.pi / 2 - 2 * np.arctan(tp)
        for _ in range(8):  # converges quadratically; 8 its -> <1e-12 rad
            es = self.e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                tp * ((1 - es) / (1 + es)) ** (self.e / 2))
        return np.degrees(lam), np.degrees(phi)


class AlbersEqualArea:
    """Ellipsoidal Albers equal-area conic, two standard parallels (EPSG
    method 9822; Snyder 1987 ch. 14). Used for e.g. EPSG:5070 (NAD83 /
    Conus Albers — supply the GRS80 ellipsoid)."""

    def __init__(self, lat1_deg: float, lat2_deg: float, lat0_deg: float,
                 lon0_deg: float, *, false_e: float = 0.0, false_n: float = 0.0,
                 a: float = A_WGS84, f: float = F_WGS84):
        self.a, self.fe, self.fn = a, false_e, false_n
        self.lon0 = np.radians(lon0_deg)
        e2 = f * (2 - f)
        self.e, self.e2 = np.sqrt(e2), e2
        p1, p2, p0 = (np.radians(v) for v in (lat1_deg, lat2_deg, lat0_deg))

        def m(phi):
            return np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2)

        q1, q2, q0 = (self._q(np.array([p]))[0] for p in (p1, p2, p0))
        m1, m2 = m(p1), m(p2)
        self.n = (m1 ** 2 - m2 ** 2) / (q2 - q1)
        self.C = m1 ** 2 + self.n * q1
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n

    def _q(self, phi: np.ndarray) -> np.ndarray:
        s = np.sin(phi)
        e = self.e
        return (1 - self.e2) * (s / (1 - self.e2 * s * s)
                                - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, np.float64)) - self.lon0
        phi = np.radians(np.asarray(lat_deg, np.float64))
        q = self._q(phi)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * lam
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x: np.ndarray, y: np.ndarray):
        xp = np.asarray(x, np.float64) - self.fe
        yp = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.hypot(xp, yp)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        qp = self._q(np.array([np.pi / 2]))[0]
        beta = np.arcsin(np.clip(q / qp, -1, 1))
        e2 = self.e2
        phi = beta + (
            (e2 / 3 + 31 * e2**2 / 180 + 517 * e2**3 / 5040) * np.sin(2 * beta)
            + (23 * e2**2 / 360 + 251 * e2**3 / 3780) * np.sin(4 * beta)
            + (761 * e2**3 / 45360) * np.sin(6 * beta)
        )
        # Newton refinement on q(phi) = q (Snyder eq. 3-16): the 3-term
        # series alone truncates at ~1e-8 deg; two steps reach float64
        e = self.e
        for _ in range(2):
            s = np.sin(phi)
            phi = phi + (1 - e2 * s * s) ** 2 / (2 * np.cos(phi)) * (
                q / (1 - e2) - s / (1 - e2 * s * s)
                + np.log((1 - e * s) / (1 + e * s)) / (2 * e))
        lam = np.arctan2(xp, yp) / self.n + self.lon0
        return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# datum shifts: geodetic <-> geocentric + Helmert 7-parameter
# ---------------------------------------------------------------------------

# name -> (a, 1/f); public EPSG ellipsoid parameters
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "intl1924": (6378388.0, 297.0),
    "clarke1866": (6378206.4, 294.978698214),
}


def geodetic_to_geocentric(lon_deg, lat_deg, a: float, f: float, h=0.0):
    """lat/lon/(h) on an ellipsoid -> ECEF XYZ (EPSG method 9602)."""
    lam = np.radians(np.asarray(lon_deg, np.float64))
    phi = np.radians(np.asarray(lat_deg, np.float64))
    e2 = f * (2 - f)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    X = (nu + h) * np.cos(phi) * np.cos(lam)
    Y = (nu + h) * np.cos(phi) * np.sin(lam)
    Z = (nu * (1 - e2) + h) * np.sin(phi)
    return X, Y, Z


def geocentric_to_geodetic(X, Y, Z, a: float, f: float):
    """ECEF XYZ -> lat/lon (Bowring's method + 2 Newton refinements:
    <1e-11 deg for |h| < 10 km)."""
    X = np.asarray(X, np.float64)
    Y = np.asarray(Y, np.float64)
    Z = np.asarray(Z, np.float64)
    e2 = f * (2 - f)
    b = a * (1 - f)
    ep2 = e2 / (1 - e2)
    p = np.hypot(X, Y)
    th = np.arctan2(Z * a, p * b)
    phi = np.arctan2(Z + ep2 * b * np.sin(th) ** 3,
                     p - e2 * a * np.cos(th) ** 3)
    for _ in range(3):
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        h = p / np.cos(phi) - nu
        phi = np.arctan2(Z, p * (1 - e2 * nu / (nu + h)))
    lam = np.arctan2(Y, X)
    return np.degrees(lam), np.degrees(phi)


class Helmert7:
    """Position-vector 7-parameter Helmert transform (EPSG method 1033 /
    9606): X' = (1+s)(X + rz*Y - ry*Z) + tx etc. Rotations in arc-seconds,
    scale in ppm (the EPSG publication convention). inverse() is the exact
    matrix inverse, not the sign-flip approximation."""

    def __init__(self, tx, ty, tz, rx_as, ry_as, rz_as, s_ppm):
        self.t = np.array([tx, ty, tz], np.float64)
        r = np.radians(np.array([rx_as, ry_as, rz_as], np.float64) / 3600.0)
        m = 1.0 + s_ppm * 1e-6
        rx, ry, rz = r
        self.M = m * np.array([
            [1.0, -rz, ry],
            [rz, 1.0, -rx],
            [-ry, rx, 1.0],
        ])
        self.Minv = np.linalg.inv(self.M)

    def apply(self, X, Y, Z):
        P = self.M @ np.vstack([X, Y, Z])
        return P[0] + self.t[0], P[1] + self.t[1], P[2] + self.t[2]

    def inverse(self, X, Y, Z):
        P = self.Minv @ np.vstack([X - self.t[0], Y - self.t[1], Z - self.t[2]])
        return P[0], P[1], P[2]


class DatumProjected:
    """Projected CRS on a non-WGS84 datum, exposed in the repo-wide
    WGS84-lon/lat Transformer contract: forward(wgs84 lon, lat) applies
    the (inverse) Helmert datum shift to the local geographic CRS, then
    projects; inverse() un-projects and shifts back to WGS84. This is the
    general path the reference reaches via PROJ pipelines
    (ogr/ogrct.cpp:621-1090) restated with the published EPSG Helmert
    parameters (meter-level accuracy, the method's published limit —
    grid-shift files like OSTN15 are out of sandbox scope, documented)."""

    def __init__(self, projection, helmert_to_wgs84: Helmert7 | None,
                 a: float, f: float):
        self.proj = projection
        self.h = helmert_to_wgs84
        self.a, self.f = a, f

    def forward(self, lon_deg, lat_deg):
        if self.h is not None:
            X, Y, Z = geodetic_to_geocentric(lon_deg, lat_deg, A_WGS84, F_WGS84)
            X, Y, Z = self.h.inverse(X, Y, Z)
            lon_deg, lat_deg = geocentric_to_geodetic(X, Y, Z, self.a, self.f)
        return self.proj.forward(lon_deg, lat_deg)

    def inverse(self, x, y):
        lon, lat = self.proj.inverse(x, y)
        if self.h is not None:
            X, Y, Z = geodetic_to_geocentric(lon, lat, self.a, self.f)
            X, Y, Z = self.h.apply(X, Y, Z)
            lon, lat = geocentric_to_geodetic(X, Y, Z, A_WGS84, F_WGS84)
        return lon, lat

    # project/unproject in the LOCAL datum's geographic coordinates
    # (what the EPSG worked examples publish)
    def forward_local(self, lon_deg, lat_deg):
        return self.proj.forward(lon_deg, lat_deg)

    def inverse_local(self, x, y):
        return self.proj.inverse(x, y)


def epsg_27700() -> DatumProjected:
    """OSGB36 / British National Grid: TM on Airy 1830, lat0=49N,
    lon0=2W, k0=0.9996012717, FE=400000, FN=-100000; OSGB36->WGS84
    Helmert (EPSG:1314 position-vector parameters)."""
    a, inv_f = ELLIPSOIDS["airy"]
    proj = TransverseMercator(
        -2.0, k0=0.9996012717, false_e=400000.0, false_n=-100000.0,
        a=a, f=1.0 / inv_f, lat0_deg=49.0)
    h = Helmert7(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
    return DatumProjected(proj, h, a, 1.0 / inv_f)


def epsg_2154() -> DatumProjected:
    """RGF93 / Lambert-93: LCC-2SP on GRS80 (RGF93 is WGS84-equivalent at
    the Helmert level — null shift)."""
    a, inv_f = ELLIPSOIDS["GRS80"]
    proj = LambertConformalConic2SP(
        44.0, 49.0, 46.5, 3.0, false_e=700000.0, false_n=6600000.0,
        a=a, f=1.0 / inv_f)
    return DatumProjected(proj, None, a, 1.0 / inv_f)


def utm_zone_transformer(zone: int, north: bool = True) -> TransverseMercator:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1-60")
    return TransverseMercator(zone * 6 - 183, false_n=0.0 if north else 10000000.0)


def epsg_transformer(code: int | str):
    """Transformer for the supported EPSG family: 326xx/327xx (UTM N/S),
    3035 (Europe LAEA). Raises for anything else (the documented PROJ
    plug-point)."""
    m = re.match(r"(?:EPSG:)?(\d+)$", str(code))
    if not m:
        raise ValueError(f"bad EPSG code {code!r}")
    c = int(m.group(1))
    if 32601 <= c <= 32660:
        return utm_zone_transformer(c - 32600, north=True)
    if 32701 <= c <= 32760:
        return utm_zone_transformer(c - 32700, north=False)
    if c == 3035:
        return LambertAzimuthalEqualArea(10.0, 52.0, false_e=4321000.0, false_n=3210000.0)
    if c == 27700:
        return epsg_27700()
    if c == 2154:
        return epsg_2154()
    if c == 5070:  # NAD83 / Conus Albers (NAD83 ~ WGS84 at Helmert level)
        a, inv_f = ELLIPSOIDS["GRS80"]
        return AlbersEqualArea(29.5, 45.5, 23.0, -96.0, false_e=0.0,
                               false_n=0.0, a=a, f=1.0 / inv_f)
    raise ValueError(
        f"EPSG:{c} not in the implemented family (UTM 326xx/327xx, LAEA "
        "3035, TM 27700, LCC 2154, AEA 5070 — or build TransverseMercator/"
        "LambertConformalConic2SP/AlbersEqualArea/DatumProjected with "
        "explicit parameters); plug a PROJ-backed Transformer here for "
        "datum-grid-shift accuracy"
    )
