"""Non-parametric georeferencing transformers, from scratch:

* GCPPolynomial — order 1/2/3 polynomial fit to ground control points
  (reference: alg/gdal_crs.cpp, itself the public GRASS i.rectify fit).
* ThinPlateSpline — exact TPS interpolation through the GCPs
  (reference: alg/thinplatespline.cpp; classic r^2 log r radial basis).
* RPCTransformer — the standard RPC00B rational polynomial camera model
  (reference: alg/gdal_rpc.cpp; the 20-coefficient cubic form is public,
  e.g. the NITF/STDI-0002 specification). Forward = (lon, lat, h) ->
  (pixel, line); inverse via damped Newton iteration like the reference.

All three expose the repo-wide Transformer contract — forward(x, y) /
inverse(x, y) over numpy arrays — so they drop into `reproject`,
`warp_tiles_to_crs` and any other stage that takes a transformer. The
polynomial/TPS inverse is a SECOND fit in the opposite direction
(exactly the reference's approach for polynomials; for TPS the reference
fits both directions too), so inverse(forward(x)) is approximate away
from GCPs — documented, matches GDAL.
"""

from __future__ import annotations

import numpy as np


def _poly_terms(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Design-matrix columns for a 2-D polynomial of the given order
    (1: [1,x,y]; 2: +[x^2,xy,y^2]; 3: +[x^3,x^2y,xy^2,y^3])."""
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * x, x * y, y * y]
    if order >= 3:
        cols += [x**3, x * x * y, x * y * y, y**3]
    return np.column_stack(cols)


class GCPPolynomial:
    """Least-squares polynomial transform fit to GCPs.

    gcps: array-like of (pixel, line, x, y) rows. order 1 needs >= 3
    points, order 2 >= 6, order 3 >= 10 (alg/gdal_crs.cpp enforces the
    same minima). forward: (pixel, line) -> (x, y); inverse fits the
    reverse polynomial."""

    def __init__(self, gcps, order: int = 1):
        g = np.asarray(gcps, np.float64)
        need = {1: 3, 2: 6, 3: 10}[order]
        if g.shape[0] < need:
            raise ValueError(f"order {order} needs >= {need} GCPs, got {g.shape[0]}")
        self.order = order
        A = _poly_terms(g[:, 0], g[:, 1], order)
        self.cx, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
        self.cy, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
        B = _poly_terms(g[:, 2], g[:, 3], order)
        self.ix, *_ = np.linalg.lstsq(B, g[:, 0], rcond=None)
        self.iy, *_ = np.linalg.lstsq(B, g[:, 1], rcond=None)

    def forward(self, px, py):
        A = _poly_terms(np.asarray(px, np.float64), np.asarray(py, np.float64),
                        self.order)
        return A @ self.cx, A @ self.cy

    def inverse(self, x, y):
        B = _poly_terms(np.asarray(x, np.float64), np.asarray(y, np.float64),
                        self.order)
        return B @ self.ix, B @ self.iy

    def residuals(self, gcps) -> np.ndarray:
        g = np.asarray(gcps, np.float64)
        fx, fy = self.forward(g[:, 0], g[:, 1])
        return np.hypot(fx - g[:, 2], fy - g[:, 3])


class Homography:
    """8-DOF projective transform fit to GCPs
    (reference: alg/gdal_homography.cpp:77 GDALCreateHomographyTransformer
    — the remaining member of the GDALGenImgProjTransform family after
    polynomial/TPS/RPC/geolocation).

    gcps: (pixel, line, x, y) rows, >= 4. Fit is the direct linear
    transform with h33 = 1 (least squares when overdetermined). forward:
    (px, py) -> ((h11 px + h12 py + h13) / w, (h21 px + h22 py + h23) / w)
    with w = h31 px + h32 py + 1. Unlike the polynomial/TPS reverse FIT,
    the inverse here is EXACT — the inverse 3x3 matrix is itself a
    homography."""

    def __init__(self, gcps):
        g = np.asarray(gcps, np.float64)
        if g.shape[0] < 4:
            raise ValueError(f"homography needs >= 4 GCPs, got {g.shape[0]}")
        px, py, x, y = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
        n = g.shape[0]
        A = np.zeros((2 * n, 8))
        b = np.empty(2 * n)
        A[0::2, 0] = px; A[0::2, 1] = py; A[0::2, 2] = 1.0
        A[0::2, 6] = -x * px; A[0::2, 7] = -x * py
        b[0::2] = x
        A[1::2, 3] = px; A[1::2, 4] = py; A[1::2, 5] = 1.0
        A[1::2, 6] = -y * px; A[1::2, 7] = -y * py
        b[1::2] = y
        h, *_ = np.linalg.lstsq(A, b, rcond=None)
        self.H = np.array([[h[0], h[1], h[2]],
                           [h[3], h[4], h[5]],
                           [h[6], h[7], 1.0]])
        self.Hinv = np.linalg.inv(self.H)

    @staticmethod
    def _apply(M: np.ndarray, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        w = M[2, 0] * x + M[2, 1] * y + M[2, 2]
        return ((M[0, 0] * x + M[0, 1] * y + M[0, 2]) / w,
                (M[1, 0] * x + M[1, 1] * y + M[1, 2]) / w)

    def forward(self, px, py):
        return self._apply(self.H, px, py)

    def inverse(self, x, y):
        return self._apply(self.Hinv, x, y)

    def residuals(self, gcps) -> np.ndarray:
        g = np.asarray(gcps, np.float64)
        fx, fy = self.forward(g[:, 0], g[:, 1])
        return np.hypot(fx - g[:, 2], fy - g[:, 3])


class ThinPlateSpline:
    """Exact thin-plate-spline transform through the GCPs
    (alg/thinplatespline.cpp): f(p) = a0 + a1 x + a2 y + sum w_i U(|p-p_i|)
    with U(r) = r^2 log r^2; solved with the standard bordered system.
    Both directions are fit so inverse() is a TPS too."""

    def __init__(self, gcps):
        g = np.asarray(gcps, np.float64)
        if g.shape[0] < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = self._solve(g[:, 0:2], g[:, 2:4])
        self._inv = self._solve(g[:, 2:4], g[:, 0:2])

    @staticmethod
    def _U(r2: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(r2 > 0, r2 * np.log(r2), 0.0)

    def _solve(self, src: np.ndarray, dst: np.ndarray):
        n = src.shape[0]
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        K = self._U(d2)
        P = np.column_stack([np.ones(n), src])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        sol = np.linalg.solve(A, rhs)
        return src, sol

    @staticmethod
    def _eval(model, x, y):
        src, sol = model
        p = np.column_stack([np.asarray(x, np.float64).ravel(),
                             np.asarray(y, np.float64).ravel()])
        d2 = ((p[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        U = ThinPlateSpline._U(d2)
        n = src.shape[0]
        out = (U @ sol[:n]
               + sol[n] + p[:, 0:1] * sol[n + 1] + p[:, 1:2] * sol[n + 2])
        return out[:, 0], out[:, 1]

    def forward(self, px, py):
        return self._eval(self._fwd, px, py)

    def inverse(self, x, y):
        return self._eval(self._inv, x, y)


class GeolocationTransformer:
    """Geolocation-array transformer (alg/gdalgeoloc.cpp): per-sample
    lon/lat arrays map pixel space to geographic space. forward =
    bilinear interpolation of the arrays at fractional pixel positions;
    inverse = coarse nearest-sample seed (decimated scan, the backmap
    analog) + damped Newton with finite-difference Jacobians.

    lon/lat arrays have shape (nlines, npixels); array sample (r, c)
    corresponds to pixel coordinates (pixel_offset + c*pixel_step,
    line_offset + r*line_step) — GDAL's GEOLOCATION metadata contract."""

    def __init__(self, lon: np.ndarray, lat: np.ndarray, *,
                 pixel_offset: float = 0.0, line_offset: float = 0.0,
                 pixel_step: float = 1.0, line_step: float = 1.0):
        self.lon = np.asarray(lon, np.float64)
        self.lat = np.asarray(lat, np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2:
            raise ValueError("lon/lat arrays must share one 2-D shape")
        self.po, self.lo = pixel_offset, line_offset
        self.ps, self.ls = pixel_step, line_step
        h, w = self.lon.shape
        dec = max(1, int(np.sqrt(h * w) // 64))
        self._seed_r = np.arange(0, h, dec)
        self._seed_c = np.arange(0, w, dec)
        self._seed_lon = self.lon[np.ix_(self._seed_r, self._seed_c)].ravel()
        self._seed_lat = self.lat[np.ix_(self._seed_r, self._seed_c)].ravel()
        rr, cc = np.meshgrid(self._seed_r, self._seed_c, indexing="ij")
        self._seed_rc = np.column_stack([rr.ravel(), cc.ravel()]).astype(np.float64)

    def _sample(self, arr, r, c):
        h, w = arr.shape
        r = np.clip(r, 0.0, h - 1.0)
        c = np.clip(c, 0.0, w - 1.0)
        r0 = np.clip(np.floor(r).astype(np.int64), 0, h - 2) if h > 1 else np.zeros_like(r, np.int64)
        c0 = np.clip(np.floor(c).astype(np.int64), 0, w - 2) if w > 1 else np.zeros_like(c, np.int64)
        fr = r - r0
        fc = c - c0
        return (arr[r0, c0] * (1 - fr) * (1 - fc)
                + arr[r0, c0 + 1] * (1 - fr) * fc
                + arr[r0 + 1, c0] * fr * (1 - fc)
                + arr[r0 + 1, c0 + 1] * fr * fc)

    def forward(self, px, py):
        c = (np.asarray(px, np.float64) - self.po) / self.ps
        r = (np.asarray(py, np.float64) - self.lo) / self.ls
        return self._sample(self.lon, r, c), self._sample(self.lat, r, c)

    def inverse(self, lon, lat, *, iters: int = 15):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        # seed: nearest decimated sample (vectorized blockwise to bound
        # the (nq, nseed) distance matrix)
        r = np.empty_like(lon)
        c = np.empty_like(lon)
        B = 4096
        for i in range(0, lon.size, B):
            d2 = ((lon[i:i + B, None] - self._seed_lon[None, :]) ** 2
                  + (lat[i:i + B, None] - self._seed_lat[None, :]) ** 2)
            k = np.argmin(d2, axis=1)
            r[i:i + B] = self._seed_rc[k, 0]
            c[i:i + B] = self._seed_rc[k, 1]
        eps = 0.5
        for _ in range(iters):
            lo0 = self._sample(self.lon, r, c)
            la0 = self._sample(self.lat, r, c)
            dlo_dc = (self._sample(self.lon, r, c + eps) - lo0) / eps
            dla_dc = (self._sample(self.lat, r, c + eps) - la0) / eps
            dlo_dr = (self._sample(self.lon, r + eps, c) - lo0) / eps
            dla_dr = (self._sample(self.lat, r + eps, c) - la0) / eps
            det = dlo_dc * dla_dr - dlo_dr * dla_dc
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            dlon = lon - lo0
            dlat = lat - la0
            c = c + (dla_dr * dlon - dlo_dr * dlat) / det
            r = r + (-dla_dc * dlon + dlo_dc * dlat) / det
            h, w = self.lon.shape
            r = np.clip(r, 0.0, h - 1.0)
            c = np.clip(c, 0.0, w - 1.0)
        return self.po + c * self.ps, self.lo + r * self.ls


class RPCTransformer:
    """RPC00B rational polynomial camera model (alg/gdal_rpc.cpp; the
    coefficient layout is the public NITF RPC00B order):

      rn = (lat - LAT_OFF)/LAT_SCALE, ln = (lon - LON_OFF)/LON_SCALE,
      hn = (h - HEIGHT_OFF)/HEIGHT_SCALE
      row = (P1(ln,rn,hn)/P2) * LINE_SCALE + LINE_OFF
      col = (P3(ln,rn,hn)/P4) * SAMP_SCALE + SAMP_OFF

    Each P is the standard 20-term cubic. forward: (lon, lat[, h]) ->
    (col, row) a.k.a. (pixel, line); inverse: damped Newton from the
    offset point using finite-difference Jacobians, like the reference's
    iterative inverse."""

    def __init__(self, *, line_off, samp_off, lat_off, lon_off, height_off,
                 line_scale, samp_scale, lat_scale, lon_scale, height_scale,
                 line_num_coeff, line_den_coeff, samp_num_coeff, samp_den_coeff):
        self.lo, self.so = line_off, samp_off
        self.lato, self.lono, self.ho = lat_off, lon_off, height_off
        self.ls, self.ss = line_scale, samp_scale
        self.lats, self.lons, self.hs = lat_scale, lon_scale, height_scale
        self.lnc = np.asarray(line_num_coeff, np.float64)
        self.ldc = np.asarray(line_den_coeff, np.float64)
        self.snc = np.asarray(samp_num_coeff, np.float64)
        self.sdc = np.asarray(samp_den_coeff, np.float64)
        for c in (self.lnc, self.ldc, self.snc, self.sdc):
            if c.size != 20:
                raise ValueError("RPC00B needs 20 coefficients per polynomial")

    @staticmethod
    def _terms(L, P, H):
        """The 20 RPC00B monomials, in specification order."""
        return np.stack([
            np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P,
            H * H, P * L * H, L**3, L * P * P, L * H * H, L * L * P, P**3,
            P * H * H, L * L * H, P * P * H, H**3,
        ])

    def forward(self, lon, lat, h=0.0):
        L = (np.asarray(lon, np.float64) - self.lono) / self.lons
        P = (np.asarray(lat, np.float64) - self.lato) / self.lats
        H = (np.asarray(h, np.float64) - self.ho) / self.hs
        H = np.broadcast_to(H, L.shape)
        T = self._terms(L, P, H)
        row = (self.lnc @ T) / (self.ldc @ T) * self.ls + self.lo
        col = (self.snc @ T) / (self.sdc @ T) * self.ss + self.so
        return col, row

    def inverse(self, col, row, h=0.0, *, iters: int = 12):
        col = np.asarray(col, np.float64)
        row = np.asarray(row, np.float64)
        lon = np.full_like(col, self.lono)
        lat = np.full_like(col, self.lato)
        eps_lon = self.lons * 1e-6
        eps_lat = self.lats * 1e-6
        for _ in range(iters):
            c0, r0 = self.forward(lon, lat, h)
            cx, rx = self.forward(lon + eps_lon, lat, h)
            cy, ry = self.forward(lon, lat + eps_lat, h)
            j00 = (cx - c0) / eps_lon
            j01 = (cy - c0) / eps_lat
            j10 = (rx - r0) / eps_lon
            j11 = (ry - r0) / eps_lat
            det = j00 * j11 - j01 * j10
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            dc = col - c0
            dr = row - r0
            lon = lon + (j11 * dc - j01 * dr) / det
            lat = lat + (-j10 * dc + j00 * dr) / det
        return lon, lat
