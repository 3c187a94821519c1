"""Rasterize (vector -> raster burn-in), replicating the reference's fill
semantics bit-for-bit.

Behavioral spec (re-implemented from scratch against the documented rules):
* polygons: scanline even-odd fill with the PIXEL-CENTER-INSIDE rule — a
  pixel burns iff its center (x+0.5, y+0.5) is inside the polygon
  (alg/llrasterize.cpp:31-58 GDALdllImageFilledPolygon, libgd-derived);
  intersections round via floor(x + 0.5), spans burn [x0, x1-1]; bottom
  horizontal edges fill separately; top horizontal edges are skipped.
* lines: integer Bresenham over floor(pixel) coords, burning every visited
  in-bounds pixel, end point included only for the final segment
  (alg/llrasterize.cpp:256-393 GDALdllImageLine).
* points: burn trunc(pixel) (llrasterize.cpp:233-251).
* burn values clamp to the target dtype (GDALCopyWords semantics: 256 -> 255
  and -1 -> 0 for uint8, per autotest/alg/rasterize.py:63-80).
* MERGE_ALG replace/add (alg/gdalrasterize.cpp options).

Geometry -> pixel via the affine geotransform inverse
(doc/source/user/raster_data_model.rst:50-53).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo import wkb as W


def geo_to_pixel(x: np.ndarray, y: np.ndarray, gt: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Invert the affine geotransform (general 6-term form)."""
    g0, g1, g2, g3, g4, g5 = gt
    det = g1 * g5 - g2 * g4
    px = (g5 * (x - g0) - g2 * (y - g3)) / det
    py = (-g4 * (x - g0) + g1 * (y - g3)) / det
    return px, py


def _fill_polygon(burn_mask: np.ndarray, rings_px: list[np.ndarray]) -> None:
    """Even-odd scanline fill of one polygon (rings in pixel coords) into a
    boolean mask. Vectorized over edges per scanline."""
    h, w = burn_mask.shape
    all_y = np.concatenate([r[:, 1] for r in rings_px])
    miny = int(max(0.0, all_y.min()))
    maxy = int(min(float(all_y.max()), h - 1))
    # build edge arrays (x1,y1)-(x2,y2), ring-closed
    ex1, ey1, ex2, ey2 = [], [], [], []
    for r in rings_px:
        a = r
        if not np.array_equal(a[0], a[-1]):
            a = np.vstack([a, a[:1]])
        ex1.append(a[:-1, 0]); ey1.append(a[:-1, 1])
        ex2.append(a[1:, 0]); ey2.append(a[1:, 1])
    ex1 = np.concatenate(ex1); ey1 = np.concatenate(ey1)
    ex2 = np.concatenate(ex2); ey2 = np.concatenate(ey2)
    lo_y = np.minimum(ey1, ey2)
    hi_y = np.maximum(ey1, ey2)
    lo_x = np.where(ey1 < ey2, ex1, ex2)
    hi_x = np.where(ey1 < ey2, ex2, ex1)
    horizontal = ey1 == ey2
    # bottom horizontal edges: x decreasing in ring order
    bottom_h = horizontal & (ex1 > ex2)

    for yrow in range(miny, maxy + 1):
        dy = yrow + 0.5
        sel = (~horizontal) & (dy >= lo_y) & (dy < hi_y)
        if sel.any():
            xint = (dy - lo_y[sel]) * (hi_x[sel] - lo_x[sel]) / (hi_y[sel] - lo_y[sel]) + lo_x[sel]
            xi = np.sort(np.floor(xint + 0.5).astype(np.int64))
            for i in range(0, xi.size - 1, 2):
                x0, x1 = xi[i], xi[i + 1] - 1
                if x0 <= w - 1 and x1 >= 0:
                    burn_mask[yrow, max(x0, 0) : min(x1, w - 1) + 1] = True
        hsel = bottom_h & (ey1 == dy)
        if hsel.any():
            for xa, xb in zip(ex2[hsel], ex1[hsel]):
                x0 = int(max(np.floor(xa + 0.5), 0))
                x1 = int(min(np.floor(xb + 0.5), w)) - 1
                if x0 <= w - 1 and x1 >= 0:
                    burn_mask[yrow, x0 : x1 + 1] = True


def _burn_line(burn_mask: np.ndarray, pts_px: np.ndarray) -> None:
    """Bresenham per segment; end point only on the final segment."""
    h, w = burn_mask.shape
    nseg = len(pts_px) - 1
    for j in range(nseg):
        x0, y0 = pts_px[j]
        x1, y1 = pts_px[j + 1]
        ix, iy = int(np.floor(x0)), int(np.floor(y0))
        ix1, iy1 = int(np.floor(x1)), int(np.floor(y1))
        dx_n, dy_n = abs(ix1 - ix), abs(iy1 - iy)
        sx = -1 if ix > ix1 else 1
        sy = -1 if iy > iy1 else 1
        last = j == nseg - 1
        if dx_n >= dy_n:
            xerr = dy_n << 1
            yerr = xerr - (dx_n << 1)
            err = xerr - dx_n
            steps = dx_n if last else dx_n - 1
            for _ in range(steps + 1):
                if 0 <= ix < w and 0 <= iy < h:
                    burn_mask[iy, ix] = True
                ix += sx
                if err > 0:
                    iy += sy
                    err += yerr
                else:
                    err += xerr
        else:
            xerr = dx_n << 1
            yerr = xerr - (dy_n << 1)
            err = xerr - dy_n
            steps = dy_n if last else dy_n - 1
            for _ in range(steps + 1):
                if 0 <= ix < w and 0 <= iy < h:
                    burn_mask[iy, ix] = True
                iy += sy
                if err > 0:
                    ix += sx
                    err += yerr
                else:
                    err += xerr


_EPS_INTERSECT = 1e-4  # llrasterize.cpp EPSILON_INTERSECT_ONLY


def _burn_line_all_touched(burn_mask: np.ndarray, pts_px: np.ndarray,
                           intersect_only: bool) -> None:
    """ALL_TOUCHED line walk (llrasterize.cpp:407-747
    GDALdllImageLineAllTouched): burn every pixel the segment passes
    through. intersect_only=True skips pixel-aligned horizontal/vertical
    edges (polygon-outline mode)."""
    h, w = burn_mask.shape

    def burn(iy, ix):
        if 0 <= iy < h and 0 <= ix < w:
            burn_mask[iy, ix] = True

    for j in range(len(pts_px) - 1):
        x0, y0 = float(pts_px[j][0]), float(pts_px[j][1])
        x1, y1 = float(pts_px[j + 1][0]), float(pts_px[j + 1][1])
        if (y0 < 0 and y1 < 0) or (y0 > h and y1 > h) or \
           (x0 < 0 and x1 < 0) or (x0 > w and x1 > w):
            continue
        if x0 > x1:
            x0, x1, y0, y1 = x1, x0, y1, y0
        if abs(x0 - x1) < 0.01:  # vertical
            if intersect_only and abs(x0 - round(x0)) < _EPS_INTERSECT \
               and abs(x1 - round(x1)) < _EPS_INTERSECT:
                continue
            if y1 < y0:
                y0, y1 = y1, y0
            ix = int(np.floor(x1))
            iy = int(np.floor(y0))
            iy_end = int(np.floor(y1 - _EPS_INTERSECT))
            if ix < 0 or ix >= w:
                continue
            iy = max(iy, 0)
            iy_end = min(iy_end, h - 1)
            for yy in range(iy, iy_end + 1):
                burn(yy, ix)
            continue
        if abs(y0 - y1) < 0.01:  # horizontal
            if intersect_only and abs(y0 - round(y0)) < _EPS_INTERSECT \
               and abs(y1 - round(y1)) < _EPS_INTERSECT:
                continue
            ix = int(np.floor(x0))
            iy = int(np.floor(y0))
            ix_end = int(np.floor(x1 - _EPS_INTERSECT))
            if iy < 0 or iy >= h:
                continue
            ix = max(ix, 0)
            ix_end = min(ix_end, w - 1)
            for xx in range(ix, ix_end + 1):
                burn(iy, xx)
            continue
        # general sloped case, stepped pixel by pixel
        slope = (y1 - y0) / (x1 - x0)
        if x1 > w:
            y1 -= (x1 - w) * slope
            x1 = float(w)
        if x0 < 0.0:
            y0 += (0.0 - x0) * slope
            x0 = 0.0
        if y1 > y0:
            if y0 < 0.0:
                x0 += (0.0 - y0) / slope
                y0 = 0.0
            if y1 >= h:
                x1 += (y1 - h) / slope
                x1 = min(x1, float(w))
        else:
            if y0 >= h:
                x0 += (h - y0) / slope
                y0 = float(h)
            if y1 < 0.0:
                x1 -= (y1 - 0.0) / slope
        x, y = x0, y0
        while x >= 0.0 and x < x1:
            ix = int(np.floor(x))
            iy = int(np.floor(y))
            burn(iy, ix)
            step_x = np.floor(x + 1.0) - x
            step_y = step_x * slope
            if int(np.floor(y + step_y)) == iy:
                x += step_x
                y += step_y
            elif slope < 0:
                step_y = min(iy - y, -1e-9)
                x += step_y / slope
                y += step_y
            else:
                step_y = max((iy + 1) - y, 1e-9)
                x += step_y / slope
                y += step_y


def _burn_line_z(out: np.ndarray, pts_px: np.ndarray, zs: np.ndarray,
                 burn: float) -> None:
    """Bresenham with linear variant interpolation (BURN_VALUE_FROM=Z,
    llrasterize.cpp GDALdllImageLine variant path): each visited pixel gets
    burn + interpolated Z, replace mode."""
    h, w = out.shape
    nseg = len(pts_px) - 1
    for j in range(nseg):
        x0, y0 = pts_px[j]
        x1, y1 = pts_px[j + 1]
        v0, v1 = float(zs[j]), float(zs[j + 1])
        ix, iy = int(np.floor(x0)), int(np.floor(y0))
        ix1, iy1 = int(np.floor(x1)), int(np.floor(y1))
        dx_n, dy_n = abs(ix1 - ix), abs(iy1 - iy)
        sx = -1 if ix > ix1 else 1
        sy = -1 if iy > iy1 else 1
        last = j == nseg - 1
        var = v0
        if dx_n >= dy_n:
            dvar = 0.0 if dx_n == 0 else (v1 - v0) / dx_n
            xerr = dy_n << 1
            yerr = xerr - (dx_n << 1)
            err = xerr - dx_n
            steps = dx_n if last else dx_n - 1
            for _ in range(steps + 1):
                if 0 <= ix < w and 0 <= iy < h:
                    out[iy, ix] = burn + var
                var += dvar
                ix += sx
                if err > 0:
                    iy += sy
                    err += yerr
                else:
                    err += xerr
        else:
            dvar = 0.0 if dy_n == 0 else (v1 - v0) / dy_n
            xerr = dx_n << 1
            yerr = xerr - (dy_n << 1)
            err = xerr - dy_n
            steps = dy_n if last else dy_n - 1
            for _ in range(steps + 1):
                if 0 <= ix < w and 0 <= iy < h:
                    out[iy, ix] = burn + var
                var += dvar
                iy += sy
                if err > 0:
                    ix += sx
                    err += yerr
                else:
                    err += xerr


def _burn_points(burn_mask: np.ndarray, pts_px: np.ndarray) -> None:
    h, w = burn_mask.shape
    for x, y in pts_px:
        if 0 <= x < w and 0 <= y < h:
            burn_mask[int(y), int(x)] = True


def _signed_area2(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _geom_mask(geom, shape, gt, all_touched: bool = False) -> np.ndarray:
    mask = np.zeros(shape, dtype=bool)

    def px(pts):
        x, y = geo_to_pixel(pts[:, 0], pts[:, 1], gt)
        return np.column_stack([x, y])

    kind, data = geom
    if kind == "polygon":
        # ring collection rule (alg/gdalrasterize.cpp GDALCollectRings...):
        # clockwise rings keep their order, counter-clockwise are reversed
        rings = [r if _signed_area2(r) < 0 else r[::-1] for r in data]
        if all_touched:
            # outline in intersect-only all-touched mode, then the fill
            # (gdalrasterize.cpp default-polygon branch with bAllTouched)
            for r in rings:
                _burn_line_all_touched(mask, px(r), intersect_only=True)
        _fill_polygon(mask, [px(r) for r in rings])
    elif kind == "linestring":
        # linestring points are collected in REVERSE order
        # (gdalrasterize.cpp wkbLineString branch) — affects which pixel the
        # Bresenham tie-step lands on, and hence golden checksums
        if all_touched:
            _burn_line_all_touched(mask, px(data[::-1]), intersect_only=False)
        else:
            _burn_line(mask, px(data[::-1]))
    elif kind == "point":
        _burn_points(mask, px(data))
    elif kind in ("multipolygon", "multilinestring", "multipoint", "geometrycollection"):
        for part in data:
            mask |= _geom_mask(part, shape, gt, all_touched)
    else:
        raise ValueError(kind)
    return mask


def rasterize(
    geoms,
    width: int,
    height: int,
    geotransform: tuple,
    burn_values,
    *,
    dtype=np.uint8,
    merge: str = "replace",
    init: float = 0,
    all_touched: bool = False,
    z_values=None,
) -> np.ndarray:
    """Burn geometries into a (height, width) array.

    geoms: iterable of parsed geometry tuples (gdal_ray.geo.wkb) or WKB
    bytes. burn_values: scalar or per-geometry sequence. merge: replace|add
    (MERGE_ALG, alg/gdalrasterize.cpp). z_values: per-geometry Z data (from
    wkb.wkt_to_geom_z) enables BURN_VALUE_FROM=Z: polygons burn
    burn + Z(first collected vertex) (gvBurnScanline passes padfVariant[0],
    llrasterize.cpp:179), lines burn burn + Z linearly interpolated along
    each segment."""
    out = np.full((height, width), init, dtype=np.float64)
    geoms = list(geoms)
    if np.isscalar(burn_values):
        burn_values = [burn_values] * len(geoms)
    if z_values is None:
        z_values = [None] * len(geoms)
    for geom, bv, zv in zip(geoms, burn_values, z_values):
        if isinstance(geom, (bytes, bytearray)):
            geom = W.parse_wkb(bytes(geom))
        if zv is not None and geom[0] == "linestring":
            # Z-interpolating line burn (points collected reversed, like the
            # plain path; Z reverses with them)
            x, y = geo_to_pixel(geom[1][::-1, 0], geom[1][::-1, 1], geotransform)
            _burn_line_z(out, np.column_stack([x, y]), np.asarray(zv)[::-1], bv)
            continue
        mask = _geom_mask(geom, (height, width), geotransform, all_touched)
        if zv is not None and geom[0] == "polygon":
            bv = bv + float(np.asarray(zv[0])[0])  # first collected vertex Z
        if merge == "add":
            out[mask] += bv
        else:
            out[mask] = bv
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    if info is not None:
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    return out.astype(dtype)
