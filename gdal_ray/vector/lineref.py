"""Linear referencing — the ogrlineref utility re-expressed for Ray Data.

Reference behavior (apps/ogrlineref.cpp): given a reference LINESTRING,
(a) split it into parts at fixed measure steps (`-create`), (b) find the
measure of a point along the line (`-get_pos`), (c) the coordinate at a
measure (`-get_coord`), (d) the sub-line between two measures
(`-get_subline`).

The kernel functions are pure NumPy over the line's vertex array; the Ray
surface broadcasts the (small) reference line once via the map_batches
closure and vectorizes every point in a batch against all segments at once
(points x segments distance matrix — segment counts are bounded, typically
10^2-10^4; for longer lines pass `chunk_segments` to bound the temporary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_pts(line) -> np.ndarray:
    pts = np.asarray(line, np.float64)
    if pts.ndim != 2 or pts.shape[0] < 2 or pts.shape[1] < 2:
        raise ValueError("line must be an (n>=2, 2) vertex array")
    return pts[:, :2]


def line_measures(line) -> np.ndarray:
    """Cumulative distance (measure) at each vertex; [0] == 0."""
    pts = _as_pts(line)
    seg = np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1]))
    return np.concatenate([[0.0], np.cumsum(seg)])


def locate_points(line, x, y, *, chunk_segments: int = 4096):
    """Measure along `line` of the closest point to each (x, y), plus the
    perpendicular offset (distance to the line). Vectorized: for every
    segment, project all points onto it (clamped), take the per-point
    argmin. Returns (measure, offset) float64 arrays."""
    pts = _as_pts(line)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    meas = line_measures(pts)
    a = pts[:-1]                      # (s, 2) segment starts
    d = pts[1:] - a                   # (s, 2) segment vectors
    seg_len2 = (d * d).sum(axis=1)
    seg_len2 = np.where(seg_len2 == 0, 1.0, seg_len2)
    best_off = np.full(x.shape, np.inf)
    best_m = np.zeros(x.shape)
    for s0 in range(0, len(a), chunk_segments):
        aa = a[s0:s0 + chunk_segments]
        dd = d[s0:s0 + chunk_segments]
        l2 = seg_len2[s0:s0 + chunk_segments]
        mm = meas[s0:s0 + chunk_segments]
        # t: (n_points, n_segs) clamped projection parameter
        px = x[:, None] - aa[None, :, 0]
        py = y[:, None] - aa[None, :, 1]
        t = np.clip((px * dd[None, :, 0] + py * dd[None, :, 1]) / l2, 0, 1)
        cx = px - t * dd[None, :, 0]
        cy = py - t * dd[None, :, 1]
        off = np.hypot(cx, cy)
        j = off.argmin(axis=1)
        o = off[np.arange(len(x)), j]
        better = o < best_off
        tl = t[np.arange(len(x)), j]
        m = mm[j] + tl * np.sqrt(l2[j])
        best_off = np.where(better, o, best_off)
        best_m = np.where(better, m, best_m)
    return best_m, best_off


def point_at_measure(line, m: float) -> tuple[float, float]:
    """Coordinate at measure m (clamped to [0, length])."""
    pts = _as_pts(line)
    meas = line_measures(pts)
    m = float(np.clip(m, 0.0, meas[-1]))
    i = int(np.searchsorted(meas, m, side="right") - 1)
    i = min(i, len(pts) - 2)
    seg = meas[i + 1] - meas[i]
    t = 0.0 if seg == 0 else (m - meas[i]) / seg
    p = pts[i] + t * (pts[i + 1] - pts[i])
    return float(p[0]), float(p[1])


def substring(line, m0: float, m1: float) -> np.ndarray:
    """Sub-line between measures m0 < m1 (ogrlineref -get_subline)."""
    pts = _as_pts(line)
    meas = line_measures(pts)
    m0 = float(np.clip(m0, 0.0, meas[-1]))
    m1 = float(np.clip(m1, 0.0, meas[-1]))
    if m1 <= m0:
        raise ValueError("m1 must exceed m0")
    keep = pts[(meas > m0) & (meas < m1)]
    p0 = np.asarray(point_at_measure(pts, m0))
    p1 = np.asarray(point_at_measure(pts, m1))
    out = np.vstack([p0[None, :], keep, p1[None, :]])
    # drop consecutive duplicates (measure exactly on a vertex)
    d = np.diff(out, axis=0)
    mask = np.concatenate([[True], (np.abs(d).sum(axis=1) > 0)])
    return out[mask]


def split_by_step(line, step: float) -> list[np.ndarray]:
    """Split into parts of `step` measure each (last part may be short) —
    ogrlineref -create mile-points."""
    if step <= 0:
        raise ValueError("step must be positive")
    total = line_measures(line)[-1]
    parts = []
    m = 0.0
    while m < total - 1e-12:
        parts.append(substring(line, m, min(m + step, total)))
        m += step
    return parts


def locate_points_along_line(ds, line, *, x_col: str = "x",
                             y_col: str = "y", measure_col: str = "measure",
                             offset_col: str = "offset"):
    """Ray stage: add (measure, offset) columns for every point row
    against the broadcast reference line. The line ships once in the task
    closure (small side); each batch is one vectorized kernel call."""
    pts = _as_pts(line)

    def f(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m, o = locate_points(pts, x, y)
        t = t.append_column(measure_col, pa.array(m))
        return t.append_column(offset_col, pa.array(o))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)
