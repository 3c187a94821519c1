"""Image feature matching — the behavior of gdal's matching utility
(alg/gdalmatching.cpp: GDALComputeMatchingPoints pairs feature points
between two rasters), built from the classic public methods instead of
SURF: Harris corners (Harris & Stephens 1988), normalized image-patch
descriptors, and Lowe-ratio mutual nearest matching (Lowe 2004 §7.1).

Everything is numpy-vectorized (shift-based gradients, cumsum box
filters, one descriptor matmul); the Ray stage maps batches of image
PAIRS — each row carries two single-band float rasters as binary columns
plus width/height — so a corpus of pair rows streams through
`map_batches` with no shuffle. Used standalone the kernels accept plain
2-D arrays."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _box_sum(a: np.ndarray, r: int) -> np.ndarray:
    """Sum over (2r+1)^2 windows via 2-D cumsum (edge-padded)."""
    p = np.pad(a, r + 1, mode="edge")
    c = p.cumsum(0).cumsum(1)
    w = 2 * r + 1
    return (c[w:, w:] - c[:-w, w:] - c[w:, :-w] + c[:-w, :-w])


def harris_corners(img: np.ndarray, *, k: float = 0.04, window: int = 2,
                   max_points: int = 200, threshold_rel: float = 0.01,
                   border: int = 8):
    """-> (N,2) int array of (row, col) corner positions, strongest first.
    3x3 non-max suppression; corners closer than `border` to an edge are
    dropped (so descriptors have full patches)."""
    a = img.astype(np.float64, copy=False)
    gy = np.zeros_like(a)
    gx = np.zeros_like(a)
    gy[1:-1, :] = (a[2:, :] - a[:-2, :]) * 0.5
    gx[:, 1:-1] = (a[:, 2:] - a[:, :-2]) * 0.5
    ixx = _box_sum(gx * gx, window)
    iyy = _box_sum(gy * gy, window)
    ixy = _box_sum(gx * gy, window)
    r = (ixx * iyy - ixy * ixy) - k * (ixx + iyy) ** 2
    # 3x3 non-max suppression via padded shifted max
    p = np.pad(r, 1, mode="constant", constant_values=-np.inf)
    neigh = np.max(np.stack([
        p[i:i + r.shape[0], j:j + r.shape[1]]
        for i in range(3) for j in range(3) if not (i == 1 and j == 1)
    ]), axis=0)
    thr = threshold_rel * max(r.max(), 1e-12)
    mask = (r >= neigh) & (r > thr)
    mask[:border, :] = mask[-border:, :] = False
    mask[:, :border] = mask[:, -border:] = False
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return np.empty((0, 2), np.int64)
    order = np.argsort(-r[ys, xs], kind="stable")[:max_points]
    return np.stack([ys[order], xs[order]], axis=1).astype(np.int64)


def patch_descriptors(img: np.ndarray, pts: np.ndarray,
                      radius: int = 6) -> np.ndarray:
    """(N, (2r+1)^2) mean-subtracted L2-normalized patches — one
    as-strided gather, no per-point Python loop."""
    if len(pts) == 0:
        return np.empty((0, (2 * radius + 1) ** 2))
    a = img.astype(np.float64, copy=False)
    w = 2 * radius + 1
    win = np.lib.stride_tricks.sliding_window_view(a, (w, w))
    d = win[pts[:, 0] - radius, pts[:, 1] - radius].reshape(len(pts), -1)
    d = d - d.mean(axis=1, keepdims=True)
    n = np.linalg.norm(d, axis=1, keepdims=True)
    return d / np.maximum(n, 1e-12)


def match_descriptors(d1: np.ndarray, d2: np.ndarray, *,
                      ratio: float = 0.8) -> np.ndarray:
    """Mutual-best matches passing Lowe's ratio test (in distance space,
    dist^2 = 2 - 2*cos for unit vectors). -> (M,2) index pairs."""
    if len(d1) == 0 or len(d2) == 0:
        return np.empty((0, 2), np.int64)
    sim = d1 @ d2.T
    best2 = np.argmax(sim, axis=1)
    s = np.sort(sim, axis=1)
    s1 = s[:, -1]
    s2 = s[:, -2] if sim.shape[1] > 1 else np.full(len(d1), -1.0)
    # dist^2 ratio test: (2-2*s1) <= ratio^2 * (2-2*s2)
    ok = (2.0 - 2.0 * s1) <= ratio * ratio * np.maximum(2.0 - 2.0 * s2, 0)
    mutual = np.argmax(sim, axis=0)[best2] == np.arange(len(d1))
    keep = ok & mutual
    return np.stack([np.nonzero(keep)[0], best2[keep]], axis=1)


def match_images(img1: np.ndarray, img2: np.ndarray, *, max_points=200,
                 radius: int = 6, ratio: float = 0.8) -> np.ndarray:
    """GDALComputeMatchingPoints analog: -> (M, 4) array of matched
    (y1, x1, y2, x2) point pairs, strongest-corner order."""
    p1 = harris_corners(img1, max_points=max_points, border=radius + 1)
    p2 = harris_corners(img2, max_points=max_points, border=radius + 1)
    m = match_descriptors(patch_descriptors(img1, p1, radius),
                          patch_descriptors(img2, p2, radius), ratio=ratio)
    if len(m) == 0:
        return np.empty((0, 4), np.int64)
    return np.concatenate([p1[m[:, 0]], p2[m[:, 1]]], axis=1)


def match_image_pairs(ds, *, a_col: str = "img_a", b_col: str = "img_b",
                      width_col: str = "width", height_col: str = "height",
                      id_col: str = "pair_id", max_points: int = 200,
                      radius: int = 6, ratio: float = 0.8):
    """Ray stage: each input row is an image PAIR (float32 rasters as
    binary columns + shared width/height); emits one row per match
    (id, y1, x1, y2, x2). Pure map — pairs process independently, no
    shuffle; at 100 TB the pair table streams like any other."""

    def f(t: pa.Table) -> pa.Table:
        ids_out, rows = [], []
        ids = t[id_col].to_pylist()
        ws = t[width_col].to_pylist()
        hs = t[height_col].to_pylist()
        aa = t[a_col].to_pylist()
        bb = t[b_col].to_pylist()
        for i in range(len(t)):
            w, h = int(ws[i]), int(hs[i])
            im1 = np.frombuffer(aa[i], np.float32).reshape(h, w)
            im2 = np.frombuffer(bb[i], np.float32).reshape(h, w)
            m = match_images(im1, im2, max_points=max_points,
                             radius=radius, ratio=ratio)
            ids_out.extend([ids[i]] * len(m))
            rows.append(m)
        mm = np.concatenate(rows) if rows else np.empty((0, 4), np.int64)
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "y1": pa.array(mm[:, 0]), "x1": pa.array(mm[:, 1]),
                         "y2": pa.array(mm[:, 2]), "x2": pa.array(mm[:, 3])})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)
