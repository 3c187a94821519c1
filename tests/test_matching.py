"""Image feature matching (alg/gdalmatching.cpp behavior analog):
Harris corners + patch descriptors + ratio-test mutual matching must
recover a known integer shift between two textured rasters, both via the
plain-array kernel and the Ray pair-table stage."""

from collections import Counter

import numpy as np
import pyarrow as pa


def _textured(seed=0, n=140):
    rng = np.random.RandomState(seed)
    a = rng.standard_normal((n, n))
    from numpy.lib.stride_tricks import sliding_window_view

    def smooth(x):
        p = np.pad(x, 2, mode="edge")
        return sliding_window_view(p, (5, 5)).mean(axis=(2, 3))

    return smooth(smooth(a)) * 10


def test_match_images_recovers_shift():
    from gdal_ray.raster.matching import match_images

    img = _textured()
    dy, dx = 7, -4
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    m = match_images(img[:120, :120], img2[:120, :120], max_points=150)
    assert len(m) >= 50
    shifts = Counter(zip((m[:, 2] - m[:, 0]).tolist(),
                         (m[:, 3] - m[:, 1]).tolist()))
    mode, cnt = shifts.most_common(1)[0]
    assert mode == (dy, dx)
    assert cnt >= 0.9 * len(m)  # near-unanimous


def test_match_images_empty_on_flat():
    from gdal_ray.raster.matching import match_images

    flat = np.zeros((64, 64))
    assert len(match_images(flat, flat)) == 0


def test_match_image_pairs_stage(ray_session):
    import ray.data as rd

    from gdal_ray.raster.matching import match_image_pairs
    from gdal_ray.util import to_arrow

    rows = []
    for pid, (dy, dx) in enumerate([(3, 2), (-5, 1)]):
        img = _textured(seed=pid + 1, n=100).astype(np.float32)
        img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        rows.append({"pair_id": pid, "width": 100, "height": 100,
                     "img_a": img.tobytes(), "img_b": img2.tobytes()})
    t = pa.Table.from_pylist(rows)
    out = to_arrow(match_image_pairs(rd.from_arrow(t))).to_pandas()
    for pid, (dy, dx) in enumerate([(3, 2), (-5, 1)]):
        sub = out[out.pair_id == pid]
        assert len(sub) >= 20, pid
        shifts = Counter(zip((sub.y2 - sub.y1).tolist(),
                             (sub.x2 - sub.x1).tolist()))
        assert shifts.most_common(1)[0][0] == (dy, dx), pid


def test_matching_feeds_homography_registration():
    """End-to-end registration: matched points from two shifted images fit
    a Homography whose forward transform IS the shift (the
    GDALComputeMatchingPoints -> GDALCreateHomographyTransformer chain)."""
    from gdal_ray.geo.gcp import Homography
    from gdal_ray.raster.matching import match_images

    img = _textured(seed=3, n=120)
    dy, dx = 5, -3
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    m = match_images(img, img2, max_points=150)
    assert len(m) >= 20
    # gcps: (pixel=x1, line=y1) -> (x=x2, y=y2)
    gcps = np.stack([m[:, 1], m[:, 0], m[:, 3], m[:, 2]], axis=1)
    H = Homography(gcps)
    fx, fy = H.forward(np.array([10.0, 50.0]), np.array([20.0, 70.0]))
    assert np.allclose(fx, [10 + dx, 50 + dx], atol=1e-6)
    assert np.allclose(fy, [20 + dy, 70 + dy], atol=1e-6)
    assert H.residuals(gcps).max() < 1e-6
