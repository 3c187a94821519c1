"""Floyd-Steinberg dithering (raster/dither.py; alg/gdaldither.cpp
analog): exact-color fixpoint, error-diffusion mean preservation (the
defining property of dithering), determinism, kernel-weight spot check
against a hand-computed 1x3 case, and the distributed tile stage +
median-cut palette integration."""

import hashlib

import numpy as np
import pytest

from gdal_ray.raster.dither import (dither_rgb_to_palette,
                                    find_nearest_color)

PAL = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                [255, 255, 255]], np.uint8)


def test_exact_palette_colors_are_fixpoints():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = PAL[2]
    img[4:] = PAL[0]
    out = dither_rgb_to_palette(img, PAL)
    assert (out[:4] == 2).all() and (out[4:] == 0).all()


def test_mean_preservation_on_gradient():
    """Dithering preserves local mean brightness: reconstructing from the
    palette must match the original mean far better than plain nearest
    rounding for a value midway between palette entries."""
    img = np.full((64, 64, 3), 128, np.uint8)  # midway 85..170
    out = dither_rgb_to_palette(img, PAL)
    recon = PAL[out].astype(np.float64)
    assert abs(recon.mean() - 128.0) < 1.0
    # plain nearest would sit at 127.5? no: nearest(128) = 85 or 170
    # uniformly -> error 42; dithering mixes the two indices
    assert set(np.unique(out)) <= {1, 2} and len(np.unique(out)) == 2


def test_kernel_weights_hand_case():
    """1x3 row, palette {0, 255}: v=100 -> index 0, err 100; next pixel
    gets 100*7/16 = 43.75 -> 143.75 -> index 255? no: nearest(143.75) is
    255 at distance 111.25 vs 0 at 143.75 -> 255, err -111.25; third
    gets -111.25*7/16 = -48.67 -> clip(100-48.67)=51.33 -> 0."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = np.full((1, 3, 3), 100, np.uint8)
    out = dither_rgb_to_palette(img, pal)
    assert out.tolist() == [[0, 1, 0]]


def test_deterministic():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    a = dither_rgb_to_palette(img, PAL)
    b = dither_rgb_to_palette(img, PAL)
    assert (a == b).all()
    h = hashlib.md5(a.tobytes()).hexdigest()[:8]
    assert h == hashlib.md5(b.tobytes()).hexdigest()[:8]


def test_find_nearest_color_vectorized():
    rgb = np.array([[0, 0, 0], [90, 90, 90], [250, 250, 250]], np.uint8)
    idx = find_nearest_color(PAL, rgb)
    assert idx.tolist() == [0, 1, 3]


def test_dither_tiles_stage(ray_session):
    """Distributed tile dithering: per-tile results equal the direct
    single-image call (tiles are independent by design), wired through a
    median-cut palette from raster/mediancut.py."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.raster.dither import dither_tiles
    from gdal_ray.raster.mediancut import _rgb_to_cell, median_cut

    rng = np.random.RandomState(9)
    tiles = [rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
             for _ in range(6)]
    cells = _rgb_to_cell(np.concatenate([t.reshape(-1, 3) for t in tiles]))
    uc, counts = np.unique(cells, return_counts=True)
    pal = np.asarray(median_cut(uc, counts, 8), np.uint8)
    t = pa.table({
        "tile_id": pa.array(range(6), pa.int64()),
        "data": pa.array([x.tobytes() for x in tiles], pa.binary()),
    })
    out = dither_tiles(rd.from_arrow(t), pal, width=16, height=16)
    from gdal_ray.util import to_arrow

    got = to_arrow(out).to_pandas().sort_values("tile_id")
    for i, row in enumerate(got.itertuples()):
        direct = dither_rgb_to_palette(tiles[row.tile_id], pal)
        assert np.frombuffer(row.indexed, np.uint8).reshape(16, 16).tolist() \
            == direct.tolist()
