"""Baseline JPEG decoder vs the REFERENCE'S OWN autotest fixtures.

The canonical gate: autotest/gdrivers/jpeg.py:43-47 accepts band-2
checksum {34296 (libjpeg 9b), 34298 (8), 17016 (6b/turbo)} for
albania.jpg — our from-scratch islow + fancy-upsample + integer-color
pipeline lands EXACTLY on 17016, i.e. bit-parity with the
libjpeg-6b/turbo generation on real 4:2:0 data.
"""

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum
from gdal_ray.raster.jpeg import decode_jpeg

FIX = "/root/reference/autotest/gdrivers/data/jpeg"


def _read(name):
    with open(f"{FIX}/{name}", "rb") as f:
        return f.read()


def test_albania_reference_checksum():
    img = decode_jpeg(_read("albania.jpg"))
    assert img.shape == (260, 361, 3)
    # band 2 (green) is the value the reference's own test suite pins
    # (jpeg.py:47, libjpeg-turbo/6b generation)
    assert checksum(img[:, :, 1]) == 17016
    # all three bands pinned for regression (ours, same decode)
    assert [checksum(img[:, :, b]) for b in range(3)] == \
        [61830, 17016, 20715]


def test_rgb_and_grayscale_fixtures():
    rgb = decode_jpeg(_read("rgbsmall_rgb.jpg"))
    assert rgb.shape == (50, 50, 3)
    assert [checksum(rgb[:, :, b]) for b in range(3)] == \
        [3886, 29282, 18637]
    gray = decode_jpeg(_read("byte_with_xmp.jpg"))
    assert gray.shape == (20, 20)
    assert checksum(gray) == 4743


def test_truncated_stream_tolerated():
    # vophead.jpg is deliberately truncated (jpeg.py:197) — libjpeg warns
    # and pads; we decode what is present and zero-fill the rest
    img = decode_jpeg(_read("vophead.jpg"))
    assert img.shape == (6000, 8750, 3)


def test_progressive_raises():
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(_read("arcgis_geodataxform_gcp.jpg"))


def test_not_a_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")


def test_fancy_vs_simple_upsampling_differ():
    buf = _read("albania.jpg")
    fancy = decode_jpeg(buf)
    simple = decode_jpeg(buf, fancy_upsampling=False)
    assert fancy.shape == simple.shape
    assert not np.array_equal(fancy, simple)
    # luma plane (no upsampling) must agree between the two modes:
    # recompute Y from RGB is lossy, so compare a full-res invariant —
    # both modes share identical Y, so rows where chroma is constant
    # match exactly; check overall closeness instead
    diff = np.abs(fancy.astype(int) - simple.astype(int))
    assert diff.mean() < 2.0  # same image content, kernel-level deltas


def test_multimodal_jpeg_path(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.multimodal import image_features
    from gdal_ray.util import to_arrow

    buf = _read("albania.jpg")
    t = pa.table({"id": [1], "image": [buf],
                  "img_width": pa.array([361], pa.int32()),
                  "img_height": pa.array([260], pa.int32()),
                  "img_format": ["jpeg"]})
    out = to_arrow(image_features(rd.from_arrow(t), concurrency=(1, 1)))
    assert out.num_rows == 1
    assert out["img_mean"][0].as_py() > 0
    assert "image" not in out.column_names


def test_encoder_roundtrip_gray_and_rgb():
    from gdal_ray.raster.jpeg import encode_jpeg

    rng = np.random.default_rng(42)
    g = (np.outer(np.linspace(0, 255, 64), np.ones(48))
         + rng.normal(0, 4, (64, 48))).clip(0, 255).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(g, quality=90))
    assert back.shape == g.shape
    assert np.sqrt(((back.astype(float) - g) ** 2).mean()) < 4.0
    rgb = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=2)
    back2 = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert back2.shape == rgb.shape
    assert np.sqrt(((back2.astype(float) - rgb) ** 2).mean()) < 5.0
    # quality knob: lower quality -> smaller file, still decodable
    lo, hi = encode_jpeg(rgb, 30), encode_jpeg(rgb, 95)
    assert len(lo) < len(hi)
    assert decode_jpeg(lo).shape == rgb.shape
    # deterministic bytes
    assert encode_jpeg(rgb, 85) == encode_jpeg(rgb, 85)


def test_encoder_odd_sizes_and_flat():
    from gdal_ray.raster.jpeg import encode_jpeg

    flat = np.full((13, 21), 77, np.uint8)  # non-multiple-of-8, flat
    back = decode_jpeg(encode_jpeg(flat, quality=85))
    assert back.shape == (13, 21)
    assert np.abs(back.astype(int) - 77).max() <= 1


def test_jpeg_tile_sink(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.raster import TILE, write_tiles_jpeg
    from gdal_ray.util import to_arrow

    rng = np.random.default_rng(7)
    tiles = []
    for (z, x, y) in [(3, 1, 2), (3, 1, 3)]:
        data = rng.integers(0, 300, (TILE, TILE)).astype(np.uint32)
        tiles.append({"zoom": z, "tile_x": x, "tile_y": y,
                      "data": data.tobytes()})
    t = pa.table({k: [r[k] for r in tiles] for k in tiles[0]})
    man = to_arrow(write_tiles_jpeg(rd.from_arrow(t), str(tmp_path)))
    assert man.num_rows == 2
    assert not any(man["skipped"].to_pylist())
    img = decode_jpeg(open(f"{tmp_path}/3/1/2.jpg", "rb").read())
    assert img.shape == (TILE, TILE)
    # resume: second run skips everything
    man2 = to_arrow(write_tiles_jpeg(rd.from_arrow(t), str(tmp_path)))
    assert all(man2["skipped"].to_pylist())


def test_appended_mask_reference_checksum():
    from gdal_ray.raster.jpeg import decode_jpeg_mask

    m = decode_jpeg_mask(_read("masked.jpg"))
    # autotest/gdrivers/jpeg.py:170 pins the mask checksum 770 (zlib
    # 1-bit LSB-first bitmap appended after EOI)
    assert m.shape == (512, 512)
    assert set(np.unique(m)) <= {0, 255}
    from gdal_ray.raster.checksum import checksum as _cs
    assert _cs(m) == 770
    # files without a mask return None
    assert decode_jpeg_mask(_read("albania.jpg")) is None


def test_cmyk_reference_checksums():
    from gdal_ray.raster.checksum import checksum as _cs

    img = decode_jpeg(_read("rgb_ntf_cmyk.jpg"))
    # autotest/gdrivers/jpeg.py test_jpeg_8 pins the CMYK->RGB bands at
    # 20385 / 20865 / 19441 (component * K / 255, Adobe raw convention)
    assert img.shape == (50, 50, 3)
    assert [_cs(img[:, :, b]) for b in range(3)] == [20385, 20865, 19441]
