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
