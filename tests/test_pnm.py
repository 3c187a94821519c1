"""PNM driver vs the reference's own autotest fixtures + round trips."""

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum
from gdal_ray.sources.pnm import read_pnm, read_pnm_tiles, write_pnm

FIX = "/root/reference/autotest/gdrivers/data/pnm"


def test_reference_fixture_checksums():
    a = read_pnm(f"{FIX}/byte.pgm")
    assert a.shape == (20, 20) and a.dtype == np.uint8
    # autotest/gdrivers/pnm.py:27 pins band-1 checksum 4672
    assert checksum(a) == 4672
    b = read_pnm(f"{FIX}/rgbsmall.ppm")
    assert b.shape == (50, 50, 3)
    # pnm.py:49 pins band-2 checksum 21053
    assert checksum(b[:, :, 1]) == 21053


def test_malicious_header_rejected():
    # int_max.pgm declares 2147483647x2147483647 (pnm.py:76 robustness
    # fixture) — must fail cleanly, not allocate
    with pytest.raises(ValueError):
        read_pnm(f"{FIX}/int_max.pgm")


@pytest.mark.parametrize("ascii_format", [False, True])
def test_roundtrip_gray_color(tmp_path, ascii_format):
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (13, 17)).astype(np.uint8)
    write_pnm(g, str(tmp_path / "g.pgm"), ascii_format=ascii_format)
    assert np.array_equal(read_pnm(str(tmp_path / "g.pgm")), g)
    c = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    write_pnm(c, str(tmp_path / "c.ppm"), ascii_format=ascii_format)
    assert np.array_equal(read_pnm(str(tmp_path / "c.ppm")), c)


def test_roundtrip_uint16(tmp_path):
    u = ((np.arange(300).reshape(15, 20) * 211) % 60000).astype(np.uint16)
    write_pnm(u, str(tmp_path / "u.pgm"))
    back = read_pnm(str(tmp_path / "u.pgm"))
    assert back.dtype == np.uint16
    assert np.array_equal(back, u)


def test_comments_in_header(tmp_path):
    p = tmp_path / "c.pgm"
    p.write_bytes(b"P2 # magic\n# a comment line\n3 # width\n2 255\n"
                  b"1 2 3\n4 5 6\n")
    assert np.array_equal(read_pnm(str(p)),
                          np.array([[1, 2, 3], [4, 5, 6]], np.uint8))


def test_open_source_tile_fan(ray_session):
    from gdal_ray.sources import open_source
    from gdal_ray.util import to_arrow

    ds = open_source(f"{FIX}/rgbsmall.ppm")
    t = to_arrow(ds)
    assert t.num_rows == 3  # 50x50 -> one tile per band
    g = [r for r in t.to_pylist() if r["band"] == 1][0]
    arr = np.frombuffer(g["data"], np.uint8).reshape(g["h"], g["w"])
    assert checksum(arr) == 21053
