"""PNG tile payload encode (raster/png.py + stages/raster.py sink).

The reference tile pipeline writes encoded images
(apps/gdalalg_raster_tile.cpp); these tests pin our dependency-free PNG
writer: spec round-trips for every supported mode, a value-hash golden
on the encoded bytes of the q45 density tiles (deterministic encoder),
and the resumable z/x/y.png sink.
"""

import hashlib

import numpy as np
import pytest

from gdal_ray.raster.png import decode_png, encode_png


@pytest.mark.parametrize("shape,dtype", [
    ((7, 5), np.uint8),
    ((4, 6, 2), np.uint8),
    ((3, 9, 3), np.uint8),
    ((8, 8, 4), np.uint8),
    ((16, 16), np.uint16),
])
def test_png_roundtrip(shape, dtype):
    rng = np.random.RandomState(3)
    lim = 65535 if dtype == np.uint16 else 255
    a = rng.randint(0, lim + 1, size=shape).astype(dtype)
    b = encode_png(a)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(b)
    np.testing.assert_array_equal(out, a.reshape(out.shape))


def test_png_deterministic_and_validates():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert encode_png(a) == encode_png(a)
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_encoded_tile_golden_and_sink(ray_session, sf_dir, tmp_path):
    """Encoded-tile golden: the PNG bytes of the sf0.001 zoom-6 density
    tiles hash to a pinned value (encoder + pipeline both deterministic);
    the z/x/y.png sink round-trips and skips existing files on re-run."""
    from gdal_ray.pipelines.queries import events_points
    from gdal_ray.stages.raster import (encode_tiles_png,
                                        points_to_tile_counts,
                                        write_tiles_png)
    from gdal_ray.util import to_arrow

    tiles = points_to_tile_counts(events_points(sf_dir), 6)
    enc = to_arrow(encode_tiles_png(tiles, mode="gray16"))
    df = enc.to_pandas().sort_values(["zoom", "tile_x", "tile_y"])
    h = hashlib.md5()
    for png in df["png"]:
        h.update(png)
    assert h.hexdigest()[:16] == "d83ea4cee8641f18"
    # the payload really is the tile: decode one and compare to raw
    raw = to_arrow(tiles).to_pandas().sort_values(["tile_x", "tile_y"])
    a = np.frombuffer(raw["data"].iloc[0], np.uint32).reshape(256, 256)
    img = decode_png(df["png"].iloc[0])
    np.testing.assert_array_equal(img, np.minimum(a, 65535).astype(np.uint16))

    out = str(tmp_path / "xyz")
    man1 = to_arrow(write_tiles_png(tiles, out)).to_pandas()
    assert not man1["skipped"].any()
    p = (tmp_path / "xyz" / str(int(man1["zoom"].iloc[0]))
         / str(int(man1["tile_x"].iloc[0]))
         / f"{int(man1['tile_y'].iloc[0])}.png")
    assert p.exists() and p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    man2 = to_arrow(write_tiles_png(tiles, out)).to_pandas()
    assert man2["skipped"].all()
