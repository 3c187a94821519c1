"""AAIGrid + GIF drivers vs the reference's own autotest fixtures."""

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum
from gdal_ray.sources.aaigrid import read_aaigrid, write_aaigrid
from gdal_ray.sources.gif import read_gif

AAIG = "/root/reference/autotest/gdrivers/data/aaigrid"
GIF = "/root/reference/autotest/gdrivers/data/gif"


def test_aaigrid_reference_checksums():
    a, gt, nd = read_aaigrid(f"{AAIG}/byte.tif.grd")
    # autotest/gdrivers/aaigrid.py:33 pins checksum 4672
    assert a.shape == (20, 20) and a.dtype == np.int32
    assert checksum(a) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    b, _, _ = read_aaigrid(f"{AAIG}/pixel_per_line.asc")
    # aaigrid.py:46 pins checksum 1123
    assert checksum(b) == 1123


def test_aaigrid_decimal_comma_and_nan():
    b, _, _ = read_aaigrid(f"{AAIG}/pixel_per_line.asc")
    c, _, _ = read_aaigrid(f"{AAIG}/pixel_per_line_comma.asc")
    assert np.array_equal(b, c)
    n, _, nd = read_aaigrid(f"{AAIG}/nodata_nan.asc")
    assert n.dtype == np.float64 and np.isnan(nd)
    assert np.isnan(n[0, 0])


def test_aaigrid_createcopy_roundtrip(tmp_path):
    # mirrors the reference's CreateCopy table: byte.tif -> AAIGrid ->
    # read -> checksum 4672 (aaigrid.py init_list)
    from gdal_ray.sources.geotiff import read_geotiff

    arr, gt, _ = read_geotiff("/root/reference/autotest/gcore/data/byte.tif")
    p = str(tmp_path / "byte.asc")
    write_aaigrid(arr.astype(np.int32), p, geotransform=gt)
    back, gt2, _ = read_aaigrid(p)
    assert checksum(back) == 4672
    assert np.allclose(gt, gt2)


def test_aaigrid_float_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.normal(0, 10, (7, 9))
    p = str(tmp_path / "f.asc")
    write_aaigrid(a, p, nodata=-9999)
    back, _, nd = read_aaigrid(p)
    assert nd == -9999
    assert np.allclose(back, a, rtol=0, atol=0)  # repr round-trips exactly


def test_gif_reference_checksum():
    img, pal = read_gif(f"{GIF}/bug407.gif")
    # autotest/gdrivers/gif.py:48 pins band-1 checksum 57921
    assert img.shape == (400, 400)
    assert checksum(img) == 57921
    assert pal.shape[1] == 3
    # byte_with_xmp.gif carries the canonical byte payload -> 4672
    img2, _ = read_gif(f"{GIF}/byte_with_xmp.gif")
    assert checksum(img2) == 4672


def test_gif_errors():
    with pytest.raises(ValueError):
        read_gif("/root/reference/autotest/gdrivers/data/pnm/byte.pgm")


def test_open_source_dispatch(ray_session):
    from gdal_ray.sources import open_source
    from gdal_ray.util import to_arrow

    t = to_arrow(open_source(f"{AAIG}/byte.tif.grd"))
    r = t.to_pylist()[0]
    arr = np.frombuffer(r["data"], np.float64).reshape(r["h"], r["w"])
    assert checksum(arr) == 4672
    t2 = to_arrow(open_source(f"{GIF}/bug407.gif"))
    r2 = [x for x in t2.to_pylist()
          if x["tile_x"] == 0 and x["tile_y"] == 0][0]
    assert r2["w"] == 256 and r2["h"] == 256


ENVI = "/root/reference/autotest/gdrivers/data/envi"


def test_envi_reference_checksums():
    from gdal_ray.sources.envi import read_envi

    cube, gt, hdr = read_envi(f"{ENVI}/aea.dat")
    # autotest/gdrivers/envi.py:34 pins band-1 checksum 14823
    assert cube.shape == (1, 3, 434)
    assert checksum(cube[0]) == 14823
    # envi.py:424-426: all three interleaves give identical bands
    for suf in ("bil", "bip", "bsq"):
        c, _, _ = read_envi(f"{ENVI}/envi_rgbsmall_{suf}.img")
        assert [checksum(c[b]) for b in range(3)] == \
            [20718, 20669, 20895], suf
    # gzip "file compression = 1" variant decodes identically
    cc, _, _ = read_envi(f"{ENVI}/aea_compressed.dat")
    assert checksum(cc[0]) == 14823
    # big-endian uint16 fixture carries the canonical byte payload
    be, _, _ = read_envi(f"{ENVI}/uint16_envi_bigendian.dat")
    assert checksum(be[0]) == 4672


def test_envi_roundtrip_interleaves(tmp_path):
    from gdal_ray.sources.envi import read_envi, write_envi

    rng = np.random.default_rng(1)
    cube = rng.integers(0, 255, (3, 10, 13)).astype(np.uint8)
    for inter in ("bsq", "bil", "bip"):
        p = str(tmp_path / f"t_{inter}.envi")
        write_envi(cube, p, interleave=inter,
                   geotransform=(5, 2, 0, 100, 0, -2))
        back, gt, _ = read_envi(p)
        assert np.array_equal(back, cube), inter
        assert gt == (5.0, 2.0, 0.0, 100.0, 0.0, -2.0)
    f32 = rng.normal(0, 1, (2, 6, 7)).astype(np.float32)
    p = str(tmp_path / "f.envi")
    write_envi(f32, p)
    back, _, _ = read_envi(p)
    assert np.array_equal(back, f32)


EHDR = "/root/reference/autotest/gdrivers/data/ehdr"


def test_ehdr_reference_checksums():
    from gdal_ray.sources.ehdr import read_ehdr

    cube, gt, _ = read_ehdr(f"{EHDR}/float32.bil")
    # autotest/gdrivers/ehdr.py:54 pins checksum 27; GT == byte.tif's
    assert checksum(cube[0]) == 27
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    # ehdr.py:186/:195 — 32-bit without PIXELTYPE decodes as float32
    # (same bytes, .bil and .flt spellings)
    a, _, _ = read_ehdr(f"{EHDR}/ehdr10.bil")
    b, _, _ = read_ehdr(f"{EHDR}/ehdr11.flt")
    assert checksum(a[0]) == 8202 and checksum(b[0]) == 8202
    assert a[0].dtype.kind == "f"


def test_ehdr_roundtrip(tmp_path):
    from gdal_ray.sources.ehdr import read_ehdr, write_ehdr

    rng = np.random.default_rng(2)
    for dt in (np.uint8, np.int16, np.float32):
        c = rng.normal(50, 20, (2, 5, 7)).astype(dt)
        p = str(tmp_path / f"t_{dt.__name__}.bil")
        write_ehdr(c, p, geotransform=(10, 3, 0, 99, 0, -3), nodata=-1)
        back, gt, nd = read_ehdr(p)
        assert np.array_equal(back, c)
        assert gt == (10.0, 3.0, 0.0, 99.0, 0.0, -3.0)
        assert nd == -1.0


def test_xyz_createcopy_parity(tmp_path):
    # mirrors autotest/gdrivers/xyz.py:30 (CreateCopy byte.tif -> 4672)
    from gdal_ray.sources.geotiff import read_geotiff
    from gdal_ray.sources.xyz import read_xyz, write_xyz

    arr, gt, _ = read_geotiff(
        "/root/reference/autotest/gcore/data/byte.tif")
    p = str(tmp_path / "byte.xyz")
    write_xyz(arr.astype(np.int32), p, geotransform=gt)
    back, gt2 = read_xyz(p)
    assert checksum(back) == 4672
    assert np.allclose(gt, gt2)


def test_xyz_header_and_commas(tmp_path):
    from gdal_ray.sources.xyz import read_xyz

    p = tmp_path / "h.csv"
    p.write_text("x,y,z\n0.5,1.5,10\n1.5,1.5,20\n0.5,0.5,30\n1.5,0.5,40\n")
    a, gt = read_xyz(str(p))
    assert a.tolist() == [[10, 20], [30, 40]]
    assert gt == (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
    bad = tmp_path / "bad.xyz"
    bad.write_text("0 0 1\n1 1 2\n")
    with pytest.raises(ValueError):
        read_xyz(str(bad))


def test_dted_reference_checksums():
    from gdal_ray.sources.dted import read_dted

    g, gt = read_dted("/root/reference/autotest/gdrivers/data/n43.dt0")
    # autotest/gdrivers/dted.py:31 pins checksum 49187; :87 pins the
    # (5,5) 5x5 window at 305
    assert g.shape == (121, 121) and g.dtype == np.int16
    assert checksum(g) == 49187
    assert checksum(g[5:10, 5:10]) == 305
    assert np.allclose(gt, (-80.00416666666666, 1 / 120, 0.0,
                            44.00416666666667, 0.0, -1 / 120))


def test_dted_errors(tmp_path):
    from gdal_ray.sources.dted import read_dted

    p = tmp_path / "bad.dt0"
    p.write_bytes(b"not dted at all")
    with pytest.raises(ValueError):
        read_dted(str(p))


def test_pcraster_reference_checksum():
    from gdal_ray.sources.pcraster import read_pcraster

    a, gt, nd, vs = read_pcraster(
        "/root/reference/autotest/gdrivers/data/pcraster/ldd.map")
    # autotest/gdrivers/pcraster.py:27 pins checksum 4528
    assert a.shape == (100, 80) and a.dtype == np.uint8
    assert checksum(a) == 4528
    assert gt == (182140.0, 10.0, 0.0, 327880.0, 0.0, -10.0)
    assert nd == 255 and vs == 0xF0  # VS_LDD
    assert a[a != 255].min() == 1 and a[a != 255].max() == 9


def test_pcraster_errors(tmp_path):
    from gdal_ray.sources.pcraster import read_pcraster

    p = tmp_path / "x.map"
    p.write_bytes(b"wrong signature" * 20)
    with pytest.raises(ValueError):
        read_pcraster(str(p))


GSG = "/root/reference/autotest/gdrivers/data/gsg"
ERS = "/root/reference/autotest/gdrivers/data/ers"


def test_surfer_reference_checksums():
    from gdal_ray.sources.surfer import read_surfer

    # gsg.py:25/:31/:37 — three encodings of the byte.tif payload, all
    # pinned at 4672, with byte.tif's exact geotransform
    for f in ("gsg_ascii.grd", "gsg_binary.grd", "gsg_7binary.grd"):
        a, gt, nd = read_surfer(f"{GSG}/{f}")
        assert a.shape == (20, 20), f
        assert checksum(a) == 4672, f
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), f


def test_surfer_roundtrips(tmp_path):
    from gdal_ray.sources.surfer import (read_surfer, write_surfer6,
                                         write_surfer_ascii)

    rng = np.random.default_rng(4)
    x = rng.normal(10, 5, (6, 9))
    x[2, 3] = np.nan
    for wr, name in [(write_surfer_ascii, "a.grd"),
                     (write_surfer6, "b.grd")]:
        p = str(tmp_path / name)
        wr(x, p, geotransform=(100, 2, 0, 50, 0, -2))
        back, gt, _ = read_surfer(p)
        assert np.isnan(back[2, 3])
        assert np.allclose(np.nan_to_num(back), np.nan_to_num(x),
                           rtol=1e-6)
        assert gt == (100.0, 2.0, 0.0, 50.0, 0.0, -2.0)


def test_ers_reference_checksums():
    from gdal_ray.sources.ers import read_ers

    # ers.py:29 — a header that stresses comments/quoted escapes
    cube, gt, nd = read_ers(f"{ERS}/srtm.ers")
    assert cube.shape == (1, 10, 12)
    assert checksum(cube[0]) == 64074
    assert nd == 9999.0
    # ers.py:75 — float32 DEM
    dem, _, nd2 = read_ers(f"{ERS}/ers_dem.ers")
    assert checksum(dem[0]) == 56588
    assert nd2 == -9999.0


def test_lan_reference_checksums():
    from gdal_ray.sources.lan import read_lan

    # lan.py:26/:36 — 8-bit and 4-bit-packed variants, both pinned at 10
    for f in ("fakelan.lan", "fakelan4bit.lan"):
        cube, gt = read_lan(
            f"/root/reference/autotest/gdrivers/data/lan/{f}")
        assert cube[0].tolist() == [[1, 2], [3, 4]], f
        assert checksum(cube[0]) == 10, f


def test_png_reference_checksums():
    from gdal_ray.raster.png import decode_png

    P = "/root/reference/autotest/gdrivers/data/png"
    # png.py:39 pins test.png (4-bit palette) at 57921
    img, pal = decode_png(open(f"{P}/test.png", "rb").read(),
                          return_palette=True)
    assert img.shape == (400, 400) and pal.shape == (16, 3)
    assert checksum(img) == 57921
    # png.py:103 pins rgba16.png band 3 at 1815 (16-bit, Paeth filters);
    # band 2 = 2042 also matches ehdr.py:32's use of the same source
    r = decode_png(open(f"{P}/rgba16.png", "rb").read())
    assert r.dtype == np.uint16
    assert [checksum(r[:, :, b]) for b in range(4)] == \
        [1886, 2042, 1815, 4873]
    # grayscale with ancillary chunks carries the canonical byte payload
    assert checksum(decode_png(
        open(f"{P}/byte_with_xmp.png", "rb").read())) == 4672


def test_grd_magic_dispatch(ray_session):
    from gdal_ray.sources import open_source
    from gdal_ray.util import to_arrow

    # Surfer magic routes to the surfer reader
    t = to_arrow(open_source(f"{GSG}/gsg_binary.grd"))
    r = t.to_pylist()[0]
    arr = np.frombuffer(r["data"], np.float64).reshape(r["h"], r["w"])
    assert checksum(arr) == 4672
    # AAIGrid text routes to aaigrid
    t2 = to_arrow(open_source(f"{AAIG}/byte.tif.grd"))
    r2 = t2.to_pylist()[0]
    arr2 = np.frombuffer(r2["data"], np.float64).reshape(r2["h"], r2["w"])
    assert checksum(arr2) == 4672


def test_bt_createcopy_parity(tmp_path):
    # mirrors bt.py:44 — int16/int32/float32 byte.tif payloads at 4672
    from gdal_ray.sources.bt import read_bt, write_bt
    from gdal_ray.sources.geotiff import read_geotiff

    arr, gt, _ = read_geotiff(
        "/root/reference/autotest/gcore/data/byte.tif")
    for dt in (np.int16, np.int32, np.float32):
        p = str(tmp_path / f"t_{dt.__name__}.bt")
        write_bt(arr.astype(dt), p, geotransform=gt)
        back, gt2 = read_bt(p)
        assert back.dtype == dt
        assert checksum(back) == 4672
        assert np.allclose(gt, gt2)
    bad = tmp_path / "bad.bt"
    bad.write_bytes(b"not binterr at all, nope")
    with pytest.raises(ValueError):
        read_bt(str(bad))


def test_rmf_reference_checksums():
    from gdal_ray.sources.rmf import read_rmf

    R = "/root/reference/autotest/gdrivers/data/rmf"
    # rmf.py:30 pins byte.rsw at 4672 — with byte.tif's exact GT
    a, gt = read_rmf(f"{R}/byte.rsw")
    assert checksum(a) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    # rmf.py:50-:56 pin the three rgbsmall bands (stored BGR -> RGB)
    b, _ = read_rmf(f"{R}/rgbsmall.rsw")
    assert [checksum(b[:, :, c]) for c in range(3)] == \
        [21212, 21053, 21349]
    # rmf.py:43 pins the float64 elevation matrix (.mtw) at 4672
    c, _ = read_rmf(f"{R}/float64.mtw")
    assert c.dtype == np.float64 and checksum(c) == 4672
    # documented scope: big-endian raises, garbage rejected
    with pytest.raises(NotImplementedError):
        read_rmf(f"{R}/big-endian.rsw")
    with pytest.raises(ValueError):
        read_rmf("/root/reference/autotest/gdrivers/data/n43.dt0")


def test_mff_reference_checksums():
    from gdal_ray.sources.mff import read_mff

    M = "/root/reference/autotest/gdrivers/data/mff"
    # mff.py:27/:37/:47 pin fakemff=1, fakemfftiled=1, bytemff=4672
    a, hdr = read_mff(f"{M}/bytemff.hdr")
    assert a.shape == (1, 20, 20) and checksum(a[0]) == 4672
    assert hdr["projection_name"].upper() == "UTM"
    b, _ = read_mff(f"{M}/fakemff.hdr")
    assert checksum(b[0]) == 1
    c, _ = read_mff(f"{M}/fakemfftiled.hdr")
    assert checksum(c[0]) == 1
    with pytest.raises(ValueError):
        read_mff(f"{AAIG}/byte.tif.grd")
