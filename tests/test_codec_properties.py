"""Property-based round-trip tests for the from-scratch codecs/drivers:
any valid array must survive encode -> decode bit-exact (PNM, ENVI, BT,
EHdr, Surfer-6, WAV PCM16 integers) or within the format's documented
tolerance (WAV float quantization, JPEG)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

SET = settings(max_examples=25, deadline=None,
               suppress_health_check=[HealthCheck.too_slow])

dims = st.tuples(st.integers(1, 23), st.integers(1, 19))


@given(shape=dims, data=st.data())
@SET
def test_pnm_roundtrip_property(tmp_path_factory, shape, data):
    from gdal_ray.sources.pnm import read_pnm, write_pnm

    arr = data.draw(arrays(np.uint8, shape))
    p = tmp_path_factory.mktemp("pnm") / "t.pgm"
    write_pnm(arr, str(p))
    assert np.array_equal(read_pnm(str(p)), arr)


@given(shape=dims, inter=st.sampled_from(["bsq", "bil", "bip"]),
       data=st.data())
@SET
def test_envi_roundtrip_property(tmp_path_factory, shape, inter, data):
    from gdal_ray.sources.envi import read_envi, write_envi

    nb = data.draw(st.integers(1, 3))
    arr = data.draw(arrays(np.int16, (nb,) + shape))
    p = tmp_path_factory.mktemp("envi") / "t.dat"
    write_envi(arr, str(p), interleave=inter)
    back, _, _ = read_envi(str(p))
    assert np.array_equal(back, arr)


@given(shape=dims, data=st.data())
@SET
def test_bt_roundtrip_property(tmp_path_factory, shape, data):
    from gdal_ray.sources.bt import read_bt, write_bt

    arr = data.draw(arrays(np.float32, shape,
                           elements=st.floats(-1e6, 1e6, width=32)))
    p = tmp_path_factory.mktemp("bt") / "t.bt"
    write_bt(arr, str(p))
    back, _ = read_bt(str(p))
    assert np.array_equal(back, arr)


@given(shape=dims, data=st.data())
@SET
def test_ehdr_roundtrip_property(tmp_path_factory, shape, data):
    from gdal_ray.sources.ehdr import read_ehdr, write_ehdr

    arr = data.draw(arrays(np.int16, shape))
    p = tmp_path_factory.mktemp("ehdr") / "t.bil"
    write_ehdr(arr, str(p))
    back, _, _ = read_ehdr(str(p))
    assert np.array_equal(back[0], arr)


@given(n=st.integers(2, 400), sr=st.sampled_from([8000, 16000, 44100]),
       data=st.data())
@SET
def test_wav_int16_roundtrip_property(n, sr, data):
    from gdal_ray.stages.audio import decode_wav, encode_wav_pcm16

    x = data.draw(arrays(np.int16, (n,)))
    back, sr2 = decode_wav(encode_wav_pcm16(x, sr))
    assert sr2 == sr
    got = np.round(back[:, 0] * 32767.0).astype(np.int16)
    assert np.array_equal(got, x)


@given(shape=st.tuples(st.integers(8, 40), st.integers(8, 40)),
       q=st.integers(50, 95), data=st.data())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_jpeg_roundtrip_property(shape, q, data):
    """Lossy, but decode must succeed, preserve shape and stay within a
    coarse error bound on smooth content."""
    from gdal_ray.raster.jpeg import decode_jpeg, encode_jpeg

    base = data.draw(st.integers(30, 220))
    y = np.linspace(0, 30, shape[0])[:, None]
    x = np.linspace(0, 20, shape[1])[None, :]
    img = np.clip(base + y + x, 0, 255).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=q))
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 12
