"""WAV codec + audio feature stage: round-trip vs the stdlib wave module,
chunk-walking robustness, and DSP feature sanity on known signals."""

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.audio import (AudioStage, audio_features, decode_wav,
                                   encode_wav_pcm16, synth_audio_column)
from gdal_ray.util import to_arrow


def test_wav_roundtrip_matches_stdlib():
    sr = 8000
    t = np.arange(1024) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    buf = encode_wav_pcm16(x, sr)
    # stdlib wave must parse our bytes identically
    with wave.open(io.BytesIO(buf)) as w:
        assert w.getframerate() == sr
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        ref = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    got, sr2 = decode_wav(buf)
    assert sr2 == sr
    assert got.shape == (1024, 1)
    assert np.array_equal(np.round(got[:, 0] * 32767.0).astype(np.int16),
                          ref)


def test_wav_decode_skips_extra_chunks():
    sr = 4000
    x = np.linspace(-1, 1, 64)
    buf = bytearray(encode_wav_pcm16(x, sr))
    # splice a LIST chunk (odd size -> word-aligned) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(buf[:fmt_end]) + extra + bytes(buf[fmt_end:])
    # patch RIFF size
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    got, sr2 = decode_wav(spliced)
    assert sr2 == sr and len(got) == 64


def test_wav_stereo_and_errors():
    sr = 8000
    x = np.stack([np.ones(16) * 0.5, -np.ones(16) * 0.5], axis=1)
    got, _ = decode_wav(encode_wav_pcm16(x, sr))
    assert got.shape == (16, 2)
    assert np.allclose(got[:, 0], 0.5, atol=1e-4)
    assert np.allclose(got[:, 1], -0.5, atol=1e-4)
    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes that are not RIFF")


def test_audio_features_known_signal(ray_session):
    # a pure 440 Hz tone through the full synth->encode->decode->feature
    # path: dominant frequency lands on 440 within one FFT bin
    sr, n = 8000, 2048
    t = np.arange(n) / sr
    x = 0.7 * np.sin(2 * np.pi * 440 * t)
    tbl = pa.table({"id": [1], "audio": [encode_wav_pcm16(x, sr)],
                    "sample_rate": pa.array([sr], pa.int32()),
                    "audio_format": ["wav-pcm16"]})
    out = to_arrow(audio_features(rd.from_arrow(tbl), concurrency=(1, 1)))
    bin_hz = sr / n
    assert abs(out["audio_dominant_hz"][0].as_py() - 440.0) <= bin_hz
    assert abs(out["audio_rms"][0].as_py() - 0.7 / np.sqrt(2)) < 1e-3
    assert abs(out["audio_dur_s"][0].as_py() - n / sr) < 1e-9
    # 440 Hz crosses zero 2*440 times/sec -> zcr ~ 880/sr
    assert abs(out["audio_zcr"][0].as_py() - 2 * 440 / sr) < 0.01
    assert "audio" not in out.column_names  # payload dropped at decode


def test_synth_audio_pipeline(ray_session):
    ds = rd.from_arrow(pa.table({"id": list(range(12))})).repartition(2)
    wired = audio_features(synth_audio_column(ds, id_col="id"),
                           concurrency=(1, 2))
    out = to_arrow(wired)
    out = out.take(pa.compute.sort_indices(out["id"]))
    assert out.num_rows == 12
    doms = out["audio_dominant_hz"].to_numpy()
    # id 0 mixes 200 Hz (amp .6) + 300 Hz (amp .3): dominant ~200
    assert abs(doms[0] - 200.0) <= 8000 / 2048 + 1e-9
    # deterministic across runs
    out2 = to_arrow(audio_features(synth_audio_column(ds, id_col="id"),
                                   concurrency=(1, 2)))
    out2 = out2.take(pa.compute.sort_indices(out2["id"]))
    assert out.equals(out2)
