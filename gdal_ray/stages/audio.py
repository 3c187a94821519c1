"""Audio columns: a REAL dependency-free WAV (RIFF PCM) codec + DSP
feature extraction as actor-pool stages.

Upgrades the multimodal codec boundary (stages/multimodal.py) for audio
the same way raster/png.py did for images: `wav-pcm16` payloads are
genuine RIFF/WAVE files (chunk-parsed on decode, not trusted offsets),
so the decode -> feature path exercises a real binary format end-to-end.
Compressed codecs (mp3/ogg/aac) still need external libraries and keep
the documented NotImplementedError escape hatch.

Features are classic public DSP: RMS energy, zero-crossing rate,
spectral centroid and dominant frequency (rfft) — the standard cheap
signals an audio curation pipeline filters on before expensive model
scoring.

Memory note: audio payloads are WIDE rows; stages default to small
explicit batch budgets like the image stages.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["encode_wav_pcm16", "decode_wav", "synth_audio_column",
           "AudioStage", "audio_features"]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono/stereo float [-1, 1] or int16 -> RIFF/WAVE PCM16 bytes."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    if x.dtype != np.int16:
        x = np.clip(np.round(np.asarray(x, np.float64) * 32767.0),
                    -32768, 32767).astype("<i2")
    else:
        x = x.astype("<i2")
    data = x.tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                             byte_rate, n_ch * 2, 16),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16/PCM8 -> (float64 samples in [-1, 1] shaped
    (n, channels), sample_rate). Walks the chunk list (fmt may not
    directly precede data; extra chunks are skipped), so real-world WAV
    files decode, not just our own encoder's output."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, sr, _rate, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_fmt}: only PCM decodes without an "
            "audio library")
    if bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32767.0
    elif bits == 8:  # PCM8 is unsigned, midpoint 128
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) \
            / 127.0
    else:
        raise NotImplementedError(f"PCM{bits} unsupported")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), sr


def _decode_audio(buf: bytes, fmt: str, sr_meta: int) -> tuple[np.ndarray,
                                                               int]:
    """Codec boundary: wav-pcm16 and raw-f32 decode FOR REAL; compressed
    codecs need an external library (documented escape hatch)."""
    if fmt == "wav-pcm16":
        x, sr = decode_wav(bytes(buf))
        return x.mean(axis=1), sr  # downmix to mono for features
    if fmt == "raw-f32":
        return np.frombuffer(buf, "<f4").astype(np.float64), sr_meta
    raise NotImplementedError(
        f"codec {fmt!r}: real decode requires an audio library (ffmpeg/"
        "libsndfile); plug it into AudioStage")


def synth_audio_column(ds, *, id_col: str, sample_rate: int = 8000,
                       n_samples: int = 2048, fmt: str = "wav-pcm16"):
    """Attach a deterministic audio payload + metadata — a per-id mixture
    of two tones whose frequencies derive from the id. fmt='wav-pcm16'
    stores REAL RIFF/WAVE bytes so the decode path parses a genuine
    container format."""
    if fmt not in ("wav-pcm16", "raw-f32"):
        raise ValueError("fmt must be 'wav-pcm16' or 'raw-f32'")

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tt = np.arange(n_samples, dtype=np.float64) / sample_rate
        payloads = []
        for i in ids:
            f1 = 200.0 + float(i % 13) * 150.0
            f2 = 300.0 + float(i % 7) * 250.0
            x = 0.6 * np.sin(2 * np.pi * f1 * tt) \
                + 0.3 * np.sin(2 * np.pi * f2 * tt)
            if fmt == "wav-pcm16":
                payloads.append(encode_wav_pcm16(x, sample_rate))
            else:
                payloads.append(x.astype("<f4").tobytes())
        t = t.append_column("audio", pa.array(payloads, pa.binary()))
        t = t.append_column("sample_rate",
                            pa.array(np.full(len(ids), sample_rate,
                                             np.int32)))
        t = t.append_column("audio_format",
                            pa.array([fmt] * len(ids), pa.string()))
        return t

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


class AudioStage:
    """Actor-pool stage: decode -> duration/RMS/zero-crossing-rate/
    spectral-centroid/dominant-frequency per clip. Payload dropped at the
    decode boundary (features flow on, wide bytes do not)."""

    def __init__(self, *, audio_col: str = "audio"):
        self.col = audio_col

    def __call__(self, t: pa.Table) -> pa.Table:
        fmts = t["audio_format"].to_pylist()
        srs = t["sample_rate"].to_numpy(zero_copy_only=False)
        dur, rms, zcr, cent, dom = [], [], [], [], []
        for i, buf in enumerate(t[self.col].to_pylist()):
            x, sr = _decode_audio(buf, fmts[i], int(srs[i]))
            n = len(x)
            dur.append(n / sr)
            rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) !=
                                     np.signbit(x[:-1]))) if n > 1 else 0.0)
            if n:
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                tot = spec.sum()
                cent.append(float((freqs * spec).sum() / tot)
                            if tot > 0 else 0.0)
                dom.append(float(freqs[int(np.argmax(spec))]))
            else:
                cent.append(0.0)
                dom.append(0.0)
        out = t.drop_columns([self.col])
        out = out.append_column("audio_dur_s", pa.array(dur))
        out = out.append_column("audio_rms", pa.array(rms))
        out = out.append_column("audio_zcr", pa.array(zcr))
        out = out.append_column("audio_centroid_hz", pa.array(cent))
        out = out.append_column("audio_dominant_hz", pa.array(dom))
        return out


def audio_features(ds, *, concurrency=(1, 4), batch_size: int = 256):
    """Wired pipeline: small batches (wide binary rows), actor pool,
    payload dropped at decode."""
    return ds.map_batches(AudioStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
