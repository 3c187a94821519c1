"""Minimal pure-NumPy PNG codec (stdlib zlib only) for the tile sink.

The reference's tile pipeline writes ENCODED image payloads — PNG / JPEG
/ WebP (apps/gdalalg_raster_tile.cpp chooses the driver per format
argument) — while our WebMercator tile sink emitted raw arrays. This
closes the payload-encode gap without any image library: a spec-complete
subset writer (8-bit grayscale / gray+alpha / RGB / RGBA and 16-bit
grayscale, filter type 0, one IDAT chunk, fixed zlib level) plus a
matching reader for round-trips. Fixed filter + compression settings
make the emitted bytes DETERMINISTIC, so encoded tiles can be
golden-pinned like every other tile artifact (FIXTURES.md §5 pattern).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color types: 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA
_CHANNELS_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, *, level: int = 6) -> bytes:
    """Encode an image array to PNG bytes.

    arr: (H, W) or (H, W, C) with C in 1..4; dtype uint8, or uint16 for
    single-channel (16-bit grayscale, network byte order per the spec).
    """
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _CHANNELS_TO_COLOR:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w, c = a.shape
    if a.dtype == np.uint8:
        depth = 8
    elif a.dtype == np.uint16:
        if c != 1:
            raise ValueError("16-bit PNG supported for grayscale only")
        depth = 16
        a = a.astype(">u2")
    else:
        raise ValueError(f"unsupported dtype {a.dtype} (uint8/uint16)")
    color = _CHANNELS_TO_COLOR[c]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    raw = a.tobytes()
    stride = w * c * (depth // 8)
    # filter byte 0 (None) prepended to every scanline
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride)
    filtered = np.concatenate(
        [np.zeros((h, 1), np.uint8), lines], axis=1).tobytes()
    comp = zlib.compressobj(level, zlib.DEFLATED, 15, 8,
                            zlib.Z_DEFAULT_STRATEGY)
    idat = comp.compress(filtered) + comp.flush()
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(data: bytes, *, return_palette: bool = False):
    """Decode baseline (non-interlaced) PNG bytes: all five scanline
    filters, color types 0/2/3/4/6, bit depths 1/2/4/8/16. Palette
    images return the INDEX array (band semantics matching the
    reference's PNG driver); pass return_palette=True to also get the
    (n, 3) palette (None for non-paletted). Filters 1/3/4 have inherent
    per-pixel dependencies and decode in a Python loop per row — fine
    for fixtures and tile payloads; the engine's own tiles encode with
    filter 0 and stay vectorized."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = b""
    plte = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3).copy()
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp_m, filt_m, interlace = ihdr
    if comp_m or filt_m:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG")
    c = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bits_pp = c * depth
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)  # filter byte distance
    raw = zlib.decompress(idat)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            line += prev
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) \
                    & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else cc)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unsupported filter {f}")
        out[y] = line
        prev = line
    if depth == 16:
        img = out.reshape(h, w, c, 2)
        a = (img[..., 0].astype(np.uint16) << 8) | img[..., 1]
    elif depth == 8:
        a = out.reshape(h, w, c)
    else:  # 1/2/4-bit packed, MSB-first (gray or palette indices)
        bits = np.unpackbits(out, axis=1)
        per = depth
        vals = np.zeros((h, stride * 8 // per), np.uint8)
        for k in range(per):
            vals = (vals << 1) | bits[:, k::per][:, :vals.shape[1]]
        a = vals[:, :w].reshape(h, w, 1)
    res = a[:, :, 0] if c == 1 else a
    if return_palette:
        return res, (plte if color == 3 else None)
    return res
