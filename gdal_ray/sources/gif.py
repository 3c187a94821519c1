"""GIF reader — from-scratch GIF87a/89a decode (LZW, interlacing,
local/global palettes).

Reference: frmts/gif (GDAL wraps giflib and exposes the FIRST image's
palette INDICES as band 1 plus a color table). Parity gate: the
reference's own fixture decodes to its pinned checksum
(autotest/gdrivers/gif.py:48 bug407.gif band 1 = 57921).

The LZW decompressor is the standard variable-code-width dictionary
decoder (public algorithm); interlaced images de-interlace with the
4-pass row schedule from the GIF89a spec.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_gif", "read_gif_tiles"]


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # dictionary as (prefix_code, tail_byte); roots are implicit
    prefix = np.full(4096, -1, np.int32)
    tail = np.zeros(4096, np.uint8)
    next_code = end + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    buf = np.empty(4096, np.uint8)  # expansion scratch (max string len)

    def expand(code):
        n = 0
        c = code
        while c >= clear:
            buf[n] = tail[c]
            n += 1
            c = prefix[c]
        buf[n] = c
        n += 1
        return buf[:n][::-1]

    while n_out < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                return out[:n_out]  # truncated stream: keep decoded rows
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            next_code = end + 1
            code_size = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            s = expand(code)
        elif code < next_code:
            s = expand(code)
            if next_code < 4096:
                prefix[next_code] = prev
                tail[next_code] = s[0]
                next_code += 1
        else:  # KwKwK case
            ps = expand(prev)
            s = np.concatenate([ps, ps[:1]])
            if next_code < 4096:
                prefix[next_code] = prev
                tail[next_code] = ps[0]
                next_code += 1
        take = min(len(s), n_pixels - n_out)
        out[n_out:n_out + take] = s[:take]
        n_out += take
        if next_code >= (1 << code_size) and code_size < 12:
            code_size += 1
        prev = code
    return out[:n_out]


def read_gif(path: str):
    """First image frame -> (index array (h, w) uint8, palette
    (n, 3) uint8)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = buf[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(buf[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3).copy()
        pos += 3 * n
    while pos < len(buf):
        b = buf[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(buf[pos + 5:pos + 7], "little")
            h = int.from_bytes(buf[pos + 7:pos + 9], "little")
            iflags = buf[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(buf[pos:pos + 3 * n],
                                    np.uint8).reshape(n, 3).copy()
                pos += 3 * n
            min_code = buf[pos]
            pos += 1
            chunks = []
            while buf[pos] != 0:
                ln = buf[pos]
                chunks.append(buf[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if len(idx) < w * h:
                idx = np.concatenate(
                    [idx, np.zeros(w * h - len(idx), np.uint8)])
            img = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row schedule
                de = np.empty_like(img)
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                de[order] = img
                img = de
            return img, (pal if pal is not None
                         else np.zeros((2, 3), np.uint8))
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image")


def read_gif_tiles(path: str, *, tile: int = 256):
    """open_source driver: palette-index tile fan (band 1 = indices,
    like the reference's GIF driver)."""
    import pyarrow as pa
    import ray.data as rd

    img, pal = read_gif(path)
    h, w = img.shape
    rows = {"tile_x": [], "tile_y": [], "w": [], "h": [], "data": []}
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            piece = img[ty:ty + tile, tx:tx + tile]
            rows["tile_x"].append(tx // tile)
            rows["tile_y"].append(ty // tile)
            rows["w"].append(piece.shape[1])
            rows["h"].append(piece.shape[0])
            rows["data"].append(np.ascontiguousarray(piece).tobytes())
    return rd.from_arrow(pa.table({
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "data": pa.array(rows["data"], pa.binary()),
    }))
