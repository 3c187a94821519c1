"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) decoder — from
scratch, dependency-free, faithful to libjpeg's INTEGER arithmetic so
decoded pixels are bit-comparable to the reference's JPEG driver
(frmts/jpeg wraps libjpeg; autotest jpeg.py pins GDALChecksumImage
values per libjpeg generation).

Fidelity choices (all public libjpeg algorithms):
- IDCT: jidctint.c "islow" — 13-bit fixed-point Loeffler/AAN network,
  PASS1_BITS=2, DESCALE rounding; vectorized here over ALL blocks of a
  component at once (int64 numpy, exact).
- Upsampling: jdsample.c fancy (triangular) h2v1/h2v2 kernels, edge
  replication, exact integer rounding; plus the simple replication
  kernels for cross-checking.
- Color: jdcolor.c 16-bit fixed-point YCbCr->RGB tables with ONE_HALF
  rounding and sample clamp.

Scope: baseline sequential only (SOF0), 8-bit, grayscale or 3-component
YCbCr, restart markers supported. Progressive (SOF2) and arithmetic
coding raise NotImplementedError — the multimodal decode boundary
documents the escape hatch.

Entropy decoding is a per-block Python loop (inherently sequential
bitstream); everything after the coefficient tables is vectorized
numpy. Fine for the actor-pool decode stage where each worker handles
whole payloads.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# jidctint.c CONST_BITS=13 constants
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172
_CONST_BITS = 13
_PASS1_BITS = 2


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _idct_pass(v0, v1, v2, v3, v4, v5, v6, v7, shift):
    """One islow butterfly pass over stacked vectors (int64 arrays).
    Inputs are the 8 spectral lines; returns the 8 spatial lines, each
    DESCALEd by `shift`."""
    z2, z3 = v2, v6
    z1 = (z2 + z3) * _F_0_541196100
    tmp2 = z1 + z3 * (-_F_1_847759065)
    tmp3 = z1 + z2 * _F_0_765366865
    tmp0 = (v0 + v4) << _CONST_BITS
    tmp1 = (v0 - v4) << _CONST_BITS
    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2
    t0, t1, t2, t3 = v7, v5, v3, v1
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * _F_1_175875602
    t0 = t0 * _F_0_298631336
    t1 = t1 * _F_2_053119869
    t2 = t2 * _F_3_072711026
    t3 = t3 * _F_1_501321110
    z1 = z1 * (-_F_0_899976223)
    z2 = z2 * (-_F_2_562915447)
    z3 = z3 * (-_F_1_961570560) + z5
    z4 = z4 * (-_F_0_390180644) + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4
    return (_descale(tmp10 + t3, shift), _descale(tmp11 + t2, shift),
            _descale(tmp12 + t1, shift), _descale(tmp13 + t0, shift),
            _descale(tmp13 - t0, shift), _descale(tmp12 - t1, shift),
            _descale(tmp11 - t2, shift), _descale(tmp10 - t3, shift))


def _idct_islow_blocks(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag-order int coefficients -> (n, 8, 8) uint8 samples.
    Exact jidctint.c integer arithmetic, vectorized across blocks."""
    n = coefs.shape[0]
    dq = (coefs.astype(np.int64) * quant[None, :])
    blk = np.zeros((n, 64), np.int64)
    blk[:, ZIGZAG] = dq  # de-zigzag into natural order
    blk = blk.reshape(n, 8, 8)
    # pass 1: columns (process each column vector across blocks)
    cols = [blk[:, i, :] for i in range(8)]  # row i of each block
    # jidctint processes columns first: spectral index = row index
    p = _idct_pass(cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                   cols[6], cols[7], _CONST_BITS - _PASS1_BITS)
    ws = np.stack(p, axis=1)  # (n, 8, 8) workspace, rows = spatial y
    # pass 2: rows
    rows = [ws[:, :, i] for i in range(8)]
    q = _idct_pass(rows[0], rows[1], rows[2], rows[3], rows[4], rows[5],
                   rows[6], rows[7], _CONST_BITS + _PASS1_BITS + 3)
    out = np.stack(q, axis=2)  # (n, 8, 8)
    return np.clip(out + 128, 0, 255).astype(np.uint8)


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad per spec
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # marker: stop feeding real data, pad with 1s
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def align_to_marker(self):
        """Drop buffered bits and return pos of the next marker byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        self.pos = p
        return p


def _build_huff(bits: list[int], vals: bytes):
    """(length-counts, values) -> dict {(nbits, code): value} plus a
    fast two-level: max length table not needed at this scale."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.get(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _h2v1_fancy(comp: np.ndarray) -> np.ndarray:
    """jdsample.c h2v1_fancy_upsample, vectorized. (h, w) -> (h, 2w)."""
    h, w = comp.shape
    x = comp.astype(np.int64)
    out = np.empty((h, 2 * w), np.int64)
    tri = 3 * x
    left = np.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    out[:, 0::2] = (tri + left + 1) >> 2
    out[:, 1::2] = (tri + right + 2) >> 2
    out[:, 0] = x[:, 0]
    out[:, -1] = x[:, -1]
    return out.astype(np.uint8)


def _h2v2_fancy(comp: np.ndarray) -> np.ndarray:
    """jdsample.c h2v2_fancy_upsample, vectorized. (h, w) -> (2h, 2w)."""
    h, w = comp.shape
    x = comp.astype(np.int64)
    up = np.concatenate([x[:1], x[:-1]], axis=0)
    down = np.concatenate([x[1:], x[-1:]], axis=0)
    out = np.empty((2 * h, 2 * w), np.int64)
    for half, near in ((0, up), (1, down)):
        colsum = 3 * x + near          # (h, w)
        last = np.concatenate([colsum[:, :1], colsum[:, :-1]], axis=1)
        nxt = np.concatenate([colsum[:, 1:], colsum[:, -1:]], axis=1)
        even = (colsum * 3 + last + 8) >> 4
        odd = (colsum * 3 + nxt + 7) >> 4
        even[:, 0] = (colsum[:, 0] * 4 + 8) >> 4
        odd[:, -1] = (colsum[:, -1] * 4 + 7) >> 4
        out[half::2, 0::2] = even
        out[half::2, 1::2] = odd
    return out.astype(np.uint8)


def _simple_upsample(comp: np.ndarray, hs: int, vs: int) -> np.ndarray:
    return np.repeat(np.repeat(comp, vs, axis=0), hs, axis=1)


_SCALE = 16
_HALF = 1 << (_SCALE - 1)


def _fix(x: float) -> int:
    return int(x * (1 << _SCALE) + 0.5)


def _ycc_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """jdcolor.c integer tables."""
    i = np.arange(256, dtype=np.int64)
    x = i - 128
    crr = (_fix(1.40200) * x + _HALF) >> _SCALE
    cbb = (_fix(1.77200) * x + _HALF) >> _SCALE
    crg = -_fix(0.71414) * x
    cbg = -_fix(0.34414) * x + _HALF
    yv = y.astype(np.int64)
    r = yv + crr[cr]
    g = yv + ((cbg[cb] + crg[cr]) >> _SCALE)
    b = yv + cbb[cb]
    return (np.clip(r, 0, 255).astype(np.uint8),
            np.clip(g, 0, 255).astype(np.uint8),
            np.clip(b, 0, 255).astype(np.uint8))


def decode_jpeg(buf: bytes, *, fancy_upsampling: bool = True) -> np.ndarray:
    """Decode baseline JPEG bytes to (h, w) uint8 (grayscale) or
    (h, w, 3) uint8 RGB."""
    if buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = None
    size = None
    restart_interval = 0
    pos = 2
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        m = buf[pos + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (seg,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        body = buf[pos + 4:pos + 2 + seg]
        if m == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq:
                    q = np.frombuffer(body[o + 1:o + 129], ">u2")
                    o += 129
                else:
                    q = np.frombuffer(body[o + 1:o + 65], np.uint8)
                    o += 65
                qt[tq] = q.astype(np.int64)
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1:o + 17])
                nv = sum(bits)
                vals = body[o + 17:o + 17 + nv]
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_huff(bits,
                                                                    vals)
                o += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            hgt, wid = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": body[8 + 3 * c]})
            size = (hgt, wid)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0}: only baseline sequential decodes")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for c in range(ns):
                cs = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 15)
            data_pos = pos + 2 + seg
            return _decode_scan(buf, data_pos, comps, sel, qt, dc_tabs,
                                ac_tabs, size, restart_interval,
                                fancy_upsampling)
        pos += 2 + seg
    raise ValueError("no SOS marker")


def _decode_scan(buf, data_pos, comps, sel, qt, dc_tabs, ac_tabs, size,
                 restart_interval, fancy):
    hgt, wid = size
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-wid // (8 * hmax))
    mcuy = -(-hgt // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]          # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["dc_t"], c["ac_t"] = sel[c["id"]]
        c["pred"] = 0

    br = _BitReader(buf, data_pos)
    n_mcu = mcux * mcuy
    truncated = False
    for mi in range(n_mcu):
        if truncated:
            break
        if restart_interval and mi and mi % restart_interval == 0:
            p = br.align_to_marker()
            if 0xD0 <= buf[p + 1] <= 0xD7:
                br.pos = p + 2
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcux)
        try:
            for c in comps:
                dct = dc_tabs[c["dc_t"]]
                act = ac_tabs[c["ac_t"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int64)
                        t = _huff_decode(br, dct)
                        diff = _extend(br.get(t), t) if t else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            blk[k] = _extend(br.get(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk
        except ValueError:
            if br.pos >= len(buf) - 2:
                # truncated stream: keep what decoded (libjpeg emits a
                # warning and pads the remaining rows)
                truncated = True
            else:
                raise

    planes = []
    for c in comps:
        sam = _idct_islow_blocks(c["coef"], qt[c["tq"]])
        # assemble blocks into the component plane
        plane = sam.reshape(c["bh"], c["bw"], 8, 8).transpose(
            0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        cw = -(-wid * c["h"] // hmax)
        ch = -(-hgt * c["v"] // vmax)
        plane = plane[:ch, :cw]
        hs, vs = hmax // c["h"], vmax // c["v"]
        if hs == 1 and vs == 1:
            pass
        elif fancy and hs == 2 and vs == 1:
            plane = _h2v1_fancy(plane)
        elif fancy and hs == 2 and vs == 2:
            plane = _h2v2_fancy(plane)
        else:
            plane = _simple_upsample(plane, hs, vs)
        planes.append(plane[:hgt, :wid])

    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        r, g, b = _ycc_to_rgb(planes[0], planes[1], planes[2])
        return np.stack([r, g, b], axis=2)
    if len(planes) == 4:
        # Adobe CMYK (APP14 transform 0: raw, inverted-ink convention).
        # The reference exposes RGB as band = component * K / 255
        # (frmts/jpeg jpgdataset.cpp CMYK->RGB), which we mirror; YCCK
        # (transform 2) would first need the YCC inverse and is not in
        # the fixture set.
        c, m, y, k = (p.astype(np.int64) for p in planes)
        r = (c * k) // 255
        g = (m * k) // 255
        b = (y * k) // 255
        return np.stack([r, g, b], axis=2).astype(np.uint8)
    raise NotImplementedError(f"{len(planes)}-component JPEG")


# ---------------------------------------------------------------------------
# baseline encoder (grayscale or 4:4:4 RGB, Annex K tables)
# ---------------------------------------------------------------------------

# ITU-T T.81 Annex K.1 base quantization tables (natural order)
_K_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_K_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS list, HUFFVAL bytes)
_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              bytes(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                bytes(range(12)))
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg jcparam.c quality scaling."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted float -> (n, 8, 8) DCT-II coefficients
    (orthonormal scaling matching T.81)."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    C[0] *= 1.0 / np.sqrt(2.0)
    return np.einsum("ux,nxy,vy->nuv", C, blocks, C)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int):
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _enc_table(spec):
    bits, vals = spec
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_component_blocks(bw, coefs, dc_codes, ac_codes, pred):
    for blk in coefs:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _csize(diff)
        c, ln = dc_codes[s]
        bw.put(c, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        # AC
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.put(c, ln)
                run -= 16
            s = _csize(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.put(c, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]
            bw.put(c, ln)
    return pred


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to baseline JPEG
    (4:4:4, Annex K quant scaled by `quality` + typical Huffman tables).
    Round-trips through decode_jpeg within quantization error."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qlum = _scaled_quant(_K_LUMA_Q, quality)
    qchr = _scaled_quant(_K_CHROMA_Q, quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [y, cb, cr]

    bh, bwid = -(-h // 8), -(-w // 8)
    all_coefs = []
    for pi, plane in enumerate(planes):
        pad = np.pad(plane, ((0, bh * 8 - h), (0, bwid * 8 - w)),
                     mode="edge") - 128.0
        blocks = pad.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        co = _fdct_blocks(blocks)
        q = (qlum if pi == 0 else qchr).reshape(8, 8)
        co = np.round(co / q).astype(np.int64)
        zz = co.reshape(-1, 64)[:, ZIGZAG]  # natural -> zigzag
        all_coefs.append(zz)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, q):
        zzq = q[ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in zzq)

    out += dqt(0, qlum)
    if not gray:
        out += dqt(1, qchr)
    nc = 1 if gray else 3
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += sof

    def dht(tc, th, spec):
        bits, vals = spec
        return b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + vals

    out += dht(0, 0, _K_DC_LUMA) + dht(1, 0, _K_AC_LUMA)
    if not gray:
        out += dht(0, 1, _K_DC_CHROMA) + dht(1, 1, _K_AC_CHROMA)

    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += sos

    bw2 = _BitWriter()
    dc_l = _enc_table(_K_DC_LUMA)
    ac_l = _enc_table(_K_AC_LUMA)
    dc_c = _enc_table(_K_DC_CHROMA)
    ac_c = _enc_table(_K_AC_CHROMA)
    preds = [0] * nc
    # 4:4:4 MCU = one block per component, interleaved in block order
    n_blocks = bh * bwid
    for bi in range(n_blocks):
        for ci in range(nc):
            preds[ci] = _encode_component_blocks(
                bw2, all_coefs[ci][bi:bi + 1],
                dc_l if ci == 0 else dc_c,
                ac_l if ci == 0 else ac_c, preds[ci])
    bw2.flush()
    out += bw2.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_mask(buf: bytes):
    """GDAL's appended-mask convention (frmts/jpeg/jpgdataset.cpp): a
    zlib-compressed 1-bit-per-pixel bitmap (LSB-first within each byte)
    follows EOI, and the file's final 4 bytes are the little-endian
    offset of the mask stream. Returns a (h, w) uint8 mask (0/255), or
    None when the file carries no mask."""
    import zlib

    if len(buf) < 8:
        return None
    (off,) = struct.unpack("<I", buf[-4:])
    if not (2 < off < len(buf) - 4):
        return None
    img = decode_jpeg(buf)
    h, w = img.shape[:2]
    try:
        mask = zlib.decompress(buf[off:-4])
    except zlib.error:
        return None
    if len(mask) < (w * h + 7) // 8:
        return None
    bits = np.unpackbits(np.frombuffer(mask, np.uint8),
                         bitorder="little")[:w * h]
    return (bits.reshape(h, w) * np.uint8(255))
