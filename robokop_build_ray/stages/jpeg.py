"""Baseline JPEG (SOF0) codec in pure numpy — no codec library.

The last compressed IMAGE format in the multimodal family to get a real
decode path (re-expressing the decode stage the reference defers to
external media tooling; see multimodal.py for the stage plumbing).
Encoder: 8x8 DCT-II, Annex-K quantization scaled by quality, standard
huffman tables, 4:4:4 or 4:2:0 (``subsample=True``). Decoder: marker
parse (DQT/SOF0/DHT/DRI/SOS), huffman + magnitude decode with byte
unstuffing and restart markers, dequantize + IDCT, 4:2:0 chroma
upsample, JFIF YCbCr -> RGB. Raises ValueError on truncation, non-SOF0
frames, or invalid codes — never silently wrong.
"""
from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------- Annex K tables

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag order: index i of ZIGZAG gives the (row-major) position of the
# i-th coefficient in scan order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# standard huffman specs: (bits[1..16] counts, values)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_codes(spec):
    """(bits, values) -> {symbol: (code, length)} (canonical huffman)."""
    bits, values = spec
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(spec):
    """(bits, values) -> {(length, code): symbol}."""
    return {(ln, c): sym for sym, (c, ln) in _build_codes(spec).items()}


# 8x8 DCT-II orthonormal basis
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    M[0] *= 1 / np.sqrt(2)
    return M * 0.5


_DCT = _dct_matrix()


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, additional-bits code)."""
    if v == 0:
        return 0, 0
    size = int(np.int64(abs(v)).item().bit_length())
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_block(bw: _BitWriter, block: np.ndarray, qtbl: np.ndarray,
                  dc_codes, ac_codes, prev_dc: int) -> int:
    """DCT -> quantize -> huffman-code one 8x8 block; returns its DC."""
    coef = _DCT @ block @ _DCT.T
    q = np.round(coef / qtbl.reshape(8, 8)).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size, extra = _magnitude(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(extra, size)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(extra, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (SOF0). 4:4:4 by
    default; ``subsample=True`` emits 4:2:0 (2x2 luma MCUs, chroma
    averaged over 2x2 pixel quads — the common in-the-wild layout)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    qt = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(img) - 128.0
    dc_codes = [_build_codes(DC_LUMA_SPEC), _build_codes(DC_CHROMA_SPEC)]
    ac_codes = [_build_codes(AC_LUMA_SPEC), _build_codes(AC_CHROMA_SPEC)]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    if subsample:
        # pad to 16-multiples: MCU = 4 luma blocks + 1 Cb + 1 Cr
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        luma = pad[:, :, 0]
        # chroma averaged over 2x2 pixel quads
        chroma = pad[:, :, 1:].reshape(ph // 2, 2, pw // 2, 2, 2).mean(
            axis=(1, 3))
        for by in range(0, ph, 16):
            for bx in range(0, pw, 16):
                for sy in range(2):
                    for sx in range(2):
                        blk = luma[by + 8 * sy:by + 8 * sy + 8,
                                   bx + 8 * sx:bx + 8 * sx + 8]
                        prev_dc[0] = _encode_block(
                            bw, blk, qt[0], dc_codes[0], ac_codes[0],
                            prev_dc[0])
                cy, cx = by // 2, bx // 2
                for comp in (0, 1):
                    blk = chroma[cy:cy + 8, cx:cx + 8, comp]
                    prev_dc[comp + 1] = _encode_block(
                        bw, blk, qt[1], dc_codes[1], ac_codes[1],
                        prev_dc[comp + 1])
    else:
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for comp in range(3):
                    t = 0 if comp == 0 else 1
                    blk = pad[by:by + 8, bx:bx + 8, comp]
                    prev_dc[comp] = _encode_block(
                        bw, blk, qt[t], dc_codes[t], ac_codes[t],
                        prev_dc[comp])
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    # APP0/JFIF: version 1.1, no density units, 1x1 density, no thumbnail
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    # DQT x2
    for tid, t in enumerate(qt):
        zz = t.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + zz.tobytes()
    # SOF0: 3 components; luma 2x2 when subsampled, else all 1x1
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    luma_samp = 0x22 if subsample else 0x11
    for cid in range(3):
        out += bytes([cid + 1, luma_samp if cid == 0 else 0x11,
                      0 if cid == 0 else 1])
    # DHT x4
    for marker_id, spec in ((0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC),
                            (0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)):
        bits, values = spec
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), marker_id)
        out += bytes(bits) + bytes(values)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    out += b"\x00\x3F\x00"  # spectral 0..63, approx 0
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                elif 0xD0 <= nxt <= 0xD7:  # RST marker: skip, reset handled
                    self.pos += 1
                    continue
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, dmap) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. Supports SOF0 with
    1x1 sampling everywhere (4:4:4) or 2x2 luma + 1x1 chroma (4:2:0)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    comps = None
    h = w = 0
    scan_comps = None
    data_start = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec_id = seg[p]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                dezz = np.empty(64, dtype=np.int32)
                dezz[ZIGZAG] = tbl
                qts[prec_id & 0x0F] = dezz
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline SOF0 JPEG supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc_id = seg[p]
                bits = list(seg[p + 1:p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17:p + 17 + nvals])
                dmap = _build_decode_map((bits, values))
                if tc_id >> 4 == 0:
                    dc_maps[tc_id & 0x0F] = dmap
                else:
                    ac_maps[tc_id & 0x0F] = dmap
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i:3 + 2 * i]
                scan_comps.append((cid, tables >> 4, tables & 0x0F))
            data_start = pos + seglen
            break
        pos += seglen
    if comps is None or scan_comps is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(cx for _, cx, _, _ in comps)
    vmax = max(cy for _, _, cy, _ in comps)
    if not ((hmax, vmax) == (1, 1)
            or (hmax, vmax) == (2, 2)):
        raise ValueError("unsupported sampling layout")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # strip trailing EOI for the bit reader
    entropy = payload[data_start:]
    br = _BitReader(entropy)
    planes = []
    for cid, cx, cy, qid in comps:
        pw_ = mcus_x * 8 * cx
        ph_ = mcus_y * 8 * cy
        planes.append(np.zeros((ph_, pw_), dtype=np.float64))
    prev_dc = [0] * len(comps)
    tbl_for = {cid: (dc, ac) for cid, dc, ac in scan_comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # RST markers are skipped inside the bit reader; reset DC
                br.acc = 0
                br.nbits = 0
                prev_dc = [0] * len(comps)
            n_mcu += 1
            for ci, (cid, cx, cy, qid) in enumerate(comps):
                dc_map = dc_maps[tbl_for[cid][0]]
                ac_map = ac_maps[tbl_for[cid][1]]
                for sy in range(cy):
                    for sx in range(cx):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.huff(dc_map)
                        diff = _extend(br.read(size), size) if size else 0
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_map)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qts[qid][ZIGZAG]
                        blk = _DCT.T @ coef.reshape(8, 8) @ _DCT
                        py = (my * cy + sy) * 8
                        px = (mx * cx + sx) * 8
                        planes[ci][py:py + 8, px:px + 8] = blk
    # upsample chroma to luma grid, crop, recombine
    out = np.zeros((h, w, 3), dtype=np.float64)
    for ci, (cid, cx, cy, qid) in enumerate(comps):
        p = planes[ci] + 128.0
        if cx < hmax or cy < vmax:
            p = np.repeat(np.repeat(p, vmax // cy, axis=0), hmax // cx, axis=1)
        out[:, :, ci] = p[:h, :w]
    if len(comps) == 1:
        g = np.clip(out[:, :, 0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(out)
