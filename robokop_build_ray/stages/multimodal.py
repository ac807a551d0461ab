"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Payloads stay ``binary`` end-to-end (Arrow batches, never pandas object
columns); per-item work happens in an actor pool whose codec/model state is
created once in ``__init__``; ``batch_size`` stays small so
payload x batch x concurrency fits worker heaps (SURVEY §4.2 memory note).

Decode story (honest split):
- REAL pure-numpy codecs, no codec library needed: P6 PPM images
  (``decode_ppm``/``encode_ppm``), RIFF/WAVE mono audio in both PCM16 and
  G.711 mu-law companding (``decode_wav``/``encode_wav``/
  ``encode_wav_mulaw``), PNG via zlib inflate (``decode_png``/
  ``encode_png``: all five row filters, 8-bit gray/RGB/RGBA, CRC checks),
  static GIF87a/89a via a from-scratch LZW coder (``decode_gif``/
  ``encode_gif``: variable-width codes, dictionary overflow resets,
  interlace de-scramble, local/global color tables), and baseline JPEG
  via a from-scratch DCT + huffman codec (``stages/jpeg.py``: SOF0,
  4:4:4 and 4:2:0, restart markers). Features and thumbnails computed
  from these are exact, tested values.
- Video decodes for real in BOTH containers: RIFF/AVI Motion-JPEG
  (``decode_avi_mjpeg``) and ISO-BMFF mp4 (``decode_mp4_mjpeg``: box
  walker, mvhd/tkhd headers, full stsc/stco/stsz sample-table
  resolution, each sample a standalone baseline JPEG).
- Formats this module has NO codec for (e.g. ``video/webm``) hit a
  clearly-marked STUB: ``strict=True`` raises NotImplementedError on
  first contact, else a deterministic fake feature (blake2b of payload)
  keeps the plumbing testable end-to-end. Swapping a stub for a real
  codec changes ONE method, not the pipeline shape.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

# baseline JPEG codec (DCT + huffman, pure numpy) lives in its own module
from .jpeg import decode_jpeg, encode_jpeg

JPEG_MIME = "image/jpeg"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        # exact int64 signal stats of the DECODED audio samples (0 for
        # non-audio rows): generator-side ground truth for the
        # decode-and-recompute probe (media_audio_autocorr)
        ("energy", pa.int64()),
        ("ac_lag1", pa.int64()),
    ]
)

FEATURE_DIM = 16
PPM_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/wav"
WAV_RATE = 8000


# --------------------------------------------------- real numpy codecs

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM bytes -> (h, w, 3) uint8. Pure numpy, no codec lib."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    parts, pos = [], 2
    while len(parts) < 3:
        while payload[pos] in b" \t\r\n":
            pos += 1
        if payload[pos] in b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while payload[end] not in b" \t\r\n":
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 mono samples -> canonical 44-byte-header RIFF/WAVE PCM bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE mono bytes -> (int16 samples, sample_rate).

    Handles PCM16 (format 1) and G.711 mu-law (format 7, a REAL 2:1
    compressed audio codec decoded here without any codec library —
    codewords are expanded to int16 PCM)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt, ch, rate, bits = struct.unpack("<HHIxxxxxxH", payload[20:36])
    if payload[36:40] != b"data":
        raise ValueError("non-canonical WAV chunk layout")
    (n_bytes,) = struct.unpack("<I", payload[40:44])
    if (fmt, ch, bits) == (1, 1, 16):
        return np.frombuffer(payload, dtype=np.int16, count=n_bytes // 2,
                             offset=44), rate
    if (fmt, ch, bits) == (7, 1, 8):
        codes = np.frombuffer(payload, dtype=np.uint8, count=n_bytes,
                              offset=44)
        return mulaw_expand(codes), rate
    raise ValueError("only PCM16 or mu-law mono supported")


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """G.711 mu-law companding: int16 PCM -> uint8 codewords (bias-33
    segmented-log form; clips magnitude at 32635 per the spec)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + 132
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law expansion: uint8 codewords -> int16 PCM."""
    u = (~codes.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 132) << exp
    x = mag - 132
    return np.where(sign, -x, x).astype(np.int16)


def encode_wav_mulaw(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 mono samples -> RIFF/WAVE G.711 mu-law bytes (format 7,
    1 byte/sample — half the size of PCM16; companding is lossy but
    value-idempotent: expand(compress(expand(c))) == expand(c))."""
    assert samples.dtype == np.int16
    data = mulaw_compress(samples).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 7, 1,
        rate, rate, 1, 8, b"data", len(data),
    )
    return hdr + data


PNG_MIME = "image/png"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """(h, w, 3) uint8 -> real PNG bytes (8-bit RGB, non-interlaced, one
    zlib-compressed IDAT). ``filters`` optionally picks the per-row filter
    (0..4) — the default 0 is what a minimal encoder writes; other values
    exist to exercise every decoder filter path in tests. Pure
    zlib + struct + numpy, no codec library."""
    import zlib

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    if filters is None:
        filters = [0] * h
    stride = w * 3
    prev = np.zeros(stride, dtype=np.int64)
    parts = []
    for r in range(h):
        f = filters[r]
        cur = img[r].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
        ul = np.concatenate([np.zeros(3, dtype=np.int64), prev[:-3]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        elif f == 4:
            pred = np.fromiter(
                (_paeth_predict(int(a), int(b), int(cc))
                 for a, b, cc in zip(left, prev, ul)),
                dtype=np.int64, count=stride)
            filt = cur - pred
        else:
            raise ValueError(f"bad PNG filter {f}")
        parts.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 image array ((h, w) gray or (h, w, 3/4)). REAL
    decode — zlib inflate + chunk parsing with CRC checks + all five row
    filters (None/Sub/Up/Average/Paeth) — replacing the compressed-codec
    stub for ``image/png``. Supports 8-bit grayscale / RGB / RGBA,
    non-interlaced (the overwhelmingly common layout); anything else
    raises, keeping unsupported shapes loud rather than silently wrong."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in PNG chunk {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or ctype not in (0, 2, 6) or interlace:
                raise ValueError(
                    "only 8-bit gray/RGB/RGBA non-interlaced PNG supported")
            meta = (w, h, {0: 1, 2: 3, 6: 4}[ctype])
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        f = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: independent mod-256 prefix sums per byte lane
            rec = cur.reshape(-1, ch).cumsum(axis=0).reshape(-1)
        elif f == 2:  # Up
            rec = cur + prev
        elif f in (3, 4):  # Average / Paeth: left-dependent, sequential
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                pred = ((left + up) >> 1) if f == 3 else _paeth_predict(
                    left, up, ul)
                rec[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f} in row {r}")
        rec = rec & 0xFF
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


GIF_MIME = "image/gif"


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW over a flat uint8 index stream. Variable code width
    starting at mcs+1, max 12 bits, LSB-first bit packing; emits CLEAR
    first and on dictionary overflow, EOI last."""
    clear = 1 << mcs
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    seq = b""
    for sym in indices.astype(np.uint8).tobytes():
        cand = seq + bytes([sym])
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= (1 << 12):
            out_bits.append((clear, width))
            table, next_code, width = reset()
        seq = bytes([sym])
    if seq:
        out_bits.append((table[seq], width))
    out_bits.append((eoi, width))
    acc = 0
    nbits = 0
    by = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            by.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        by.append(acc & 0xFF)
    return bytes(by)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> np.ndarray:
    """GIF-variant LZW decode to exactly ``n_expected`` uint8 symbols."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK self-reference case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    if len(out) != n_expected:
        raise ValueError(
            f"GIF LZW decoded {len(out)} pixels, expected {n_expected}")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Static GIF87a from palette indices (h, w) uint8 + palette (n, 3)
    uint8, n <= 256. Global color table only, non-interlaced."""
    h, w = indices.shape
    n = len(palette)
    if n > 256:
        raise ValueError("GIF palette is limited to 256 colors")
    bpp = max(2, int(np.ceil(np.log2(max(n, 2)))))
    gct_n = 1 << bpp
    pal = np.zeros((gct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF87a")
    packed = 0x80 | ((bpp - 1) << 4) | (bpp - 1)  # GCT flag, color res, size
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(bpp)  # LZW minimum code size
    comp = _lzw_encode(indices.reshape(-1), bpp)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def decode_gif_indexed(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode the first image of a static GIF87a/89a to its native
    palette form: (indices (h, w) uint8, palette (n, 3) uint8). Handles
    global/local color tables, interlacing, and skips extensions."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _w, _h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + length-prefixed sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        mcs = payload[pos]
        pos += 1
        comp = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF data sub-blocks truncated")
            ln = payload[pos]
            if ln == 0:
                pos += 1
                break
            if pos + 1 + ln > len(payload):
                raise ValueError("GIF data sub-blocks truncated")
            comp += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(comp), mcs, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: undo the four-pass row order
            order = np.concatenate([np.arange(0, ih, 8),
                                    np.arange(4, ih, 8),
                                    np.arange(2, ih, 4),
                                    np.arange(1, ih, 2)])
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        return idx, pal
    raise ValueError("GIF payload has no image block")


def decode_gif(payload: bytes) -> np.ndarray:
    """Static GIF bytes -> (h, w, 3) uint8 RGB (palette applied)."""
    idx, pal = decode_gif_indexed(payload)
    return pal[idx]


AVI_MIME = "video/x-msvideo"


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal RIFF/AVI bytes with
    one Motion-JPEG video stream ('00dc' chunks, each a baseline JPEG
    from ``stages/jpeg.py``) — a REAL compressed video format decoded
    without any codec library."""
    assert frames, "need at least one frame"
    h, w, _ = frames[0].shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, len(payloads),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sI2H8I4i", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps,
                       0, len(payloads), 0, 0xFFFFFFFF, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frame_payloads(payload: bytes) -> list[bytes]:
    """AVI bytes -> raw per-frame JPEG payloads of the video stream
    ('00dc'/'00db' chunks inside LIST movi). Raises ValueError on
    truncation or a non-AVI RIFF."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    frames: list[bytes] = []
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError("AVI chunk truncated")
        if tag == b"LIST":
            kind = payload[pos + 8:pos + 12]
            if kind == b"movi":
                p = pos + 12
                stop = pos + 8 + size
                while p + 8 <= stop:
                    ctag = payload[p:p + 4]
                    (csz,) = struct.unpack("<I", payload[p + 4:p + 8])
                    if p + 8 + csz > stop:
                        raise ValueError("AVI movi chunk truncated")
                    if ctag in (b"00dc", b"00db"):
                        frames.append(payload[p + 8:p + 8 + csz])
                    p += 8 + csz + (csz % 2)
        pos += 8 + size + (size % 2)
    if not frames:
        raise ValueError("AVI payload has no video frames")
    return frames


def decode_avi_mjpeg(payload: bytes) -> list[np.ndarray]:
    """AVI/MJPEG bytes -> list of (h, w, 3) uint8 RGB frames."""
    return [decode_jpeg(p) for p in avi_frame_payloads(payload)]


def avi_usec_per_frame(payload: bytes) -> int:
    """AVI bytes -> dwMicroSecPerFrame from the avih main header."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if tag == b"LIST" and payload[pos + 8:pos + 12] == b"hdrl":
            p = pos + 12
            stop = pos + 8 + size
            while p + 8 <= stop:
                ctag = payload[p:p + 4]
                (csz,) = struct.unpack("<I", payload[p + 4:p + 8])
                if ctag == b"avih":
                    return struct.unpack("<I", payload[p + 8:p + 12])[0]
                p += 8 + csz + (csz % 2)
        pos += 8 + size + (size % 2)
    raise ValueError("AVI payload has no avih header")


MP4_MIME = "video/mp4"
_MP4_TIMESCALE = 1000  # movie/media timescale: 1 unit = 1 ms


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _mp4_full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _mp4_box(tag, struct.pack(">I", (version << 24) | flags) + payload)


_MP4_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                          0, 0, 0x40000000)


def encode_mp4_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85, samples_per_chunk: int = 0) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal ISO-BMFF mp4 bytes
    (ftyp + mdat + moov) with one video track whose samples are baseline
    JPEGs (QuickTime-style ``jpeg`` sample entry) — a REAL mp4 container
    written from the public ISO/IEC 14496-12 box layout, no library.
    ``samples_per_chunk`` > 0 splits mdat into multiple chunks so the
    decoder's stsc/stco resolution path is exercisable."""
    assert frames, "need at least one frame"
    h, w, _ = frames[0].shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    sizes = [len(p) for p in payloads]
    n = len(payloads)
    delta = _MP4_TIMESCALE // fps
    duration = n * delta

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                    + b"isom" + b"mp42")
    mdat = _mp4_box(b"mdat", b"".join(payloads))
    base = len(ftyp) + 8  # file offset of the first sample

    spc = samples_per_chunk if samples_per_chunk > 0 else n
    # chunk layout: runs of spc samples (last chunk may be short);
    # samples are contiguous in mdat, so offsets are running sums
    chunk_sizes = [min(spc, n - i) for i in range(0, n, spc)]
    chunk_offsets, si, pos = [], 0, base
    for c in chunk_sizes:
        chunk_offsets.append(pos)
        pos += sum(sizes[si:si + c])
        si += c
    stsc_entries = [(1, spc, 1)]
    if chunk_sizes[-1] != spc and len(chunk_sizes) > 1:
        stsc_entries.append((len(chunk_sizes), chunk_sizes[-1], 1))

    mvhd = _mp4_full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, _MP4_TIMESCALE, duration)
        + struct.pack(">i", 0x10000) + struct.pack(">h", 0x100)
        + b"\x00" * 10 + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _mp4_full(b"tkhd", 0, 3, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0) + _MP4_MATRIX
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _mp4_full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, _MP4_TIMESCALE, duration)
        + struct.pack(">HH", 0x55C4, 0))  # language 'und'
    hdlr = _mp4_full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                     + b"\x00" * 12 + b"VideoHandler\x00")
    entry = _mp4_box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)
                     + b"\x00" * 16 + struct.pack(">HH", w, h)
                     + struct.pack(">II", 0x00480000, 0x00480000)
                     + struct.pack(">I", 0) + struct.pack(">H", 1)
                     + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                     + b"".join(struct.pack(">III", *e)
                                for e in stsc_entries))
    stsz = _mp4_full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + struct.pack(f">{n}I", *sizes))
    stco = _mp4_full(b"stco", 0, 0,
                     struct.pack(f">I{len(chunk_offsets)}I",
                                 len(chunk_offsets), *chunk_offsets))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _mp4_box(b"dinf", _mp4_full(
        b"dref", 0, 0, struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b"")))
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_children(buf: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError("mp4 box truncated")
        yield tag, pos + 8, pos + size
        pos += size


def _mp4_find(buf: bytes, path: list[bytes], start: int,
              end: int) -> tuple[int, int]:
    """Body range of the first box at the nested container ``path``."""
    for tag, b0, b1 in _mp4_children(buf, start, end):
        if tag == path[0]:
            if len(path) == 1:
                return b0, b1
            return _mp4_find(buf, path[1:], b0, b1)
    raise ValueError(f"mp4 box {path[0].decode()!r} not found")


def _mp4_stbl(payload: bytes) -> dict[bytes, bytes]:
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (mp4) payload")
    moov = _mp4_find(payload, [b"moov"], 0, len(payload))
    s0, s1 = _mp4_find(payload, [b"trak", b"mdia", b"minf", b"stbl"], *moov)
    return {tag: payload[b0:b1]
            for tag, b0, b1 in _mp4_children(payload, s0, s1)}


def mp4_frame_payloads(payload: bytes) -> list[bytes]:
    """mp4 bytes -> raw per-sample payloads of the video track, resolved
    through the full stsz/stsc/stco sample table (variable-size samples,
    multi-sample chunks). Raises ValueError on truncation or a non-BMFF
    payload."""
    stbl = _mp4_stbl(payload)
    for need in (b"stsz", b"stsc", b"stco"):
        if need not in stbl:
            raise ValueError(f"mp4 stbl missing {need.decode()!r}")
    sz = stbl[b"stsz"]
    fixed, n = struct.unpack(">II", sz[4:12])
    sizes = ([fixed] * n if fixed
             else list(struct.unpack(f">{n}I", sz[12:12 + 4 * n])))
    co = stbl[b"stco"]
    (nch,) = struct.unpack(">I", co[4:8])
    chunk_offsets = struct.unpack(f">{nch}I", co[8:8 + 4 * nch])
    sc = stbl[b"stsc"]
    (ne,) = struct.unpack(">I", sc[4:8])
    entries = [struct.unpack(">III", sc[8 + 12 * k:20 + 12 * k])
               for k in range(ne)]
    per_chunk: list[int] = []
    for k, (first, spc, _desc) in enumerate(entries):
        last = entries[k + 1][0] - 1 if k + 1 < ne else nch
        per_chunk.extend([spc] * (last - first + 1))
    out: list[bytes] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        pos = coff
        for _ in range(per_chunk[ci]):
            if si >= n:
                break
            if pos + sizes[si] > len(payload):
                raise ValueError("mp4 sample out of range (truncated?)")
            out.append(payload[pos:pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != n:
        raise ValueError("mp4 sample table inconsistent")
    return out


def decode_mp4_mjpeg(payload: bytes) -> list[np.ndarray]:
    """mp4/MJPEG bytes -> list of (h, w, 3) uint8 RGB frames."""
    return [decode_jpeg(p) for p in mp4_frame_payloads(payload)]


def mp4_duration_ms(payload: bytes) -> int:
    """Movie duration in ms from the mvhd header (v0 and v1 layouts)."""
    moov = _mp4_find(payload, [b"moov"], 0, len(payload))
    b0, b1 = _mp4_find(payload, [b"mvhd"], *moov)
    body = payload[b0:b1]
    if body[0] == 1:  # v1: 64-bit creation/modification/duration
        timescale, = struct.unpack(">I", body[20:24])
        duration, = struct.unpack(">Q", body[24:32])
    else:
        timescale, duration = struct.unpack(">II", body[12:20])
    return int(duration) * 1000 // int(timescale)


def mp4_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the tkhd header's 16.16 fixed-point fields."""
    moov = _mp4_find(payload, [b"moov"], 0, len(payload))
    b0, b1 = _mp4_find(payload, [b"trak", b"tkhd"], *moov)
    body = payload[b0:b1]
    off = 88 if body[0] == 1 else 76
    w, h = struct.unpack(">II", body[off:off + 8])
    return w >> 16, h >> 16


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy fancy indexing."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


# ------------------------------------------------------ synthetic media

def synthesize_media(n: int, seed: int = 42,
                     near_dupes: int = 0) -> pa.Table:
    """Deterministic media table: REAL payloads for every format — PPM /
    PNG / GIF / JPEG images, PCM16 / mu-law WAV audio, and MJPEG video
    alternating between the RIFF/AVI and ISO-BMFF mp4 containers. Every
    row decodes for real; metadata columns carry the true geometry.

    ``near_dupes`` appends that many near-duplicate IMAGE variants
    (media_id n..n+near_dupes-1) cycling over the PPM source images —
    even variants are byte-exact payload copies (dHash Hamming 0), odd
    variants re-encode the same pixels at +2 brightness (Hamming ~0-3)
    — the planted positives for the banded dHash near-dup query."""
    rng = np.random.default_rng(seed)
    kinds, payloads, mimes, ws, hs, durs = [], [], [], [], [], []
    energies, ac1s = [], []
    ppm_imgs: list[np.ndarray] = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        kinds.append(kind)
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            # rotate the four REAL image codecs (PPM uncompressed, PNG
            # zlib-compressed, GIF LZW-compressed, baseline JPEG) so
            # every decode path stays exercised
            codec = (i // 3) % 4
            if codec == 2:  # GIF is palette-based: indices + palette
                n_colors = 8 << (i % 4)  # 8..64
                pal = rng.integers(0, 256, size=(n_colors, 3),
                                   dtype=np.uint8)
                idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
                payloads.append(encode_gif(idx, pal))
                mimes.append(GIF_MIME)
            else:
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                if codec == 1:
                    payloads.append(encode_png(img, filters=[i % 5] * h))
                    mimes.append(PNG_MIME)
                elif codec == 3:  # JPEG: lossy; features use the decode
                    payloads.append(encode_jpeg(img, quality=90,
                                                subsample=i % 2 == 1))
                    mimes.append(JPEG_MIME)
                else:
                    payloads.append(encode_ppm(img))
                    mimes.append(PPM_MIME)
                    ppm_imgs.append(img)
            ws.append(w); hs.append(h); durs.append(-1)
            energies.append(0); ac1s.append(0)
        elif kind == "audio":
            n_samp = WAV_RATE // 4 + 64 * (i % 5)  # ~250ms+
            t = np.arange(n_samp, dtype=np.float64)
            tone = np.sin(2 * np.pi * (220.0 + 20 * (i % 7)) * t / WAV_RATE)
            noise = rng.standard_normal(n_samp) * 0.05
            samples = np.clip((tone + noise) * 16000, -32768,
                              32767).astype(np.int16)
            # alternate PCM16 and the mu-law compressed WAV encoding
            enc = encode_wav_mulaw if (i // 3) % 2 == 1 else encode_wav
            payloads.append(enc(samples))
            mimes.append(WAV_MIME)
            ws.append(-1); hs.append(-1)
            durs.append(int(n_samp * 1000 / WAV_RATE))
            # ground truth in the DECODED domain: mu-law is lossy, so
            # stats come from the companded round-trip the decoder sees
            dec = (mulaw_expand(mulaw_compress(samples))
                   if (i // 3) % 2 == 1 else samples).astype(np.int64)
            energies.append(int((dec * dec).sum()))
            ac1s.append(int((dec[:-1] * dec[1:]).sum()))
        elif (i // 3) % 2 == 1:
            # REAL video: Motion-JPEG AVI, 4 moving-gradient frames
            yy, xx = np.mgrid[0:24, 0:32]
            frames = [
                np.stack([(xx * 5 + t * 16 + i) % 256, (yy * 7) % 256,
                          ((xx + yy) * 3 + t * 8) % 256],
                         axis=-1).astype(np.uint8)
                for t in range(4)
            ]
            payloads.append(encode_avi_mjpeg(frames, fps=8))
            mimes.append(AVI_MIME)
            ws.append(32); hs.append(24)
            durs.append(4 * 1000 // 8)
            energies.append(0); ac1s.append(0)
        else:
            # REAL mp4: ISO-BMFF container, MJPEG samples, 3-5 frames;
            # multi-sample chunking exercises the stsc/stco resolution
            yy, xx = np.mgrid[0:24, 0:32]
            n_fr = 3 + (i % 3)
            frames = [
                np.stack([(xx * 7 + t * 24 + i) % 256, (yy * 5 + i) % 256,
                          ((xx + 2 * yy) * 3 + t * 8) % 256],
                         axis=-1).astype(np.uint8)
                for t in range(n_fr)
            ]
            fps = (4, 5, 8)[i % 3]
            payloads.append(encode_mp4_mjpeg(frames, fps=fps,
                                             samples_per_chunk=2))
            mimes.append(MP4_MIME)
            ws.append(32); hs.append(24)
            durs.append(n_fr * (1000 // fps))
            energies.append(0); ac1s.append(0)
    n_rows = n
    if near_dupes and ppm_imgs:
        for j in range(near_dupes):
            img = ppm_imgs[j % len(ppm_imgs)]
            if j % 2 == 1:  # lossless re-encode at +2 brightness
                img = np.clip(img.astype(np.int16) + 2,
                              0, 255).astype(np.uint8)
            kinds.append("image")
            payloads.append(encode_ppm(img))
            mimes.append(PPM_MIME)
            hs.append(img.shape[0]); ws.append(img.shape[1])
            durs.append(-1); energies.append(0); ac1s.append(0)
        n_rows = n + near_dupes
    return pa.table(
        {
            "media_id": pa.array(range(n_rows), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
            "energy": pa.array(energies, pa.int64()),
            "ac_lag1": pa.array(ac1s, pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


# ------------------------------------------------------------- stages

class MediaDecoder:
    """Actor-pool decode/feature stage.

    Every synthesized format decodes for real (pure numpy codecs: PPM /
    PNG / GIF / JPEG, PCM16 / mu-law WAV, MJPEG in AVI and mp4). Mimes
    with no codec hit the stub path: ``strict=True`` raises
    NotImplementedError, else a deterministic blake2b fake keeps
    plumbing testable. Output adds ``decoded`` so downstream stages can
    tell exact features from stub features."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload, digest_size=2 * FEATURE_DIM).digest()
        return np.frombuffer(d, dtype=np.uint16).astype(np.float32) / 65535.0

    def _feature(self, mime: str, payload: bytes) -> tuple[np.ndarray, bool]:
        f = np.zeros(FEATURE_DIM, dtype=np.float32)
        if mime in (PPM_MIME, PNG_MIME, GIF_MIME, JPEG_MIME):
            img = {PPM_MIME: decode_ppm, PNG_MIME: decode_png,
                   GIF_MIME: decode_gif, JPEG_MIME: decode_jpeg}[mime](payload)
            if img.ndim == 2:  # grayscale -> 3-channel for uniform features
                img = np.repeat(img[:, :, None], 3, axis=2)
            img = img[:, :, :3]  # RGBA: stats over color channels
            gray = img.astype(np.float32).mean(axis=2)
            f[0], f[1] = img.shape[1], img.shape[0]
            f[2:5] = img.reshape(-1, 3).mean(axis=0)
            f[5] = gray.std()
            f[6] = gray.min()
            f[7] = gray.max()
            return f, True
        if mime == WAV_MIME:
            samples, rate = decode_wav(payload)
            x = samples.astype(np.float32)
            f[0] = len(samples)
            f[1] = rate
            f[2] = np.sqrt(np.mean(x * x)) if len(x) else 0.0  # RMS
            f[3] = np.abs(x).max() if len(x) else 0.0          # peak
            f[4] = len(samples) * 1000.0 / rate                # ms
            return f, True
        if mime in (AVI_MIME, MP4_MIME):  # MJPEG video: real decode in
            # both containers (RIFF/AVI chunks, ISO-BMFF sample table)
            frames = (decode_avi_mjpeg(payload) if mime == AVI_MIME
                      else decode_mp4_mjpeg(payload))
            gray = np.stack([fr.astype(np.float32).mean(axis=2)
                             for fr in frames])
            f[0] = len(frames)
            f[1], f[2] = frames[0].shape[1], frames[0].shape[0]
            f[3] = gray.mean()
            f[4] = gray.std()
            # temporal motion proxy: mean abs frame-to-frame delta
            f[5] = (np.abs(np.diff(gray, axis=0)).mean()
                    if len(frames) > 1 else 0.0)
            return f, True
        if self.strict:
            raise NotImplementedError(
                f"decode of {mime!r} requires codec libraries not present "
                "in this environment; run with strict=False for the "
                "deterministic stub"
            )
        return self._fake_feature(payload), False

    # stub surface: only mimes with no codec above (e.g. video/webm).
    # PPM, PNG (pure zlib+numpy), GIF (from-scratch LZW), JPEG (DCT +
    # huffman, stages/jpeg.py), PCM16/mu-law WAV, MJPEG in AVI and mp4
    # containers all decode for real.

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, decoded = [], []
        for mime, p in zip(batch["mime"].to_pylist(),
                           batch["payload"].to_pylist()):
            f, ok = self._feature(mime, p)
            feats.append(f.tolist())
            decoded.append(ok)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    [len(p.as_py()) for p in batch["payload"]], pa.int64()
                ),
                "feature": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
                "decoded": pa.array(decoded, pa.bool_()),
            }
        )


class MediaProber(MediaDecoder):
    """Metadata-recovery probe: re-derives geometry/duration from payload
    BYTES alone (full decode through the real codecs), never reading the
    table's width/height/duration_ms metadata columns — which is exactly
    what the SQL oracle checks the output against. A codec that
    mis-parses dimensions, frame counts, or sample rates cannot pass.
    Emits -1 for fields a kind doesn't have (image duration, audio
    geometry) and for formats with no codec."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"]
        kinds = batch["kind"]
        n_bytes, dec, pw, ph, pdur = [], [], [], [], []
        for mime, p in zip(batch["mime"].to_pylist(),
                           batch["payload"].to_pylist()):
            w = h = dur = -1
            ok = False
            if mime in (PPM_MIME, PNG_MIME, GIF_MIME, JPEG_MIME):
                f, ok = self._feature(mime, p)
                w, h = int(f[0]), int(f[1])
            elif mime == WAV_MIME:
                f, ok = self._feature(mime, p)
                dur = int(round(float(f[4])))
            elif mime == AVI_MIME:
                f, ok = self._feature(mime, p)
                w, h = int(f[1]), int(f[2])
                dur = int(f[0]) * avi_usec_per_frame(p) // 1000
            elif mime == MP4_MIME:
                f, ok = self._feature(mime, p)  # full sample decode
                w, h = mp4_dimensions(p)        # tkhd, header-only
                dur = mp4_duration_ms(p)        # mvhd, header-only
            n_bytes.append(len(p))
            dec.append(ok)
            pw.append(w)
            ph.append(h)
            pdur.append(dur)
        return pa.table(
            {
                "media_id": ids,
                "kind": kinds,
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "decoded": pa.array(dec, pa.bool_()),
                "probe_w": pa.array(pw, pa.int64()),
                "probe_h": pa.array(ph, pa.int64()),
                "probe_dur": pa.array(pdur, pa.int64()),
            }
        )


def media_probe(media, batch_size: int = 32, concurrency=(1, 2)):
    """Actor-pool probe stage over a media Dataset (see MediaProber)."""
    return media.map_batches(
        MediaProber,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class Thumbnailer:
    """Real image transform stage: decode -> nearest-neighbor resize ->
    re-encode in the SAME format (PPM, PNG, or GIF; GIF resizes in index
    space so the original palette survives exactly). Other rows pass
    through untouched (flagged)."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, resized = [], []
        for mime, p in zip(batch["mime"].to_pylist(),
                           batch["payload"].to_pylist()):
            if mime == PPM_MIME:
                thumb = resize_nearest(decode_ppm(p), self.out_w, self.out_h)
                out.append(encode_ppm(thumb))
                resized.append(True)
            elif mime == PNG_MIME:
                img = decode_png(p)
                if img.ndim == 3 and img.shape[2] == 3:
                    thumb = resize_nearest(img, self.out_w, self.out_h)
                    out.append(encode_png(thumb))
                    resized.append(True)
                else:  # gray/RGBA thumbnails not re-encoded (RGB encoder)
                    out.append(p)
                    resized.append(False)
            elif mime == GIF_MIME:
                idx, pal = decode_gif_indexed(p)
                small = resize_nearest(idx, self.out_w, self.out_h)
                out.append(encode_gif(small, pal))
                resized.append(True)
            elif mime == JPEG_MIME:
                thumb = resize_nearest(decode_jpeg(p), self.out_w, self.out_h)
                out.append(encode_jpeg(thumb, quality=90))
                resized.append(True)
            else:
                out.append(p)
                resized.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "payload": pa.array(out, pa.binary()),
                "resized": pa.array(resized, pa.bool_()),
            }
        )


class FrameSampler:
    """Video frame-sampling (flat-map shape: one row in, N frame rows
    out). AVI and mp4 MJPEG rows sample REAL frames — each emitted frame
    is a standalone decodable JPEG taken evenly from the stream. Unknown
    video formats fall back to deterministic byte slices so the Ray-side
    contract — binary in, multiple binary rows out, frame_idx column,
    small batches — holds for any payload."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idxs, frames = [], [], []
        for mid, kind, mime, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["mime"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            if mime in (AVI_MIME, MP4_MIME):
                stored = (avi_frame_payloads(payload) if mime == AVI_MIME
                          else mp4_frame_payloads(payload))
                picks = np.linspace(0, len(stored) - 1,
                                    self.n_frames).round().astype(int)
                for k, si in enumerate(picks):
                    media_ids.append(mid)
                    frame_idxs.append(k)
                    frames.append(stored[si])
                continue
            step = max(1, len(payload) // self.n_frames)
            for k in range(self.n_frames):
                media_ids.append(mid)
                frame_idxs.append(k)
                frames.append(payload[k * step : (k + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "frame_idx": pa.array(frame_idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(media, n_frames: int = 4, batch_size: int = 32,
                  concurrency=(1, 2)):
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_features(media, batch_size: int = 64, concurrency=(1, 2),
                    strict: bool = False):
    """Small batches on purpose: payload bytes x batch x concurrency must fit
    the worker heap; the object store spills the rest."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def thumbnails(media, out_w: int = 8, out_h: int = 8, batch_size: int = 32,
               concurrency=(1, 2)):
    return media.map_batches(
        Thumbnailer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioStatsProber:
    """Audio signal-stats probe: decodes each WAV payload (PCM16 or
    mu-law) from BYTES alone and recomputes exact int64 energy and lag-1
    autocorrelation — compared by the oracle against the generator's
    ground-truth columns, which this stage never reads. A decoder that
    mis-expands a mu-law codeword or drops a sample cannot pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, en, ac = [], [], []
        for mid, mime, p in zip(batch["media_id"].to_pylist(),
                                batch["mime"].to_pylist(),
                                batch["payload"].to_pylist()):
            if mime != WAV_MIME:
                continue
            samples, _rate = decode_wav(p)
            x = samples.astype(np.int64)
            ids.append(mid)
            en.append(int((x * x).sum()))
            ac.append(int((x[:-1] * x[1:]).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "energy": pa.array(en, pa.int64()),
            "ac_lag1": pa.array(ac, pa.int64()),
        })


def media_audio_stats(media, batch_size: int = 32):
    """Audio rows -> exact decoded-signal stats via an actor-pool probe
    (small batches: payload x batch x concurrency must fit worker heaps)."""
    return media.map_batches(
        AudioStatsProber,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


# --------------------------------------------------- perceptual hash (dHash)

DHASH_W, DHASH_H = 9, 8  # 8x8 gradient bits — the standard dHash geometry


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Channel normalization SPEC (shared with MediaDecoder._feature):
    grayscale repeats to 3 channels, RGBA drops alpha."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return img[:, :, :3]


def dhash_of(img: np.ndarray) -> int:
    """Difference hash (dHash, Krawetz 2013 — public method): nearest
    resize to 9x8, integer luminance r+g+b (no division), bit (r, c) set
    iff lum[r, c+1] > lum[r, c], packed little-endian bit r*8+c. All
    integer arithmetic — bit-identical anywhere. Returns SIGNED int64
    (two's complement) so the value survives BIGINT parquet/SQL."""
    small = resize_nearest(_to_rgb(img), DHASH_W, DHASH_H)
    lum = small.astype(np.int32).sum(axis=2)
    bits = (lum[:, 1:] > lum[:, :-1]).flatten()
    v = int((bits.astype(np.uint64)
             << np.arange(64, dtype=np.uint64)).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


_IMAGE_DECODERS = {PPM_MIME: decode_ppm, PNG_MIME: decode_png,
                   GIF_MIME: decode_gif, JPEG_MIME: decode_jpeg}


class ImageDHasher:
    """Actor-pool perceptual-hash stage over image rows: real decode
    (all four image codecs), then the integer dHash. Non-image mimes are
    skipped (the caller filters by kind; unknown image mimes raise like
    MediaDecoder strict mode would — a hash from a stub decode would be
    a silent dedup corruption)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for mid, mime, p in zip(batch["media_id"].to_pylist(),
                                batch["mime"].to_pylist(),
                                batch["payload"].to_pylist()):
            dec = _IMAGE_DECODERS.get(mime)
            if dec is None:
                continue
            ids.append(mid)
            hs.append(dhash_of(dec(p)))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "dhash": pa.array(hs, pa.int64())})


def image_dhash(media, batch_size: int = 32, concurrency=(1, 4)):
    """(media_id, dhash) for every image row — the signature pass of
    perceptual image dedup (binary payloads never shuffle: the scan is
    column-pruned to image rows and hashes leave the stage as 8 bytes)."""
    return media.filter(
        expr="kind == 'image'"
    ).select_columns(["media_id", "mime", "payload"]).map_batches(
        ImageDHasher, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def image_dhash_pairs(media, max_hamming: int = 10, n_buckets: int = 16,
                      cap: int = 200):
    """Near-duplicate image pairs: dHash signatures -> 16-bit-chunk
    pigeonhole blocking -> exact popcount verify inside the bucket.
    With 4 chunks the blocking is provably COMPLETE for hamming <= 3
    (some chunk must match); for the default radius 10 a pair whose
    differing bits spread across all four chunks can be missed — the
    standard recall/cost tradeoff, same documented contract as
    simhash_pairs. Payload bytes NEVER enter the exchange — only
    (media_id, dhash)."""
    import pandas as pd

    from ..functions.bucketing import bucketed_distinct, bucketed_group_pairs

    sigs = image_dhash(media).materialize()  # media-bounded, read twice

    def chunks(b: pa.Table) -> pa.Table:
        h = b["dhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = h.view(np.uint64)
        mid = b["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_ci, out_cv, out_h = [], [], [], []
        for k in range(4):
            out_id.append(mid)
            out_ci.append(np.full(len(u), k, dtype=np.int64))
            out_cv.append(((u >> np.uint64(16 * k))
                           & np.uint64(0xFFFF)).astype(np.int64))
            out_h.append(h)
        return pa.table({
            "media_id": pa.array(np.concatenate(out_id), pa.int64()),
            "chunk_idx": pa.array(np.concatenate(out_ci), pa.int64()),
            "chunk_val": pa.array(np.concatenate(out_cv), pa.int64()),
            "dhash": pa.array(np.concatenate(out_h), pa.int64())})

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        sub = g[["media_id", "dhash"]].drop_duplicates("media_id")
        ids = sub["media_id"].to_numpy(np.int64)
        hs = sub["dhash"].to_numpy(np.int64).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, hs = ids[order], hs[order]
        if len(ids) > cap:
            import warnings

            warnings.warn(
                f"dhash chunk bucket holds {len(ids)} images > cap {cap};"
                f" truncated (recall loss — raise cap)", stacklevel=2)
            ids, hs = ids[:cap], hs[:cap]
        if len(ids) < 2:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64")})
        ii, jj = np.triu_indices(len(ids), k=1)
        x = hs[ii] ^ hs[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):  # branch-free popcount, vectorized
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep],
                             "hamming": ham[keep]})

    return bucketed_distinct(
        bucketed_group_pairs(
            sigs.map_batches(chunks, batch_format="pyarrow"),
            ["chunk_idx", "chunk_val"], bucket_verify,
            n_buckets=n_buckets),
        ["id_a", "id_b", "hamming"], n_buckets=n_buckets)


# ----------------------------------------------- video scene-cut detect

SCENECUT_HAMMING = 16  # dHash bits that must flip between frames


class VideoSceneCutter:
    """Actor-pool scene-boundary stage over video rows: REAL container +
    MJPEG decode (both RIFF/AVI and ISO-BMFF mp4), per-frame integer
    dHash, Hamming distance between consecutive frames — the shot-change
    signal a video-curation pipeline samples keyframes at. Payload bytes
    never leave the stage; one row per frame TRANSITION exits."""

    def __init__(self, threshold: int = SCENECUT_HAMMING):
        self.threshold = threshold
        self._dec = {AVI_MIME: decode_avi_mjpeg, MP4_MIME: decode_mp4_mjpeg}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, hams = [], [], []
        for mid, mime, p in zip(batch["media_id"].to_pylist(),
                                batch["mime"].to_pylist(),
                                batch["payload"].to_pylist()):
            dec = self._dec.get(mime)
            if dec is None:
                continue
            frames = dec(p)
            if len(frames) < 2:
                continue
            hs = np.array([dhash_of(f) for f in frames],
                          dtype=np.int64).view(np.uint64)
            x = hs[:-1] ^ hs[1:]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):  # branch-free popcount, vectorized
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            ids.append(np.full(len(ham), mid, dtype=np.int64))
            idxs.append(np.arange(1, len(frames), dtype=np.int64))
            hams.append(ham)
        if not ids:
            return pa.table({"media_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64()),
                             "is_cut": pa.array([], pa.bool_())})
        ham_all = np.concatenate(hams)
        return pa.table({
            "media_id": pa.array(np.concatenate(ids), pa.int64()),
            "frame_idx": pa.array(np.concatenate(idxs), pa.int64()),
            "hamming": pa.array(ham_all, pa.int64()),
            "is_cut": pa.array(ham_all >= self.threshold, pa.bool_()),
        })


def video_scenecuts(media, threshold: int = SCENECUT_HAMMING,
                    batch_size: int = 8, concurrency=(1, 4)):
    """(media_id, frame_idx, hamming, is_cut) per consecutive-frame pair
    of every video row. Small batches: decoded frame stacks x batch x
    concurrency must fit worker heaps (the media_audio_stats rule)."""
    return media.filter(
        expr="kind == 'video'"
    ).select_columns(["media_id", "mime", "payload"]).map_batches(
        VideoSceneCutter, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"threshold": threshold})
