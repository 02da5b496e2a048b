"""Pure stdlib+numpy image/audio codecs: PNG, BMP, RIFF/WAVE.

Upgrades the multimodal decode stages from the FAKEIMG stub to REAL
codecs buildable without PIL/ffmpeg (absent in this environment):

- **PNG** via stdlib ``zlib``: all five scanline filters (None/Sub/Up/
  Average/Paeth), color types gray / gray+alpha / RGB / RGBA / palette,
  bit depths 8 and 16 (high-byte conversion) everywhere plus 1/2/4 for
  gray and palette, tRNS palette alpha, Adam7 interlace reassembly,
  CRC-validated chunk walk.
- **BMP**: uncompressed BI_RGB 24/32-bit, bottom-up and top-down rows,
  4-byte row padding.
- **WAV**: RIFF chunk walk, PCM 16-bit and unsigned 8-bit, mono or
  interleaved multichannel.

Encoders exist for all three so tests can roundtrip arbitrary arrays
(including per-row forced PNG filter types to pin every unfilter path)
and pipelines can emit real thumbnails. All output is byte-deterministic
(fixed zlib level, filter-0 rows).

Reference parity: the reference delegates image handling to PIL /
python-pptx image parts (src/processors/powerpoint/content_extractor.py
image branches); this module removes that dependency with in-repo
decoders so `stages/multimodal.py` decodes real containers end-to-end.

Decoder hot loops are per-ROW numpy (filters 0/1/2 fully vectorized via
cumsum/add; 3/4 are per-pixel lane vectors only on rows that use them —
our own encoder emits filter 0, so in-repo payloads take the fast path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int arrays (encoder side: all
    inputs are already-reconstructed originals, so no scan dependency)."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _filter_rows(flat: np.ndarray, ch: int, ft: int) -> bytes:
    """Filter an (h, w*ch) int16 sample-byte matrix into PNG scanlines
    (one sub-image's worth; ``prev`` resets per call per spec)."""
    parts = []
    prev = np.zeros(flat.shape[1], dtype=np.int16)
    fbyte = bytes([ft])
    for y in range(flat.shape[0]):
        row = flat[y]
        if ft == 0:
            f = row
        else:
            left = np.zeros_like(row)
            left[ch:] = row[:-ch]
            if ft == 1:
                f = row - left
            elif ft == 2:
                f = row - prev
            elif ft == 3:
                f = row - ((left + prev) >> 1)
            else:  # Paeth
                upleft = np.zeros_like(prev)
                upleft[ch:] = prev[:-ch]
                f = row - _paeth_vec(left, prev, upleft)
        parts.append(fbyte)
        parts.append((f & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return b"".join(parts)


def png_encode(arr: np.ndarray, filter_type: int = 0, level: int = 6,
               interlace: bool = False) -> bytes:
    """Encode a uint8 array as a PNG. Shape (h, w) or (h, w, c), c in
    1..4 -> gray / gray+alpha / RGB / RGBA. ``filter_type`` is applied
    to EVERY row (0 default; 1-4 exist so tests can pin each unfilter
    path); ``interlace=True`` writes Adam7 pass order (tests pin the
    deinterlace path). Byte-deterministic for fixed inputs."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        ch = 1
    elif a.ndim == 3 and a.shape[2] in (1, 2, 3, 4):
        ch = a.shape[2]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    h, w = a.shape[0], a.shape[1]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ft = int(filter_type)
    if ft not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {ft}")
    a3 = a.reshape(h, w, ch)
    if interlace:
        raws = []
        for sx, sy, dx, dy in _ADAM7:
            sub = a3[sy::dy, sx::dx]
            if sub.shape[0] and sub.shape[1]:
                raws.append(_filter_rows(
                    sub.reshape(sub.shape[0], -1).astype(np.int16),
                    ch, ft))
        raw = b"".join(raws)
    else:
        raw = _filter_rows(a3.reshape(h, w * ch).astype(np.int16), ch, ft)
    idat = zlib.compress(raw, level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def png_encode_palette(idx: np.ndarray, palette: np.ndarray,
                       trns: bytes | None = None, bit_depth: int = 8,
                       level: int = 6) -> bytes:
    """Encode a palette (color type 3) PNG from an (h, w) index array and
    an (n, 3) uint8 palette; optional tRNS alpha bytes. Supports bit
    depths 1/2/4/8 (tests pin the low-depth unpack paths)."""
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("idx must be (h,w), palette (n,3)")
    d = int(bit_depth)
    if d not in (1, 2, 4, 8):
        raise ValueError(f"bad palette bit depth {d}")
    if idx.max(initial=0) >= min(len(pal), 1 << d):
        raise ValueError("palette index out of range")
    h, w = idx.shape
    parts = []
    for y in range(h):
        if d == 8:
            rb = idx[y].tobytes()
        else:
            bits = np.unpackbits(idx[y][:, None], axis=1)[:, 8 - d:]
            packed = np.packbits(bits.reshape(-1))
            rb = packed.tobytes()
        parts.append(b"\x00" + rb)
    idat = zlib.compress(b"".join(parts), level)
    ihdr = struct.pack(">IIBBBBB", w, h, d, 3, 0, 0, 0)
    out = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _png_chunks(data: bytes):
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > n:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        yield tag, body
        pos += 12 + ln
        if tag == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. Returns (h, stride) uint8.

    Filters 0/1/2 vectorize whole-row (Sub is a per-lane cumsum mod 256);
    Average/Paeth carry a true left-to-right dependency, so those rows
    run a per-pixel loop over ``bpp``-wide lane vectors."""
    need = h * (1 + stride)
    buf = np.frombuffer(raw, dtype=np.uint8, count=need)
    rows = buf.reshape(h, 1 + stride)
    fts = rows[:, 0]
    if fts.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter type {int(fts.max())}")
    out = np.zeros((h, stride), dtype=np.uint8)
    npix = stride // bpp
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = fts[y]
        row = rows[y, 1:].astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: per-lane cumulative sum mod 256
            rec = (np.cumsum(row.reshape(npix, bpp), axis=0) & 0xFF
                   ).reshape(stride)
        elif ft == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ft == 3:  # Average
            rp = row.reshape(npix, bpp)
            up = prev.reshape(npix, bpp)
            rec2 = np.empty((npix, bpp), dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(npix):
                left = (rp[x] + ((left + up[x]) >> 1)) & 0xFF
                rec2[x] = left
            rec = rec2.reshape(stride)
        else:  # Paeth
            rp = row.reshape(npix, bpp)
            up = prev.reshape(npix, bpp)
            rec2 = np.empty((npix, bpp), dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(npix):
                left = (rp[x] + _paeth_vec(left, up[x], upleft)) & 0xFF
                rec2[x] = left
                upleft = up[x]
            rec = rec2.reshape(stride)
        out[y] = rec
        prev = rec
    return out


def _pass_samples(raw: bytes, offset: int, w: int, h: int, ch: int,
                  depth: int) -> tuple[np.ndarray, int]:
    """Unfilter + unpack ONE (sub)image of filtered scanlines starting
    at ``offset`` in the inflated stream. Returns ((h, w, ch) uint8
    samples — 16-bit is converted via its high byte, sub-8-bit values
    stay raw (scaling/palette happens on the assembled image) — and the
    byte count consumed)."""
    stride = (w * ch * depth + 7) // 8
    bpp = max(1, ch * depth // 8)
    need = h * (1 + stride)
    if len(raw) - offset < need:
        raise ValueError("truncated PNG pixel data")
    rec = _unfilter(raw[offset:offset + need], h, stride, bpp)
    if depth == 16:
        samples = rec.reshape(h, w * ch, 2)[:, :, 0]  # big-endian high byte
    elif depth < 8:
        bits = np.unpackbits(rec, axis=1)  # (h, stride*8)
        weights = 1 << np.arange(depth - 1, -1, -1)
        samples = (bits[:, :w * depth].reshape(h, w, depth)
                   * weights).sum(axis=2).astype(np.uint8)
    else:
        samples = rec
    return samples.reshape(h, w, ch), need


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB (incl. palette), (h, w, 4) RGBA (incl. palette+tRNS).

    Low bit depths (1/2/4, gray + palette) are scaled/expanded to
    8-bit; 16-bit samples convert via their high byte; Adam7-interlaced
    streams reassemble from the 7 passes. Raises ValueError on
    truncation or CRC errors."""
    ihdr = None
    plte = None
    trns = None
    idat = []
    for tag, body in _png_chunks(data):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if ct not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {ct}")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and ct in (2, 4, 6)) \
            or (depth == 16 and ct == 3):
        raise ValueError(f"unsupported bit depth {depth} for color type {ct}")
    if w < 1 or h < 1 or w > 1 << 24 or h > 1 << 24:
        raise ValueError("bad PNG dimensions")
    ch = _PNG_CHANNELS[ct]

    def scanline_bytes(wp: int, hp: int) -> int:
        return hp * (1 + (wp * ch * depth + 7) // 8)

    if interlace:
        expected = sum(
            scanline_bytes((w - sx + dx - 1) // dx, (h - sy + dy - 1) // dy)
            for sx, sy, dx, dy in _ADAM7
            if (w - sx + dx - 1) // dx > 0 and (h - sy + dy - 1) // dy > 0)
    else:
        expected = scanline_bytes(w, h)
    # inflate bomb guard: the stream's inflated size is exactly known
    # from IHDR, so cap the decompressor there (decode runs on
    # untrusted crawl bytes — same discipline as warc.gunzip_members)
    raw = zlib.decompressobj().decompress(b"".join(idat), expected)
    if interlace:
        assembled = np.zeros((h, w, ch), dtype=np.uint8)
        pos = 0
        for sx, sy, dx, dy in _ADAM7:
            wp = (w - sx + dx - 1) // dx
            hp = (h - sy + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sub, used = _pass_samples(raw, pos, wp, hp, ch, depth)
            assembled[sy::dy, sx::dx] = sub
            pos += used
        samples = assembled
    else:
        samples, _ = _pass_samples(raw, 0, w, h, ch, depth)
    if ct == 0 and depth < 8:  # scale gray to full 8-bit range
        samples = (samples.astype(np.uint16)
                   * (255 // ((1 << depth) - 1))).astype(np.uint8)
    px = samples if ch > 1 else samples.reshape(h, w)
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]  # (h, w, 3)
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.ascontiguousarray(
                np.dstack([rgb, alpha[idx]]))
        return np.ascontiguousarray(rgb)
    return np.ascontiguousarray(px)


# ---------------------------------------------------------------------------
# BMP (uncompressed BI_RGB)
# ---------------------------------------------------------------------------


def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("bmp_encode wants (h, w, 3) RGB")
    h, w = a.shape[:2]
    rowsz = (w * 3 + 3) & ~3
    body = np.zeros((h, rowsz), dtype=np.uint8)
    body[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB->BGR
    pixels = body.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to (h, w, 3|4) uint8 RGB(A).
    Handles bottom-up (positive height) and top-down rows and 4-byte row
    padding."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    (hsize,) = struct.unpack_from("<I", data, 14)
    if hsize < 40:
        raise ValueError(f"unsupported BMP header size {hsize}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (compression={compression}, bpp={bpp})")
    topdown = h_raw < 0
    h = abs(h_raw)
    if w < 1 or h < 1 or w > 1 << 24 or h > 1 << 24:
        raise ValueError("bad BMP dimensions")
    nb = bpp // 8
    rowsz = (w * nb + 3) & ~3
    if off + rowsz * h > len(data):
        raise ValueError("truncated BMP pixel data")
    img = np.frombuffer(data, dtype=np.uint8, count=rowsz * h,
                        offset=off).reshape(h, rowsz)
    px = img[:, :w * nb].reshape(h, w, nb)
    if not topdown:
        px = px[::-1]
    out = px[:, :, ::-1] if nb == 3 else px[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(out)


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU T.81)
# ---------------------------------------------------------------------------

# zigzag scan order: index i of the scan -> (row, col) flattened offset
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K (spec) luminance / chrominance quantization tables, raster order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K typical huffman tables: (bits[1..16], values)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
     0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
     0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
     0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
     0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
     0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
     0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
     0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
     0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# 8x8 type-II DCT basis: _DCT_M @ block @ _DCT_M.T is the forward DCT
# (orthonormal); its transpose pair is the inverse — spec formula
# C(u)/2 * cos((2x+1)u*pi/16) folded into an orthonormal matrix.
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _cu = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _cu, _x


def _huff_decode_table(bits: list, values: list) -> dict:
    """Canonical JPEG huffman: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list, values: list) -> dict:
    """Canonical JPEG huffman: {symbol -> (code, length)}."""
    return {sym: (code, ln)
            for (ln, code), sym in _huff_decode_table(bits, values).items()}


def _destuff_entropy(data: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded data starting at ``pos`` into de-stuffed
    byte segments, one per restart interval (FF 00 -> FF inside a
    segment; FF D0-D7 separates segments; any other marker ends the
    scan). One C-speed ``find`` per FF occurrence — no per-byte loop."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        ff = data.find(b"\xff", pos)
        if ff < 0:
            cur += data[pos:]
            break
        cur += data[pos:ff]
        nxt = data[ff + 1] if ff + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos = ff + 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            pos = ff + 2
        else:
            break  # real marker: entropy data ends
    segments.append(bytes(cur))
    return segments


_LUT_BITS = 16
_LUT_CACHE: dict = {}


def _huff_lut(bits: list, values: list):
    """(symbol, length) lookup tables indexed by a 16-bit peek — cached
    per (bits, values) so the standard tables build once per process."""
    key = (bytes(bits), bytes(values))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << _LUT_BITS, dtype=np.int16)
    ln_arr = np.zeros(1 << _LUT_BITS, dtype=np.int8)
    for (ln, code), s in _huff_decode_table(bits, values).items():
        start = code << (_LUT_BITS - ln)
        cnt = 1 << (_LUT_BITS - ln)
        sym[start:start + cnt] = s
        ln_arr[start:start + cnt] = ln
    out = (sym.tolist(), ln_arr.tolist())  # plain lists: faster scalar access
    _LUT_CACHE[key] = out
    return out


class _SegReader:
    """Bit reader over one de-stuffed entropy segment: 16-bit peeks
    against the huffman LUTs, small-int bit buffer, 1-padding past the
    end (per spec) with a hard floor so truncation still errors."""

    __slots__ = ("data", "pos", "n", "buf", "nbits", "limit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data)
        self.buf = 0
        self.nbits = 0
        self.limit = self.n * 8 + 64  # allow pad bits, catch runaways

    def _fill16(self):
        while self.nbits < _LUT_BITS:
            if self.pos < self.n:
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.limit -= 8
                if self.limit < 0:
                    raise ValueError("JPEG entropy stream truncated")
                self.buf = (self.buf << 8) | 0xFF  # spec 1-padding
            self.nbits += 8

    def huff(self, lut) -> int:
        self._fill16()
        peek = (self.buf >> (self.nbits - _LUT_BITS)) & 0xFFFF
        ln = lut[1][peek]
        if ln == 0:
            raise ValueError("bad JPEG huffman code")
        self.nbits -= ln
        self.buf &= (1 << self.nbits) - 1
        return lut[0][peek]

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill16()
        v = (self.buf >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.buf &= (1 << self.nbits) - 1
        return v


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (spec EXTEND): t-bit value v -> signed."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0) to uint8 (h, w) gray or
    (h, w, 3) RGB. Supports multiple DQT/DHT segments, 16-bit quant
    precision, chroma subsampling (2x2/2x1/1x2 replication upsample),
    and DRI/RSTn restart intervals. Progressive (SOF2) and arithmetic
    coding are rejected with a clear error."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may precede
        # the marker code — skip them so a padded file doesn't mis-walk
        while pos + 2 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", count=64,
                                         offset=p).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, count=64,
                                         offset=p).astype(np.int64)
                    p += 64
                raster = np.zeros(64, np.int64)
                raster[_ZIGZAG] = vals  # DQT stores zigzag order
                qt[tq] = raster
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                p += 17 + nv
                (huff_ac if tc else huff_dc)[th] = (bits, values)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type 0xff{marker:02x} "
                "(progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _jpeg_scan(data, pos + seglen, frame, sel, qt,
                              huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("JPEG ended without SOS")


def _jpeg_scan(data: bytes, pos: int, frame, sel, qt, huff_dc, huff_ac,
               restart_interval: int) -> np.ndarray:
    fh, fw, comps = frame
    if fh < 1 or fw < 1 or fh > 1 << 16 or fw > 1 << 16:
        raise ValueError("bad JPEG dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quant table")
        if c["id"] not in sel:
            raise ValueError("JPEG scan does not cover all components")
        if sel[c["id"]][0] not in huff_dc or sel[c["id"]][1] not in huff_ac:
            raise ValueError("JPEG missing huffman table")
    # huffman tables arrive as (bits, values) pairs
    dc_luts = {k: _huff_lut(*v) for k, v in huff_dc.items()}
    ac_luts = {k: _huff_lut(*v) for k, v in huff_ac.items()}

    segments = _destuff_entropy(data, pos)
    seg_idx = 0
    reader = _SegReader(segments[0])
    pred = [0] * len(comps)
    mcu_count = 0
    zz = _ZIGZAG.tolist()
    # entropy pass: per-component zigzag coefficient rows + block origins
    coeff_rows: list[list] = [[] for _ in comps]
    origins: list[list] = [[] for _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("expected JPEG restart marker")
                reader = _SegReader(segments[seg_idx])
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                dlut, alut = dc_luts[dct], ac_luts[act]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = [0] * 64
                        t = reader.huff(dlut)
                        diff = _extend(reader.bits(t), t)
                        pred[ci] += diff
                        row[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(alut)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            row[zz[k]] = _extend(reader.bits(s), s)
                            k += 1
                        coeff_rows[ci].append(row)
                        origins[ci].append(
                            ((my * c["v"] + by) * 8,
                             (mx * c["h"] + bx) * 8))
    # transform pass: batched dequant + IDCT per component (one einsum)
    out_planes = []
    for ci, c in enumerate(comps):
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                         dtype=np.float64)
        coeffs = np.array(coeff_rows[ci], dtype=np.float64)
        blocks = (coeffs * qt[c["tq"]].astype(np.float64)).reshape(
            -1, 8, 8)
        pix = np.matmul(np.matmul(_DCT_M.T, blocks), _DCT_M) + 128.0
        for (y0, x0), blk in zip(origins[ci], pix):
            plane[y0:y0 + 8, x0:x0 + 8] = blk
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # replication upsample
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:fh, :fw])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count "
                         f"{len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base quant table (public formula)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255)


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Huffman-encode one quantized 8x8 block (raster order in)."""
    zz = coeffs.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def jpeg_quality_estimate(data: bytes) -> tuple[int, bool]:
    """Estimate the libjpeg quality factor from a JPEG's luminance
    quantization table — header-only scan (no entropy decode), the
    standard web-image curation signal (heavily recompressed thumbnails
    score low; originals score high).

    Returns ``(quality, exact)``: the table is inverted through the
    public IJG scaling formula (``_quality_scale``); when re-scaling
    the Annex K base table at the candidate quality reproduces the
    stored table bit-for-bit, ``exact=True`` (the file used standard
    tables — the overwhelmingly common case). Otherwise the closest
    least-squares quality is returned with ``exact=False`` (custom
    tables: mozjpeg/tuned encoders).
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos, n = 2, len(data)
    luma = None
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may precede
        # the marker code — skip them so a padded file doesn't mis-walk
        while pos + 2 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                cnt = 64
                vals = (np.frombuffer(seg, ">u2", count=cnt, offset=p)
                        if pq else
                        np.frombuffer(seg, np.uint8, count=cnt, offset=p)
                        ).astype(np.int64)
                p += 128 if pq else 64
                if tq == 0 and luma is None:
                    raster = np.zeros(64, np.int64)
                    raster[_ZIGZAG] = vals
                    luma = raster
        elif marker == 0xDA:
            break
        pos += seglen
    if luma is None:
        raise ValueError("JPEG has no luminance quantization table")
    # all 100 candidate tables at once (100×64 int ops — cheaper than
    # being clever about the low-quality clipping regime, where a
    # sum-based seed estimate is biased by the 255 saturation)
    cands = np.stack([_quality_scale(_QT_LUMA, q) for q in range(1, 101)])
    errs = np.abs(cands - luma[None, :]).sum(axis=1)
    q = int(np.argmin(errs)) + 1       # lowest quality wins ties
    return q, bool(errs[q - 1] == 0)


def jpeg_encode(arr: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Encode uint8 (h, w) gray or (h, w, 3) RGB as a baseline JPEG
    (Annex K tables scaled by ``quality``; ``subsample=True`` writes
    4:2:0 chroma). Deterministic; exists for roundtrip tests and real
    thumbnail output."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("jpeg_encode wants (h, w) gray or (h, w, 3) RGB")
    h, w = a.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    qluma = _quality_scale(_QT_LUMA, quality)
    qchroma = _quality_scale(_QT_CHROMA, quality)

    if gray:
        planes = [a.astype(np.float64)]
        samps = [(1, 1)]
        qtabs = [qluma]
    else:
        f = a.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even then 2x2 mean
            he, we = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                return np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
            cb = pad(cb).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [qluma, qchroma, qchroma]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU grid (edge replication)
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]),
                                 (0, pw - p.shape[1])), mode="edge"))

    dc_l = _huff_encode_table(*_HT_DC_LUMA)
    ac_l = _huff_encode_table(*_HT_AC_LUMA)
    dc_c = _huff_encode_table(*_HT_DC_CHROMA)
    ac_c = _huff_encode_table(*_HT_AC_CHROMA)
    enc_tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv), q) in enumerate(
                    zip(padded, samps, qtabs)):
                qr = q.reshape(8, 8).astype(np.float64)
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        dct = _DCT_M @ block @ _DCT_M.T
                        coeffs = np.round(dct / qr).astype(np.int64)
                        pred[ci] = _encode_block(
                            bw, coeffs, pred[ci], *enc_tabs[ci])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xDB, bytes([0x00])
                   + bytes(qluma[_ZIGZAG].astype(np.uint8))))
    if not gray:
        out.append(seg(0xDB, bytes([0x01])
                       + bytes(qchroma[_ZIGZAG].astype(np.uint8))))
    nf = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i, (sh, sv) in enumerate(samps):
        nf += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out.append(seg(0xC0, nf))
    for tc, th, (bits, values) in [(0, 0, _HT_DC_LUMA),
                                   (1, 0, _HT_AC_LUMA),
                                   (0, 1, _HT_DC_CHROMA),
                                   (1, 1, _HT_AC_CHROMA)][:2 if gray
                                                          else 4]:
        out.append(seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                       + bytes(values)))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(bytes(bw.out))
    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------------------
# GIF (87a/89a, first frame)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, table
    capped at 4096 entries. ``max_pixels`` bounds output (bomb guard)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, code_size, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        next_code = eoi + 1

    code_size = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("LZW output exceeds image size")
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder (for tests / thumbnails): standard greedy table
    build, CLEAR emitted at table overflow, LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to uint8 (h, w, 3) RGB —
    or (h, w, 4) RGBA when the frame's graphic-control extension marks a
    transparent index. Handles local color tables, interlaced frames,
    and LZW sub-block streams; animation composition (later frames,
    disposal) is out of scope — frame sampling happens upstream."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            subs = []
            while pos < len(data) and data[pos]:
                ln = data[pos]
                subs.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and subs:  # graphic control
                gce = subs[0]
                if len(gce) >= 4 and gce[0] & 0x01:
                    transparent = gce[3]
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        _, _, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data, np.uint8, count=n * 3,
                               offset=pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if w < 1 or h < 1 or w * h > 1 << 28:
            raise ValueError("bad GIF dimensions")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad GIF LZW code size {min_code}")
        comp = bytearray()
        while pos < len(data) and data[pos]:
            ln = data[pos]
            comp += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx_flat = _lzw_decode(bytes(comp), min_code, w * h)
        if len(idx_flat) < w * h:
            raise ValueError("truncated GIF pixel data")
        idx = np.frombuffer(bytes(idx_flat), np.uint8,
                            count=w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, h, step)
                 for start, step in _GIF_INTERLACE_PASSES])
            deinterlaced = np.empty_like(idx)
            deinterlaced[order] = idx
            idx = deinterlaced
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF index out of color-table range")
        rgb = ct[idx]
        if transparent >= 0:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            return np.ascontiguousarray(np.dstack([rgb, alpha]))
        return np.ascontiguousarray(rgb)
    raise ValueError("GIF contained no image block")


def gif_encode(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (<= 256 distinct colors) as a
    single-frame GIF89a. ``interlace`` writes the 4-pass row order so
    tests can pin the deinterlace path."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("gif_encode wants (h, w, 3) RGB")
    h, w = a.shape[:2]
    colors, inverse = np.unique(a.reshape(-1, 3), axis=0,
                                return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode supports <= 256 distinct colors")
    bits = max(2, int(np.ceil(np.log2(max(2, len(colors))))))
    n = 1 << bits
    palette = np.zeros((n, 3), np.uint8)
    palette[:len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step)
             for start, step in _GIF_INTERLACE_PASSES])
        rows = idx[order]
    else:
        rows = idx
    comp = _lzw_encode(rows.tobytes(), bits)
    subs = bytearray()
    for i in range(0, len(comp), 255):
        part = comp[i:i + 255]
        subs.append(len(part))
        subs += part
    subs.append(0)
    ipacked = 0x40 if interlace else 0
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
            + palette.tobytes()
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
            + bytes([ipacked, bits]) + bytes(subs) + b"\x3b")


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM)
# ---------------------------------------------------------------------------


def wav_encode(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM ((n,) mono or (n, ch) interleaved) as RIFF/WAVE."""
    a = np.ascontiguousarray(pcm, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[1] < 1:
        raise ValueError("pcm must be (n,) or (n, ch)")
    n, ch = a.shape
    body = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    payload = (b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode RIFF/WAVE PCM -> (sample_rate, int16 array (n,) or (n, ch)).
    Accepts 16-bit signed and 8-bit unsigned PCM (8-bit is widened to
    int16 full-scale)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    n = len(data)
    fmt = None
    body = None
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8:pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif tag == b"data":
            body = chunk
        pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _byterate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or ch < 1:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 16:
        pcm = np.frombuffer(body, dtype="<i2",
                            count=len(body) // 2).astype(np.int16)
    else:
        pcm = ((np.frombuffer(body, dtype=np.uint8).astype(np.int16)
                - 128) << 8)
    if ch > 1:
        pcm = pcm[:len(pcm) // ch * ch].reshape(-1, ch)
    return rate, pcm


# ---------------------------------------------------------------------------
# MJPEG-in-AVI (RIFF) — a real compressed-video container the in-repo
# baseline-JPEG codec can drive end-to-end: encoder writes a
# spec-shaped AVI (hdrl/avih + strl/strh'vids'/MJPG + strf
# BITMAPINFOHEADER, movi '00dc' chunks, idx1), decoder walks the RIFF
# tree. Replaces the FAKEVID stub for the one codec family that is
# honestly implementable without native libraries.
# ---------------------------------------------------------------------------

AVI_MAGIC_PREFIX = b"RIFF"


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + payload)


def avi_mjpeg_encode(frames, fps: int = 10, quality: int = 85) -> bytes:
    """Encode uint8 frames ((h, w) gray or (h, w, 3) RGB, all the same
    shape) as an MJPEG AVI."""
    if not frames:
        raise ValueError("avi needs at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [jpeg_encode(f, quality=quality) for f in frames]

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),              # dwMicroSecPerFrame
        sum(map(len, jpegs)) * max(fps, 1),    # dwMaxBytesPerSec (approx)
        0, 0x10,                               # padding, AVIF_HASINDEX
        len(jpegs), 0, 1,                      # frames, initial, streams
        max(map(len, jpegs)), w, h,            # bufsize, width, height
        0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1),
                          0, len(jpegs), max(map(len, jpegs)),
                          0xFFFFFFFF, 0)
            + struct.pack("<HHHH", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl",
                                   _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))

    movi_payload = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_payload))
        movi_payload += _riff_chunk(b"00dc", j)
    movi = _riff_chunk(b"LIST", movi_payload)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))
        for off, j in zip(offsets, jpegs))
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_iter(data: bytes, start: int, end: int):
    # never trust declared sizes past the real buffer (truncated /
    # hostile files)
    end = min(end, len(data))
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        size = min(size, end - pos - 8)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_mjpeg_probe(data: bytes) -> dict:
    """Header-only probe: {width, height, n_frames, fps}. Raises
    ValueError on non-AVI payloads."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    out = {"width": 0, "height": 0, "n_frames": 0, "fps": 0}

    def walk(start: int, end: int) -> None:
        for fourcc, off, size in _riff_iter(data, start, end):
            if fourcc == b"LIST":
                walk(off + 4, off + size)
            elif fourcc == b"avih" and size >= 40:
                (usec,) = struct.unpack_from("<I", data, off)
                (nframes,) = struct.unpack_from("<I", data, off + 16)
                w, h = struct.unpack_from("<II", data, off + 32)
                out.update(width=int(w), height=int(h),
                           n_frames=int(nframes),
                           fps=round(1_000_000 / usec) if usec else 0)

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    return out


def avi_mjpeg_frames(data: bytes):
    """Yield (frame_idx, jpeg_bytes) for every video chunk ('00dc' /
    '00db') in the movi list, in stream order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    idx = 0

    def walk(start: int, end: int):
        nonlocal idx
        for fourcc, off, size in _riff_iter(data, start, end):
            if fourcc == b"LIST":
                ltype = data[off:off + 4]
                if ltype in (b"movi", b"rec "):
                    yield from walk(off + 4, off + size)
            elif fourcc[2:4] in (b"dc", b"db"):
                yield idx, data[off:off + size]
                idx += 1

    yield from walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
