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
