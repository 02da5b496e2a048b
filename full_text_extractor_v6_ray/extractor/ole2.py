"""Legacy OLE2 binary Office payloads (.doc / .xls / .ppt) — S8 breadth.

The reference's extension router accepts the legacy binary Office
family and hands it to MarkItDown (/root/reference/config.py:78-92
priorities; /root/reference/src/converters/file_converter.py:90-97);
this engine parses the formats in-process from the public Microsoft
specs — no temp files, no subprocess, deterministic:

  - MS-CFB: the compound-file container (512-byte header, DIFAT->FAT
    sector chains, mini-FAT + mini-stream for streams under the 4096-
    byte cutoff, 128-byte directory entries);
  - MS-DOC: FIB at WordDocument offset 0 -> fcClx/lcbClx into the
    0Table/1Table stream -> CLX piece table -> text pieces (cp1252
    when the fCompressed bit is set, UTF-16LE otherwise), HYPERLINK
    field instructions (0x13 instr 0x14 display 0x15) resolved into
    (anchor, url) pairs, cell/row marks rendered as pipe rows;
  - MS-XLS: BIFF8 Workbook stream records — SST shared strings
    (CONTINUE-record splits handled per the re-emitted grbit rule),
    BOUNDSHEET -> per-sheet substreams, LABELSST / LABEL / NUMBER /
    RK / MULRK / BOOLERR cells rendered as pipe rows per sheet;
  - MS-PPT: PowerPoint Document record tree walk (container recurse on
    recVer 0xF), TextCharsAtom / TextBytesAtom / CString text in
    record order, \\r paragraph marks.

``build_doc`` / ``build_xls`` / ``build_ppt`` / ``build_cfb`` are the
fixture writers (the WARC-source pattern, sources/warc.py): they emit
spec-conformant files so tests and driver queries can plant payloads
deterministically. All reading is guarded — a malformed payload
degrades to an error string, the caller's never-raise contract holds.
"""

from __future__ import annotations

import re
import struct

from .normalize import normalize_text

OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


# ---------------------------------------------------------------------------
# MS-CFB reader
# ---------------------------------------------------------------------------

class CompoundFile:
    """Minimal-but-spec-faithful MS-CFB reader: header, chained DIFAT,
    FAT chains, directory, mini-FAT + mini-stream placement by the
    header's cutoff. Raises ValueError on malformed input."""

    def __init__(self, data: bytes):
        if len(data) < 512 or data[:8] != OLE2_MAGIC:
            raise ValueError("not_ole2")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        if not (7 <= self.sector_shift <= 20 and 2 <= self.mini_shift <= 12):
            raise ValueError("cfb_bad_shift")
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        (n_fat,) = struct.unpack_from("<I", data, 44)
        (first_dir,) = struct.unpack_from("<I", data, 48)
        (self.cutoff,) = struct.unpack_from("<I", data, 56)
        (first_minifat,) = struct.unpack_from("<I", data, 60)
        (n_minifat,) = struct.unpack_from("<I", data, 64)
        (first_difat,) = struct.unpack_from("<I", data, 68)
        (n_difat,) = struct.unpack_from("<I", data, 72)

        per = self.ssz // 4
        difat = list(struct.unpack_from("<109I", data, 76))
        sec = first_difat
        for _ in range(min(n_difat, 1 + len(data) // self.ssz)):
            if sec >= _DIFSECT:
                break
            ents = struct.unpack(f"<{per}I", self._raw_sector(sec))
            difat.extend(ents[:-1])
            sec = ents[-1]

        fat: list[int] = []
        used = 0
        for s in difat:
            if used >= n_fat:
                break
            if s >= _DIFSECT:
                continue
            fat.extend(struct.unpack(f"<{per}I", self._raw_sector(s)))
            used += 1
        self.fat = fat

        ddata = self._chain(first_dir)
        self.entries: list[dict] = []
        for off in range(0, len(ddata) - 127, 128):
            (name_len,) = struct.unpack_from("<H", ddata, off + 64)
            objtype = ddata[off + 66]
            if name_len < 2 or name_len > 64 or objtype == 0:
                continue
            name = ddata[off:off + name_len - 2].decode("utf-16-le",
                                                        "replace")
            (start,) = struct.unpack_from("<I", ddata, off + 116)
            (size,) = struct.unpack_from("<Q", ddata, off + 120)
            if self.sector_shift == 9:      # v3: only the low 32 bits
                size &= 0xFFFFFFFF
            self.entries.append({"name": name, "type": objtype,
                                 "start": start, "size": size})

        root = next((e for e in self.entries if e["type"] == 5), None)
        if root is None:
            raise ValueError("cfb_no_root")
        self._mini_stream = self._chain(root["start"], root["size"])
        mfdata = self._chain(first_minifat) if n_minifat else b""
        self.minifat = (list(struct.unpack(f"<{len(mfdata) // 4}I", mfdata))
                        if mfdata else [])

    def _raw_sector(self, sec: int) -> bytes:
        off = 512 + sec * self.ssz
        if off + self.ssz > len(self.data):
            raise ValueError("cfb_sector_oob")
        return self.data[off:off + self.ssz]

    def _chain(self, start: int, size: int | None = None) -> bytes:
        out, sec, hops = [], start, 0
        limit = len(self.fat) + 2
        while sec < _DIFSECT:
            out.append(self._raw_sector(sec))
            hops += 1
            if hops > limit:
                raise ValueError("cfb_fat_cycle")
            if sec >= len(self.fat):
                raise ValueError("cfb_fat_oob")
            sec = self.fat[sec]
        blob = b"".join(out)
        return blob[:size] if size is not None else blob

    def _mini_chain(self, start: int, size: int) -> bytes:
        out, sec, hops = [], start, 0
        limit = len(self.minifat) + 2
        while sec < _DIFSECT:
            off = sec * self.mssz
            out.append(self._mini_stream[off:off + self.mssz])
            hops += 1
            if hops > limit:
                raise ValueError("cfb_minifat_cycle")
            if sec >= len(self.minifat):
                raise ValueError("cfb_minifat_oob")
            sec = self.minifat[sec]
        return b"".join(out)[:size]

    def names(self) -> set[str]:
        return {e["name"] for e in self.entries if e["type"] == 2}

    def stream(self, name: str) -> bytes | None:
        e = next((e for e in self.entries
                  if e["type"] == 2 and e["name"] == name), None)
        if e is None:
            return None
        if e["size"] < self.cutoff:
            return self._mini_chain(e["start"], e["size"])
        return self._chain(e["start"], e["size"])


# ---------------------------------------------------------------------------
# MS-DOC text (WordDocument + piece table in the 0/1Table stream)
# ---------------------------------------------------------------------------

_FIB_FC_CLX = 154 + 33 * 8      # FibRgFcLcb97 pair 33 (Clx), MS-DOC 2.5.1
_HYPERLINK_FIELD = re.compile(
    "\x13\\s*HYPERLINK\\s+\"([^\"\x14]+)\"[^\x14]*\x14([^\x15]*)\x15",
    re.DOTALL)

# document content specials dropped after field/link handling:
# picture/footnote/annotation refs, field chars, optional hyphen
_DOC_DROP = dict.fromkeys(
    map(ord, "\x01\x02\x05\x08\x13\x14\x15\x1f"), None)


def _doc_raw_text(cf: CompoundFile) -> str:
    wd = cf.stream("WordDocument")
    if wd is None or len(wd) < 512:
        raise ValueError("doc_no_worddocument")
    (ident,) = struct.unpack_from("<H", wd, 0)
    if ident != 0xA5EC:
        raise ValueError("doc_bad_fib")
    (flags,) = struct.unpack_from("<H", wd, 0x000A)
    table = cf.stream(("1" if flags & 0x0200 else "0") + "Table")
    if table is None:
        raise ValueError("doc_no_table_stream")
    (fc_clx,) = struct.unpack_from("<I", wd, _FIB_FC_CLX)
    (lcb_clx,) = struct.unpack_from("<I", wd, _FIB_FC_CLX + 4)
    clx = table[fc_clx:fc_clx + lcb_clx]

    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:   # Prc grpprl blocks
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("doc_no_pcdt")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (lcb - 4) // 12
    if n < 0 or len(plc) < 4 * (n + 1) + 8 * n:
        raise ValueError("doc_bad_plcpcd")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: list[str] = []
    for i in range(n):
        (fc_raw,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        cch = cps[i + 1] - cps[i]
        if compressed:
            parts.append(wd[fc // 2:fc // 2 + cch].decode("cp1252",
                                                          "replace"))
        else:
            parts.append(wd[fc:fc + 2 * cch].decode("utf-16-le", "replace"))
    return "".join(parts)


def _doc_render(raw: str) -> tuple[str, list[tuple[str, str]]]:
    """Raw piece text -> (markdown-ish text, links). HYPERLINK fields
    collapse to their display text; cell marks (0x07) become pipe rows;
    \\r / \\x0c split paragraphs; \\x0b is an in-paragraph line break."""
    links = [(normalize_text(m.group(2)) or m.group(1), m.group(1))
             for m in _HYPERLINK_FIELD.finditer(raw)]
    raw = _HYPERLINK_FIELD.sub(lambda m: m.group(2), raw)
    raw = raw.translate(_DOC_DROP)
    paragraphs: list[str] = []
    for para in re.split("[\r\x0c\x0e]", raw):
        para = para.replace("\x0b", "\n")
        if "\x07" in para:                       # table cell/row marks
            cells = [normalize_text(c) for c in para.split("\x07") if
                     normalize_text(c)]
            if cells:
                paragraphs.append(
                    "| " + " | ".join(c.replace("|", "\\|")
                                      for c in cells) + " |")
            continue
        p = normalize_text(para)
        if p:
            paragraphs.append(p)
    return "\n\n".join(paragraphs), links


# ---------------------------------------------------------------------------
# MS-XLS (BIFF8) cells
# ---------------------------------------------------------------------------

_XLS_SST = 0x00FC
_XLS_CONTINUE = 0x003C
_XLS_BOUNDSHEET = 0x0085
_XLS_BOF = 0x0809
_XLS_EOF = 0x000A
_XLS_LABELSST = 0x00FD
_XLS_LABEL = 0x0204
_XLS_NUMBER = 0x0203
_XLS_RK = 0x027E
_XLS_MULRK = 0x00BD
_XLS_BOOLERR = 0x0205
_XLS_FORMULA = 0x0006
_XLS_STRING = 0x0207


def _biff_records(stream: bytes, start: int = 0):
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", stream, pos)
        yield rtype, stream[pos + 4:pos + 4 + rlen], pos
        pos += 4 + rlen


class _SSTCursor:
    """Byte cursor over the SST record payload plus its CONTINUE
    payloads. Fixed-width header fields never span records (MS-XLS
    2.5.293: strings split only at character boundaries); when string
    DATA crosses into a CONTINUE record its first byte is a fresh grbit
    re-declaring the encoding of the remaining characters."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.segs[self.i]) - self.pos

    def _hop(self) -> None:
        self.i += 1
        self.pos = 0

    def exact(self, n: int) -> bytes:
        while self._avail() == 0 and self.i + 1 < len(self.segs):
            self._hop()
        b = self.segs[self.i][self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("sst_truncated")
        self.pos += n
        return b

    def skip(self, n: int) -> None:
        while n:
            while self._avail() == 0 and self.i + 1 < len(self.segs):
                self._hop()
            take = min(n, self._avail())
            if take == 0:
                raise ValueError("sst_truncated")
            self.pos += take
            n -= take

    def string(self) -> str:
        (cch,) = struct.unpack("<H", self.exact(2))
        flags = self.exact(1)[0]
        wide = bool(flags & 0x01)
        c_run = struct.unpack("<H", self.exact(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<I", self.exact(4))[0] if flags & 0x04 else 0
        chunks: list[str] = []
        remaining = cch
        while remaining:
            if self._avail() == 0:
                if self.i + 1 >= len(self.segs):
                    raise ValueError("sst_truncated")
                self._hop()
                wide = bool(self.exact(1)[0] & 0x01)   # fresh grbit
            unit = 2 if wide else 1
            take = min(remaining, self._avail() // unit)
            if take == 0:
                raise ValueError("sst_truncated")
            data = self.exact(take * unit)
            chunks.append(data.decode("utf-16-le" if wide else "cp1252",
                                      "replace"))
            remaining -= take
        self.skip(c_run * 4 + cb_ext)
        return "".join(chunks)


def _xls_short_string(data: bytes, off: int) -> tuple[str, int]:
    cch = data[off]
    flags = data[off + 1]
    if flags & 0x01:
        end = off + 2 + 2 * cch
        return data[off + 2:end].decode("utf-16-le", "replace"), end
    end = off + 2 + cch
    return data[off + 2:end].decode("cp1252", "replace"), end


def _rk_value(v: int) -> float:
    if v & 0x02:
        val = float(struct.unpack("<i", struct.pack("<I", v))[0] >> 2)
    else:
        (val,) = struct.unpack("<d", struct.pack("<Q",
                                                 (v & 0xFFFFFFFC) << 32))
    return val / 100 if v & 0x01 else val


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else f"{v:g}"


def _xls_cells(cf: CompoundFile) -> str:
    wb = cf.stream("Workbook")
    if wb is None:
        wb = cf.stream("Book")
    if wb is None:
        raise ValueError("xls_no_workbook")

    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    recs = list(_biff_records(wb))
    for idx, (rtype, data, _off) in enumerate(recs):
        if rtype == _XLS_EOF:
            break
        if rtype == _XLS_BOUNDSHEET:
            (lb_ply_pos,) = struct.unpack_from("<I", data, 0)
            name, _ = _xls_short_string(data, 6)
            sheets.append((name, lb_ply_pos))
        elif rtype == _XLS_SST:
            (_total, unique) = struct.unpack_from("<II", data, 0)
            segs = [data[8:]]
            for nt, nd, _no in recs[idx + 1:]:
                if nt != _XLS_CONTINUE:
                    break
                segs.append(nd)
            cur = _SSTCursor(segs)
            for _ in range(unique):
                sst.append(cur.string())

    lines: list[str] = []
    for name, ply in sheets:
        cells: dict[int, dict[int, str]] = {}
        pending_string: tuple[int, int] | None = None
        for rtype, data, _off in _biff_records(wb, ply):
            if rtype == _XLS_EOF:
                break
            if rtype == _XLS_FORMULA:
                # cached result (MS-XLS 2.4.127 FormulaValue): a plain
                # f64 unless the high word is 0xFFFF, then byte 0 tags
                # string (0: value arrives in the next STRING record) /
                # bool (1) / error (2) / blank (3)
                row, col, _xf = struct.unpack_from("<HHH", data, 0)
                if struct.unpack_from("<H", data, 12)[0] == 0xFFFF:
                    tag = data[6]
                    if tag == 0:
                        pending_string = (row, col)
                    elif tag == 1:
                        cells.setdefault(row, {})[col] = \
                            "TRUE" if data[8] else "FALSE"
                else:
                    (v,) = struct.unpack_from("<d", data, 6)
                    cells.setdefault(row, {})[col] = _fmt_num(v)
                continue
            if rtype == _XLS_STRING:
                if pending_string is not None:
                    (cch,) = struct.unpack_from("<H", data, 0)
                    wide = data[2] & 0x01
                    if wide:
                        s = data[3:3 + 2 * cch].decode("utf-16-le",
                                                       "replace")
                    else:
                        s = data[3:3 + cch].decode("cp1252", "replace")
                    r0, c0 = pending_string
                    cells.setdefault(r0, {})[c0] = s
                    pending_string = None
                continue
            if rtype == _XLS_LABELSST:
                row, col, _xf, isst = struct.unpack_from("<HHHI", data, 0)
                if isst < len(sst):
                    cells.setdefault(row, {})[col] = sst[isst]
            elif rtype == _XLS_LABEL:
                row, col = struct.unpack_from("<HH", data, 0)
                (cch,) = struct.unpack_from("<H", data, 6)
                flags = data[8]
                if flags & 0x01:
                    s = data[9:9 + 2 * cch].decode("utf-16-le", "replace")
                else:
                    s = data[9:9 + cch].decode("cp1252", "replace")
                cells.setdefault(row, {})[col] = s
            elif rtype == _XLS_NUMBER:
                row, col, _xf = struct.unpack_from("<HHH", data, 0)
                (v,) = struct.unpack_from("<d", data, 6)
                cells.setdefault(row, {})[col] = _fmt_num(v)
            elif rtype == _XLS_RK:
                row, col, _xf, rk = struct.unpack_from("<HHHI", data, 0)
                cells.setdefault(row, {})[col] = _fmt_num(_rk_value(rk))
            elif rtype == _XLS_MULRK:
                row, col0 = struct.unpack_from("<HH", data, 0)
                k = (len(data) - 6) // 6
                for j in range(k):
                    (rk,) = struct.unpack_from("<I", data, 4 + 6 * j + 2)
                    cells.setdefault(row, {})[col0 + j] = \
                        _fmt_num(_rk_value(rk))
            elif rtype == _XLS_BOOLERR:
                row, col, _xf, val, is_err = struct.unpack_from(
                    "<HHHBB", data, 0)
                if not is_err:
                    cells.setdefault(row, {})[col] = \
                        "TRUE" if val else "FALSE"
        if cells:
            lines.append(f"## {normalize_text(name)}")
            for row in sorted(cells):
                vals = [normalize_text(cells[row][c])
                        for c in sorted(cells[row])]
                lines.append("| " + " | ".join(v.replace("|", "\\|")
                                               for v in vals) + " |")
    return "\n\n".join(lines)


# ---------------------------------------------------------------------------
# MS-PPT text atoms
# ---------------------------------------------------------------------------

_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8
_PPT_CSTRING = 0x0FBA
_PPT_SLIDE_PERSIST = 0x03F3


def _ppt_text(cf: CompoundFile) -> str:
    """Text atoms in record order; when the stream carries
    SlidePersistAtoms (the SlideListWithText layout real decks use),
    atoms group under ``## Slide N`` headers in slide order — the
    reference's per-slide markdown shape
    (powerpoint_processor.py:222-243)."""
    s = cf.stream("PowerPoint Document")
    if s is None:
        raise ValueError("ppt_no_document_stream")
    events: list = []          # "break" | decoded atom text

    def walk(data: bytes, depth: int) -> None:
        pos = 0
        while pos + 8 <= len(data):
            ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
            body = data[pos + 8:pos + 8 + rlen]
            if (ver_inst & 0x000F) == 0x000F and depth < 16:
                walk(body, depth + 1)
            elif rtype == _PPT_SLIDE_PERSIST:
                events.append(None)
            elif rtype in (_PPT_TEXT_CHARS, _PPT_CSTRING):
                events.append(body.decode("utf-16-le", "replace"))
            elif rtype == _PPT_TEXT_BYTES:
                events.append(body.decode("cp1252", "replace"))
            pos += 8 + rlen

    walk(s, 0)
    has_slides = any(e is None for e in events)
    paragraphs: list[str] = []
    slide_no = 0
    pending_header = False
    for ev in events:
        if ev is None:
            slide_no += 1
            pending_header = True
            continue
        for para in ev.split("\r"):
            p = normalize_text(para.replace("\x0b", "\n"))
            if p:
                if has_slides and pending_header:
                    paragraphs.append(f"## Slide {slide_no}")
                    pending_header = False
                paragraphs.append(p)
    return "\n\n".join(paragraphs)


# ---------------------------------------------------------------------------
# SummaryInformation property set (MS-OLEPS) — the binary-Office analog
# of the OOXML docProps/core.xml walk (reference metadata_extractor.py)
# ---------------------------------------------------------------------------

_SUMMARY_STREAM = "\x05SummaryInformation"
_FMTID_SUMMARY = bytes.fromhex("e085 9ff2 f94f 6810 ab91 08002b27b3d9"
                               .replace(" ", ""))
# PIDSI property ids -> field names (MS-OLEPS / MS-PROPSTORE)
_PIDSI = {2: "title", 3: "subject", 4: "author", 5: "keywords",
          6: "comments", 8: "last_modified_by", 9: "revision",
          12: "created", 13: "modified"}
_VT_LPSTR = 30
_VT_LPWSTR = 31
_VT_I4 = 3
_VT_FILETIME = 64
_FILETIME_EPOCH_DELTA = 11644473600  # 1601 -> 1970, seconds


def _filetime_iso(ft: int) -> str:
    import datetime

    secs = ft // 10_000_000 - _FILETIME_EPOCH_DELTA
    try:
        dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            seconds=secs)
    except OverflowError:
        return ""
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


_DOCSUMMARY_STREAM = "\x05DocumentSummaryInformation"
_FMTID_DOCSUMMARY = bytes.fromhex(
    "02d5cdd5 9c2e 1b10 9397 08002b2cf9ae".replace(" ", ""))
# PIDDSI property ids -> field names
_PIDDSI = {2: "category", 7: "n_slides", 14: "manager", 15: "company"}


def ole2_summary_properties(payload: bytes) -> dict[str, str]:
    """Document properties from the ``\\x05SummaryInformation``
    property-set stream (MS-OLEPS): title/subject/author/keywords/
    comments/last_modified_by/revision/created/modified, every value
    normalized to a string, missing -> "". Never raises."""
    return _read_property_set(payload, _SUMMARY_STREAM, _FMTID_SUMMARY,
                              _PIDSI)


def ole2_doc_summary_properties(payload: bytes) -> dict[str, str]:
    """Properties from ``\\x05DocumentSummaryInformation`` (PIDDSI):
    category / slide count / manager / company. Never raises."""
    return _read_property_set(payload, _DOCSUMMARY_STREAM,
                              _FMTID_DOCSUMMARY, _PIDDSI)


def _read_property_set(payload: bytes, stream_name: str, fmtid: bytes,
                       pid_map: dict) -> dict[str, str]:
    out = {k: "" for k in pid_map.values()}
    try:
        cf = CompoundFile(payload)
        s = cf.stream(stream_name)
        if s is None or len(s) < 48:
            return out
        (byte_order,) = struct.unpack_from("<H", s, 0)
        if byte_order != 0xFFFE:
            return out
        (n_sections,) = struct.unpack_from("<I", s, 24)
        sec_off = None
        for i in range(min(n_sections, 4)):
            got = s[28 + 20 * i:28 + 20 * i + 16]
            if got == fmtid:
                (sec_off,) = struct.unpack_from("<I", s, 28 + 20 * i + 16)
                break
        if sec_off is None:
            return out
        (_cb, n_props) = struct.unpack_from("<II", s, sec_off)
        for i in range(min(n_props, 64)):
            pid, off = struct.unpack_from("<II", s, sec_off + 8 + 8 * i)
            name = pid_map.get(pid)
            if name is None:
                continue
            base = sec_off + off
            (vt,) = struct.unpack_from("<I", s, base)
            if vt == _VT_LPSTR:
                (n,) = struct.unpack_from("<I", s, base + 4)
                raw = s[base + 8:base + 8 + n]
                out[name] = normalize_text(
                    raw.split(b"\x00", 1)[0].decode("cp1252", "replace"))
            elif vt == _VT_LPWSTR:
                (n,) = struct.unpack_from("<I", s, base + 4)
                raw = s[base + 8:base + 8 + 2 * n]
                out[name] = normalize_text(
                    raw.decode("utf-16-le", "replace").split("\x00", 1)[0])
            elif vt == _VT_I4:
                (v,) = struct.unpack_from("<i", s, base + 4)
                out[name] = str(v)
            elif vt == _VT_FILETIME:
                (ft,) = struct.unpack_from("<Q", s, base + 4)
                out[name] = _filetime_iso(ft)
    except Exception:
        pass
    return out


def build_summary_stream(props: dict, pid_map: dict | None = None,
                         fmtid: bytes = _FMTID_SUMMARY) -> bytes:
    """Write a property-set stream (SummaryInformation by default,
    DocumentSummaryInformation via ``pid_map=_PIDDSI`` +
    ``fmtid=_FMTID_DOCSUMMARY``): strings as VT_LPSTR, ints as VT_I4,
    ``datetime`` values as VT_FILETIME."""
    import datetime

    pid_map = pid_map if pid_map is not None else _PIDSI
    entries = []
    for name, value in props.items():
        pid = next(k for k, v in pid_map.items() if v == name)
        if isinstance(value, datetime.datetime):
            ft = (int(value.timestamp() if value.tzinfo else
                      (value - datetime.datetime(1970, 1, 1))
                      .total_seconds()) + _FILETIME_EPOCH_DELTA
                  ) * 10_000_000
            body = struct.pack("<IQ", _VT_FILETIME, ft)
        elif isinstance(value, int):
            body = struct.pack("<Ii", _VT_I4, value)
        else:
            raw = str(value).encode("cp1252", "replace") + b"\x00"
            pad = (4 - len(raw) % 4) % 4
            body = struct.pack("<II", _VT_LPSTR, len(raw)) + raw + b"\x00" * pad
        entries.append((pid, body))

    head_sz = 8 + 8 * len(entries)
    offs, blob = [], b""
    for _pid, body in entries:
        offs.append(head_sz + len(blob))
        blob += body
    section = struct.pack("<II", head_sz + len(blob), len(entries))
    for (pid, _), off in zip(entries, offs):
        section += struct.pack("<II", pid, off)
    section += blob
    header = (struct.pack("<HHI", 0xFFFE, 0, 0) + b"\x00" * 16
              + struct.pack("<I", 1) + fmtid
              + struct.pack("<I", 48))
    return header + section


# ---------------------------------------------------------------------------
# router entry
# ---------------------------------------------------------------------------

def extract_ole2(payload: bytes
                 ) -> tuple[str, list[tuple[str, str]], str, str]:
    """OLE2 payload -> (text, links, method, error). Routes by stream
    names (the binary analog of extract_zip's part-name routing);
    unknown compound files report ``ole2_unsupported``."""
    try:
        cf = CompoundFile(payload)
    except Exception:
        return "", [], "ole2", "ole2_error"
    try:
        names = cf.names()
        if "WordDocument" in names:
            text, links = _doc_render(_doc_raw_text(cf))
            return text, links, "doc", "" if text or links else "doc_empty"
        if "Workbook" in names or "Book" in names:
            text = _xls_cells(cf)
            return text, [], "xls", "" if text else "xls_empty"
        if "PowerPoint Document" in names:
            text = _ppt_text(cf)
            return text, [], "ppt", "" if text else "ppt_empty"
        return "", [], "ole2", "ole2_unsupported"
    except Exception as exc:
        return "", [], "ole2", f"ole2_error:{type(exc).__name__}"


# ---------------------------------------------------------------------------
# fixture writers (MS-CFB / MS-DOC / MS-XLS / MS-PPT)
# ---------------------------------------------------------------------------

def build_cfb(streams: list[tuple[str, bytes]], cutoff: int = 4096) -> bytes:
    """Write a spec-conformant v3 compound file (512-byte sectors,
    64-byte mini sectors; streams under ``cutoff`` go through the
    mini-FAT/mini-stream exactly as MS-CFB requires)."""
    ssz, mssz = 512, 64

    def pad(b: bytes, unit: int) -> bytes:
        r = len(b) % unit
        return b + b"\x00" * (unit - r) if r else b

    minis = [(n, d) for n, d in streams if len(d) < cutoff]
    bigs = [(n, d) for n, d in streams if len(d) >= cutoff]

    # mini stream + miniFAT
    mini_blob = b""
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for name, d in minis:
        first = len(mini_blob) // mssz
        mini_start[name] = first
        padded = pad(d, mssz)
        nsec = len(padded) // mssz
        mini_blob += padded
        minifat.extend(list(range(first + 1, first + nsec)) + [_ENDOFCHAIN])

    # directory: root + one entry per stream (flat right-sibling chain)
    def dirent(name: str, objtype: int, start: int, size: int,
               child: int = _FREESECT, right: int = _FREESECT) -> bytes:
        raw = name.encode("utf-16-le")
        if len(raw) > 62:
            raise ValueError("cfb_name_too_long")
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = objtype
        e[67] = 1                       # black
        struct.pack_into("<I", e, 68, _FREESECT)        # left
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    n_entries = 1 + len(streams)
    dir_sectors = (n_entries * 128 + ssz - 1) // ssz
    minifat_blob = pad(b"".join(struct.pack("<I", v) for v in minifat), ssz) \
        if minifat else b""
    minifat_sectors = len(minifat_blob) // ssz
    mini_blob_p = pad(mini_blob, ssz)
    mini_sectors = len(mini_blob_p) // ssz
    big_padded = [(n, pad(d, ssz)) for n, d in bigs]
    big_sectors = sum(len(d) // ssz for _, d in big_padded)

    content_sectors = (dir_sectors + minifat_sectors + mini_sectors
                       + big_sectors)
    n_fat = 0
    while True:          # FAT must also cover its own sectors
        need = content_sectors + n_fat
        nf = (need * 4 + ssz - 1) // ssz
        if nf == n_fat:
            break
        n_fat = nf
    if n_fat > 109:
        raise ValueError("cfb_fixture_too_large")

    # sector layout: [dir][minifat][ministream][bigs...][fat]
    first_dir = 0
    first_minifat = dir_sectors if minifat_sectors else _ENDOFCHAIN
    mini_sec0 = dir_sectors + minifat_sectors
    big_sec0 = mini_sec0 + mini_sectors
    fat_sec0 = big_sec0 + big_sectors

    fat = [_FREESECT] * (n_fat * (ssz // 4))

    def chain(first: int, count: int) -> None:
        for i in range(count):
            fat[first + i] = first + i + 1 if i + 1 < count else _ENDOFCHAIN

    chain(first_dir, dir_sectors)
    if minifat_sectors:
        chain(dir_sectors, minifat_sectors)
    root_start = mini_sec0 if mini_sectors else _ENDOFCHAIN
    if mini_sectors:
        chain(mini_sec0, mini_sectors)
    big_start: dict[str, int] = {}
    at = big_sec0
    for name, d in big_padded:
        big_start[name] = at
        chain(at, len(d) // ssz)
        at += len(d) // ssz
    for i in range(n_fat):
        fat[fat_sec0 + i] = _FATSECT

    ents = [dirent("Root Entry", 5, root_start, len(mini_blob),
                   child=1 if streams else _FREESECT)]
    for i, (name, d) in enumerate(streams):
        start = (mini_start[name] if len(d) < cutoff else big_start[name])
        right = i + 2 if i + 1 < len(streams) else _FREESECT
        ents.append(dirent(name, 2, start, len(d), right=right))
    dir_blob = pad(b"".join(ents), ssz)

    header = bytearray(512)
    header[0:8] = OLE2_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)      # minor
    struct.pack_into("<H", header, 26, 0x0003)      # major v3
    struct.pack_into("<H", header, 28, 0xFFFE)      # little-endian
    struct.pack_into("<H", header, 30, 9)           # 512B sectors
    struct.pack_into("<H", header, 32, 6)           # 64B mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, minifat_sectors)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i,
                         fat_sec0 + i if i < n_fat else _FREESECT)

    fat_blob = b"".join(struct.pack("<I", v) for v in fat)
    body = (dir_blob + minifat_blob + mini_blob_p
            + b"".join(d for _, d in big_padded) + fat_blob)
    return bytes(header) + body


def build_doc(paragraphs: list[str],
              pieces_compressed: list[bool] | None = None,
              links: list[tuple[str, str]] | None = None,
              summary: dict | None = None) -> bytes:
    """Write a .doc: FIB + CLX piece table, one piece per paragraph
    (UTF-16LE by default; ``pieces_compressed[i]`` selects the cp1252
    fCompressed encoding for piece i). ``links`` plants HYPERLINK
    fields (instr 0x13 / sep 0x14 / end 0x15) appended as extra
    paragraphs."""
    texts = [p + "\r" for p in paragraphs]
    for anchor, url in links or []:
        texts.append(f'\x13 HYPERLINK "{url}" \x14{anchor}\x15\r')
    comp = list(pieces_compressed or [])
    comp += [False] * (len(texts) - len(comp))

    wd = bytearray(1024)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)           # nFib Word 97
    struct.pack_into("<H", wd, 0x000A, 0x0200)      # fWhichTblStm -> 1Table
    struct.pack_into("<H", wd, 32, 0x000E)          # csw
    struct.pack_into("<H", wd, 62, 0x0016)          # cslw
    struct.pack_into("<H", wd, 152, 0x005D)         # cbRgFcLcb (97)

    fcs: list[int] = []
    cps: list[int] = [0]
    for t, c in zip(texts, comp):
        data = t.encode("cp1252", "replace") if c else t.encode("utf-16-le")
        fc_byte = len(wd)
        wd.extend(data)
        fcs.append((fc_byte * 2) | 0x40000000 if c else fc_byte)
        cps.append(cps[-1] + len(t))

    n = len(texts)
    plc = b"".join(struct.pack("<I", cp) for cp in cps)
    for fc_raw in fcs:
        plc += struct.pack("<HIH", 0, fc_raw, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", wd, _FIB_FC_CLX, 0)
    struct.pack_into("<I", wd, _FIB_FC_CLX + 4, len(clx))
    streams = [("WordDocument", bytes(wd)), ("1Table", clx)]
    if summary is not None:
        streams.append((_SUMMARY_STREAM, build_summary_stream(summary)))
    return build_cfb(streams)


def _biff(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def _xls_unicode(s: str) -> bytes:
    return struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")


def build_xls(sheets: list[tuple[str, list[list[object]]]],
              sst_record_cap: int | None = None) -> bytes:
    """Write a BIFF8 .xls: globals (BOF, BOUNDSHEETs, SST, EOF) + one
    substream per sheet (strings as LABELSST into the SST, ints/floats
    as NUMBER records). ``sst_record_cap`` forces the SST to split into
    CONTINUE records at that payload size (default 8224, the real BIFF
    limit) — set it low in tests to exercise the continuation path."""
    cap = sst_record_cap or 8224
    strings: list[str] = []
    index: dict[str, int] = {}
    for _name, rows in sheets:
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in index:
                    index[v] = len(strings)
                    strings.append(v)

    # SST payload split across CONTINUE records at character boundaries,
    # re-emitting the grbit byte at each split (MS-XLS 2.5.293)
    segs: list[bytearray] = [bytearray(struct.pack(
        "<II", len(strings), len(strings)))]

    def room() -> int:
        return cap - len(segs[-1])

    for s in strings:
        if room() < 3 + 2:              # header + at least one wide char
            segs.append(bytearray())
        segs[-1] += struct.pack("<HB", len(s), 0x01)
        data = s.encode("utf-16-le")
        pos = 0
        while pos < len(data):
            if room() < 2:
                segs.append(bytearray(b"\x01"))     # fresh grbit: wide
            take = min(len(data) - pos, room() // 2 * 2)
            segs[-1] += data[pos:pos + take]
            pos += take
    sst_blob = _biff(_XLS_SST, bytes(segs[0]))
    sst_blob += b"".join(_biff(_XLS_CONTINUE, bytes(s)) for s in segs[1:])

    bof_globals = _biff(_XLS_BOF, struct.pack("<HHHHII", 0x0600, 0x0005,
                                              0x0DBB, 0x07CC, 0, 0))
    bof_sheet_payload = struct.pack("<HHHHII", 0x0600, 0x0010,
                                    0x0DBB, 0x07CC, 0, 0)

    sheet_blobs: list[bytes] = []
    for _name, rows in sheets:
        recs = [_biff(_XLS_BOF, bof_sheet_payload)]
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if isinstance(v, str):
                    recs.append(_biff(_XLS_LABELSST, struct.pack(
                        "<HHHI", r, c, 0, index[v])))
                elif isinstance(v, bool):
                    recs.append(_biff(_XLS_BOOLERR, struct.pack(
                        "<HHHBB", r, c, 0, int(v), 0)))
                elif v is not None:
                    recs.append(_biff(_XLS_NUMBER, struct.pack(
                        "<HHHd", r, c, 0, float(v))))
        recs.append(_biff(_XLS_EOF, b""))
        sheet_blobs.append(b"".join(recs))

    # BOUNDSHEET lbPlyPos needs the final offsets: compute globals size
    # first with placeholder positions, then patch
    def bsheet(name: str, pos: int) -> bytes:
        nm = name[:31]
        return _biff(_XLS_BOUNDSHEET,
                     struct.pack("<IHBB", pos, 0, len(nm), 0x01)
                     + nm.encode("utf-16-le"))

    bs = [bsheet(n, 0) for n, _ in sheets]
    globals_len = (len(bof_globals) + sum(len(b) for b in bs)
                   + len(sst_blob) + 4)
    out = [bof_globals]
    at = globals_len
    for (name, _rows), blob in zip(sheets, sheet_blobs):
        out.append(bsheet(name, at))
        at += len(blob)
    out.append(sst_blob)
    out.append(_biff(_XLS_EOF, b""))
    wb = b"".join(out) + b"".join(sheet_blobs)
    return build_cfb([("Workbook", wb)])


def _ppt_atoms(texts: list[str], as_bytes: list[bool]) -> bytes:
    atoms = b""
    for t, b in zip(texts, as_bytes):
        if b:
            atoms += struct.pack("<HHI", 0x0000, _PPT_TEXT_BYTES,
                                 len(t)) + t.encode("cp1252", "replace")
        else:
            data = t.encode("utf-16-le")
            atoms += struct.pack("<HHI", 0x0000, _PPT_TEXT_CHARS,
                                 len(data)) + data
    return atoms


def build_ppt(texts: list[str] | None = None,
              as_bytes: list[bool] | None = None,
              slides: list[list[str]] | None = None) -> bytes:
    """Write a .ppt 'PowerPoint Document' stream: a Document container
    holding one text atom per entry (TextCharsAtom UTF-16LE, or
    TextBytesAtom cp1252 where ``as_bytes[i]``). ``slides`` instead
    builds a SlideListWithText layout — one SlidePersistAtom per slide
    followed by that slide's text atoms (the real-deck record shape the
    reader renders with ``## Slide N`` headers)."""
    if slides is not None:
        body = b""
        for slide_texts in slides:
            body += struct.pack("<HHI", 0x0000, _PPT_SLIDE_PERSIST, 20
                                ) + b"\x00" * 20
            body += _ppt_atoms(slide_texts, [False] * len(slide_texts))
        slwt = struct.pack("<HHI", 0x000F, 0x0FF0, len(body)) + body
        doc = struct.pack("<HHI", 0x000F, 0x03E8, len(slwt)) + slwt
        return build_cfb([("PowerPoint Document", doc)])
    texts = texts or []
    ab = list(as_bytes or [])
    ab += [False] * (len(texts) - len(ab))
    atoms = _ppt_atoms(texts, ab)
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + atoms
    return build_cfb([("PowerPoint Document", doc)])
