"""PDF branch (M22 analog): in-process text + link extraction from PDF bytes.

The reference extracts PDF text/links via PyMuPDF
(/root/reference/src/converters/hyperlink_extractor.py:201-307) and renders
decks through a LibreOffice *subprocess* (app_v5.py:377-390) — the rebuild
replaces both with pure in-process parsing (north_star requirement).

PyMuPDF is not available in this environment, so this module implements a
minimal, deterministic parser covering the PDF shapes our synthetic corpus
generates (FIXTURES.md) plus the common structural features a real crawl
hits first:

  - page tree: ``/Type /Pages`` ``/Kids`` order -> per-page segmentation;
    each page's ``/Contents`` (single ref or array) and ``/Annots``;
  - content streams: ``BT..ET`` blocks with ``Tj``/``TJ`` literal strings,
    PDF escapes decoded; FlateDecode streams inflated;
  - object streams (``/Type /ObjStm``, PDF 1.5+): decompressed and their
    contained objects (e.g. link annotations) indexed like top-level ones;
  - links: ``/URI`` actions per page (placeholder text ``Link on page N``,
    the reference's no-rect-text fallback, hyperlink_extractor.py:324-368)
    plus a regex URL scan of the page text with a +/-50-char context
    window (hyperlink_extractor.py:283-296), deduped per (url, page) (J2).

Payloads with no recognizable structure take the error path with
``error='pdf_unsupported'`` rather than wrong output; if PyMuPDF is
installed it is used instead (import-try gate).
"""

from __future__ import annotations

import re
import zlib

try:  # pragma: no cover - not present in this environment
    import fitz  # type: ignore
    _HAVE_FITZ = True
except Exception:  # pragma: no cover
    fitz = None
    _HAVE_FITZ = False

from .normalize import normalize_text

_BT_ET = re.compile(rb"BT(.*?)ET", re.DOTALL)
_TJ = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\[\]\\]|\\.)*?\]\s*TJ",
                 re.DOTALL)
_LITERAL = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.DOTALL)
_URI = re.compile(rb"/URI\s*\(((?:[^()\\]|\\.)*)\)")
_STREAM = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TEXT_URL = re.compile(r"https?://[^\s<>()\"']+")
_FLATE = re.compile(rb"/FlateDecode")

_OBJ = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_TYPE_PAGES = re.compile(rb"/Type\s*/Pages\b")
_TYPE_PAGE = re.compile(rb"/Type\s*/Page(?!s)\b")
_TYPE_OBJSTM = re.compile(rb"/Type\s*/ObjStm\b")
_KIDS = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_REF = re.compile(rb"(\d+)\s+\d+\s+R\b")
_CONTENTS_REF = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R\b")
_CONTENTS_ARR = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_ANNOTS = re.compile(rb"/Annots\s*\[(.*?)\]", re.DOTALL)
_FIRST = re.compile(rb"/First\s+(\d+)\b")

_CONTEXT_CHARS = 50   # reference hyperlink_extractor.py:283-296 window

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string body (between parens), incl. escapes."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        ch = raw[i:i + 1]
        if ch == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and raw[j:j + 1].isdigit():
                    digits += raw[j:j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += ch
        i += 1
    return out.decode("latin-1")


def _parse_objects(payload: bytes) -> dict[int, bytes]:
    """objnum -> object body, including objects unpacked from ObjStm."""
    objs: dict[int, bytes] = {}
    for m in _OBJ.finditer(payload):
        objs[int(m.group(1))] = m.group(2)
    # expand object streams (compressed containers of non-stream objects)
    for num, body in list(objs.items()):
        if not _TYPE_OBJSTM.search(body):
            continue
        data = _stream_bytes(body)
        fm = _FIRST.search(body)
        if data is None or not fm:
            continue
        first = int(fm.group(1))
        try:
            header = data[:first].split()
            for k in range(0, len(header) - 1, 2):
                onum = int(header[k])
                off = int(header[k + 1])
                if k + 3 < len(header):
                    end = first + int(header[k + 3])
                else:
                    end = len(data)
                objs.setdefault(onum, data[first + off:end])
        except Exception:
            continue
    return objs


_LENGTH = re.compile(rb"/Length\s+(\d+)\b")
_STREAM_START = re.compile(rb"stream\r?\n")


def _stream_bytes(body: bytes) -> bytes | None:
    """The (inflated) stream payload of one object body, or None.

    Uses the dict's /Length when present (spec-correct — binary stream
    data may itself end in \\r/\\n bytes, which the delimiter regex would
    otherwise eat, truncating e.g. Flate data); regex fallback for
    streams without a literal Length.
    """
    sm = _STREAM_START.search(body)
    if not sm:
        return None
    header = body[:sm.start()]
    lm = _LENGTH.search(header)
    if lm:
        data = body[sm.end():sm.end() + int(lm.group(1))]
    else:
        m = _STREAM.search(body)
        if not m:
            return None
        data = m.group(1)
    if _FLATE.search(header):
        try:
            data = zlib.decompress(data)
        except Exception:
            return None
    return data


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in /Kids order (appearance order fallback)."""
    for body in objs.values():
        if _TYPE_PAGES.search(body):
            km = _KIDS.search(body)
            if km:
                kids = [int(r.group(1)) for r in _REF.finditer(km.group(1))]
                pages = [k for k in kids
                         if k in objs and _TYPE_PAGE.search(objs[k])]
                if pages:
                    return pages
    return [n for n, b in objs.items() if _TYPE_PAGE.search(b)]


def _page_paragraphs(objs: dict[int, bytes], page_body: bytes) -> list[str]:
    refs: list[int] = []
    cm = _CONTENTS_REF.search(page_body)
    if cm:
        refs.append(int(cm.group(1)))
    else:
        am = _CONTENTS_ARR.search(page_body)
        if am:
            refs.extend(int(r.group(1)) for r in _REF.finditer(am.group(1)))
    paragraphs: list[str] = []
    for ref in refs:
        data = _stream_bytes(objs.get(ref, b""))
        if data is None:
            continue
        paragraphs.extend(_stream_paragraphs(data))
    return paragraphs


def _stream_paragraphs(data: bytes) -> list[str]:
    out: list[str] = []
    for bt in _BT_ET.finditer(data):
        pieces: list[str] = []
        for op in _TJ.finditer(bt.group(1)):
            for lit in _LITERAL.finditer(op.group(0)):
                s = _decode_pdf_string(lit.group(0)[1:-1])
                if s:
                    pieces.append(s)
        para = normalize_text(" ".join(pieces))
        if para:
            out.append(para)
    return out


def _context_window(text: str, start: int, end: int) -> str:
    """+/-50-char text window around a match, whitespace-collapsed."""
    lo = max(0, start - _CONTEXT_CHARS)
    hi = min(len(text), end + _CONTEXT_CHARS)
    return normalize_text(text[lo:hi])


def _scan_text_urls(page_no: int, paragraphs: list[str], seen: set,
                    links: list) -> None:
    """Regex URL scan with context windows + (url, page) membership dedup."""
    for para in paragraphs:
        for m in _TEXT_URL.finditer(para):
            url = m.group(0).rstrip(".,;:)")
            if (url, page_no) in seen:
                continue
            seen.add((url, page_no))
            links.append((_context_window(para, m.start(),
                                          m.start() + len(url)), url))


def extract_pdf(payload: bytes) -> tuple[str, list[tuple[str, str]], str]:
    """PDF bytes -> (extracted_text, [(link_text, url)], error).

    Page-segmented: paragraph per BT..ET block, pages joined in /Kids
    order with blank lines. Links carry either the annotation placeholder
    (``Link on page N``) or the +/-50-char text context of a regex match.
    """
    if _HAVE_FITZ:  # pragma: no cover
        return _extract_pdf_fitz(payload)

    paragraphs: list[str] = []
    links: list[tuple[str, str]] = []
    seen: set[tuple[str, int]] = set()
    try:
        objs = _parse_objects(payload)
        pages = _page_order(objs)
        if pages:
            for pno, pnum in enumerate(pages, start=1):
                body = objs[pnum]
                page_paras = _page_paragraphs(objs, body)
                paragraphs.extend(page_paras)
                am = _ANNOTS.search(body)
                if am:
                    for r in _REF.finditer(am.group(1)):
                        ab = objs.get(int(r.group(1)), b"")
                        for um in _URI.finditer(ab):
                            url = _decode_pdf_string(um.group(1)).strip()
                            if url and (url, pno) not in seen:
                                seen.add((url, pno))
                                links.append((f"Link on page {pno}", url))
                _scan_text_urls(pno, page_paras, seen, links)
        else:
            # no page tree (fragmentary payload): flat stream scan
            bodies = [b for b in
                      (_stream_bytes(o) for o in objs.values())
                      if b is not None] or [payload]
            for body in bodies:
                paragraphs.extend(_stream_paragraphs(body))
            for m in _URI.finditer(payload):
                url = _decode_pdf_string(m.group(1)).strip()
                if url and (url, 1) not in seen:
                    seen.add((url, 1))
                    links.append(("Link on page 1", url))
            _scan_text_urls(1, paragraphs, seen, links)
    except Exception as exc:  # degradation principle: never raise
        return "", [], f"pdf_parse_error:{type(exc).__name__}"

    if not paragraphs and not links:
        return "", [], "pdf_unsupported"
    return "\n\n".join(paragraphs), links, ""


def _extract_pdf_fitz(payload: bytes):  # pragma: no cover
    """PyMuPDF path (matches reference hyperlink_extractor.py:224-247)."""
    try:
        doc = fitz.open(stream=payload, filetype="pdf")
        paragraphs, links = [], []
        seen = set()
        for pno, page in enumerate(doc, start=1):
            t = normalize_text(page.get_text())
            if t:
                paragraphs.append(t)
            for lnk in page.get_links():
                uri = lnk.get("uri")
                if uri and (uri, pno) not in seen:
                    seen.add((uri, pno))
                    links.append((f"Link on page {pno}", uri))
        return "\n\n".join(paragraphs), links, ""
    except Exception as exc:
        return "", [], f"pdf_parse_error:{type(exc).__name__}"
