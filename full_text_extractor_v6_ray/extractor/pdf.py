"""PDF branch (M22 analog): in-process text + link extraction from PDF bytes.

The reference extracts PDF text/links via PyMuPDF
(/root/reference/src/converters/hyperlink_extractor.py:201-307) and renders
decks through a LibreOffice *subprocess* (app_v5.py:377-390) — the rebuild
replaces both with pure in-process parsing (north_star requirement).

PyMuPDF is not available in this environment, so this module implements a
minimal, deterministic parser for UNCOMPRESSED PDF content streams — the
kind our synthetic corpus generates (FIXTURES.md: "%PDF- minimal docs"):

  - text: literal strings in ``Tj`` / ``TJ`` operators inside ``BT..ET``
    blocks, with PDF string escapes decoded; one paragraph per BT block;
  - links: ``/URI (...)`` action entries.

Real-world compressed/encrypted PDFs are out of scope here: if PyMuPDF is
installed it is used instead (import-try gate); otherwise such payloads take
the error path with ``error='pdf_unsupported'`` rather than wrong output.
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


def _content_streams(payload: bytes):
    """Yield candidate content-stream bytes (inflating FlateDecode)."""
    pos = 0
    for m in _STREAM.finditer(payload):
        body = m.group(1)
        # look back for /FlateDecode in the stream's dict
        dict_start = payload.rfind(b"<<", pos, m.start())
        header = payload[dict_start:m.start()] if dict_start >= 0 else b""
        pos = m.end()
        if _FLATE.search(header):
            try:
                body = zlib.decompress(body)
            except Exception:
                continue
        yield body


def extract_pdf(payload: bytes) -> tuple[str, list[str], str]:
    """PDF bytes -> (extracted_text, link_urls, error).

    Paragraph per BT..ET block; strings inside one block joined with a
    single space; paragraphs joined with blank lines; each paragraph
    normalized (NFC + whitespace collapse) for byte stability.
    """
    if _HAVE_FITZ:  # pragma: no cover
        return _extract_pdf_fitz(payload)

    paragraphs: list[str] = []
    links: list[str] = []
    try:
        bodies = list(_content_streams(payload)) or [payload]
        for body in bodies:
            for bt in _BT_ET.finditer(body):
                pieces: list[str] = []
                for op in _TJ.finditer(bt.group(1)):
                    for lit in _LITERAL.finditer(op.group(0)):
                        s = _decode_pdf_string(lit.group(0)[1:-1])
                        if s:
                            pieces.append(s)
                para = normalize_text(" ".join(pieces))
                if para:
                    paragraphs.append(para)
        for m in _URI.finditer(payload):
            url = _decode_pdf_string(m.group(1)).strip()
            if url and url not in links:
                links.append(url)
        # regex URL scan of the page text (reference M22,
        # hyperlink_extractor.py:277-296) with J2 membership dedup
        for para in paragraphs:
            for m in _TEXT_URL.finditer(para):
                url = m.group(0).rstrip(".,;:)")
                if url not in links:
                    links.append(url)
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
        for page in doc:
            t = normalize_text(page.get_text())
            if t:
                paragraphs.append(t)
            for lnk in page.get_links():
                uri = lnk.get("uri")
                if uri and uri not in links:
                    links.append(uri)
        return "\n\n".join(paragraphs), links, ""
    except Exception as exc:
        return "", [], f"pdf_parse_error:{type(exc).__name__}"
