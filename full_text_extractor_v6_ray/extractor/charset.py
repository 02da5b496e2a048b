"""Charset sniffing + decoding for web-page payloads.

Common-Crawl HTML is far from all-UTF-8: a large tail of pages is
windows-125x, shift_jis, gb2312, euc-kr, koi8-r, ... The reference
never faces this (python-pptx/LibreOffice hand it decoded text); a
crawl-scale extractor must decode bytes itself or silently mojibake
every legacy page (the previous behavior: ``payload.decode("utf-8",
errors="replace")``).

Decode ladder (deterministic, documented — a pragmatic variant of the
WHATWG encoding sniff):

1. **BOM** — UTF-8 / UTF-16 LE / UTF-16 BE byte-order marks are
   conclusive and win over everything.
2. **Strict UTF-8** — if the payload decodes as valid UTF-8, use it,
   *even if a meta tag declares something else*: text that validates
   as multi-byte UTF-8 essentially never occurs by accident in legacy
   encodings, while wrong ``charset=iso-8859-1`` declarations on UTF-8
   pages are everywhere.
3. **Declared charset** — the HTML5 prescan: the first ``charset=``
   (from ``<meta charset=...>`` or ``<meta http-equiv=Content-Type
   content="...charset=...">``) inside the first 1024 bytes, resolved
   through the stdlib codec registry (which carries every legacy web
   codec). Single-byte codecs cannot fail; multi-byte declared codecs
   decode with ``errors="replace"``.
4. **windows-1252 fallback** — the HTML5 default for unlabeled
   non-UTF-8 content (superset of iso-8859-1 on the printable range).

Pure stdlib, no per-row Python beyond the one decode each payload
needs anyway; the prescan regex is compiled once at import.
"""

from __future__ import annotations

import codecs
import re

_PRESCAN_BYTES = 1024

# charset= inside the first kilobyte; value may be quoted or bare.
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-:.]+)""", re.IGNORECASE)

# WHATWG label fixups the stdlib registry doesn't alias itself.
_LABEL_FIXUPS = {
    "iso-8859-1": "windows-1252",   # HTML5: latin-1 means 1252 on the web
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "gb2312": "gb18030",            # HTML5 maps the GB family up
    "gbk": "gb18030",
    "x-sjis": "shift_jis",
}


def sniff_declared_charset(payload: bytes) -> str | None:
    """HTML5-prescan-style declared charset from the first 1 KiB, or
    None. Returns the raw lowercased label (not yet codec-resolved)."""
    m = _CHARSET_RE.search(payload[:_PRESCAN_BYTES])
    if not m:
        return None
    return m.group(1).decode("ascii", errors="replace").strip().lower()


def _resolve_codec(label: str) -> str | None:
    label = _LABEL_FIXUPS.get(label, label)
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def decode_html_payload(payload: bytes) -> tuple[str, str]:
    """Decode an HTML payload per the ladder above.

    Returns ``(text, encoding_used)`` where ``encoding_used`` is the
    canonical codec name actually applied (telemetry; stable across
    runs by construction).
    """
    # 1. BOMs (UTF-16 first: its BOM bytes are not valid UTF-8 starts)
    if payload[:3] == b"\xef\xbb\xbf":
        return payload[3:].decode("utf-8", errors="replace"), "utf-8"
    if payload[:2] == b"\xff\xfe":
        return payload[2:].decode("utf-16-le", errors="replace"), "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return payload[2:].decode("utf-16-be", errors="replace"), "utf-16-be"

    # 2. strict UTF-8 validity is near-conclusive
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass

    # 3. declared charset (skip utf-8: it just failed strict decode)
    label = sniff_declared_charset(payload)
    if label:
        codec = _resolve_codec(label)
        if codec and codec not in ("utf-8",):
            return payload.decode(codec, errors="replace"), codec

    # 4. the web's unlabeled-legacy default
    return payload.decode("cp1252", errors="replace"), "cp1252"
