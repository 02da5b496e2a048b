"""Whitespace / entity / unicode normalization (M19).

Reference behavior being reproduced (semantics, not code):
  - per-paragraph ``.strip()`` + empty-paragraph skip
    (/root/reference/src/processors/powerpoint/text_processor.py:91-96)
  - block join with blank lines
    (/root/reference/src/processors/powerpoint/markdown_converter.py:65)

Rebuild additions required for byte-stable web text: HTML entity decoding
(done at parse time by html.parser with convert_charrefs=True), unicode NFC,
and deterministic whitespace collapse.
"""

from __future__ import annotations

import re
import unicodedata

# Collapse every run of ASCII/unicode whitespace to a single space.
# \s in Python re with str input already covers unicode spaces (incl. \xa0
# which html.unescape produces for &nbsp;).
_WS_RUN = re.compile(r"\s+")

# Leading bullet characters stripped from pseudo-list text lines
# (reference bullet-char normalizer, text_processor.py:423-441).
BULLET_CHARS = "•◦▪▫‣·○■□→►✓✗※◆◇-*+"
_BULLET_PREFIX = re.compile(r"^[•◦▪▫‣·○■□→►✓✗※◆◇\-\*\+]+[ \t]*")


def normalize_ws(s: str) -> str:
    """Collapse whitespace runs to single spaces and strip ends."""
    return _WS_RUN.sub(" ", s).strip()


def normalize_text(s: str) -> str:
    """Full normalization: NFC then whitespace collapse.

    NFC first so composed/decomposed input bytes converge before any
    offset computation; spans are computed AFTER this (SURVEY.md §7.4).

    Fast path: ASCII text with no collapsible whitespace (the common case
    for short inline segments) needs neither NFC (identity on ASCII) nor
    the regex — byte-equivalent by construction (ASCII re \\s chars are
    exactly space/\\t/\\n/\\r/\\f/\\v; lone spaces collapse to themselves;
    strip handles the ends either way).
    """
    if s.isascii():
        if ("  " in s or "\t" in s or "\n" in s or "\r" in s
                or "\x0b" in s or "\x0c" in s):
            return _WS_RUN.sub(" ", s).strip()
        return s.strip()
    return normalize_ws(unicodedata.normalize("NFC", s))


def strip_bullet_prefix(s: str) -> tuple[str, bool]:
    """Remove a leading text-bullet marker; return (stripped, was_bullet).

    Mirrors the reference regex strip of leading bullet glyphs
    (text_processor.py:441) applied to text-bullet pseudo-lists.
    """
    m = _BULLET_PREFIX.match(s)
    if m and m.end() < len(s):
        return s[m.end():], True
    return s, False
