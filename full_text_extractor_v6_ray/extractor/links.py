"""URL normalization (M18) — the reference's one real scalar library fn.

Semantics reproduced from /root/reference/src/converters/hyperlink_extractor.py:12-35
(three identical copies exist there; one pure function here):

  - empty/None -> "" unchanged
  - already-schemed (``scheme:``) or fragment (``#...``) -> pass through
  - bare email (``a@b.c``) -> ``mailto:`` prefix
  - ``www.``-prefixed or TLD-bearing bare host -> ``https://`` prefix
  - anything else -> unchanged

Unit-tested hard (the reference's healthiest suite,
tests/test_hyperlink_extractor.py:13-44).
"""

from __future__ import annotations

import re

_EMAIL = re.compile(r"^[\w.+-]+@[\w-]+\.[\w.-]+$")
_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")
_BARE_HOST = re.compile(
    r"^(?:[\w-]+\.)+"
    r"(?:com|org|net|edu|gov|io|co|uk|de|fr|jp|au|ca|info|biz|dev|app|ai)"
    r"(?:/|$|\?)",
    re.IGNORECASE,
)


def fix_url(url: str | None) -> str:
    """Normalize a raw href the way the reference does."""
    if not url:
        return ""
    url = url.strip()
    if not url:
        return ""
    if url.startswith("#"):
        return url
    if _SCHEME.match(url):
        return url
    if _EMAIL.match(url):
        return "mailto:" + url
    if url.lower().startswith("www."):
        return "https://" + url
    if _BARE_HOST.match(url):
        return "https://" + url
    return url
