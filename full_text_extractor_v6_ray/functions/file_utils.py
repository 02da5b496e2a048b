"""Filename/url scalar utilities (M24 analog).

Reference semantics: safe_filename replaces invalid characters and caps
length (/root/reference/src/utils/file_utils.py:84-107, tested at
tests/test_file_utils.py:113-129). Here keyed off urls for per-key
artifact paths (mostly obsolete with parquet sinks, kept for parity).
"""

from __future__ import annotations

import re

_INVALID = re.compile(r'[<>:"/\\|?*\x00-\x1f]')
_MULTI_UNDERSCORE = re.compile(r"_{2,}")


def safe_filename(name: str, max_len: int = 255) -> str:
    """Replace invalid filename chars with '_', collapse runs, cap length."""
    if not name:
        return "unnamed"
    out = _INVALID.sub("_", name)
    out = _MULTI_UNDERSCORE.sub("_", out).strip("_ .")
    if not out:
        return "unnamed"
    return out[:max_len]


def url_to_artifact_name(url: str) -> str:
    """Deterministic per-url artifact stem (host_path form)."""
    stripped = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", url or "")
    return safe_filename(stripped.replace("/", "_"))
