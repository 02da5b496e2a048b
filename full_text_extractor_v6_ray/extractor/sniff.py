"""Payload content-type sniffing (S7 format router analog).

The reference routes by file extension
(/root/reference/src/converters/file_converter.py:64-100); web payloads have
no trustworthy extension, so we sniff magic bytes per row inside the batch
UDF and branch HTML vs PDF vs unknown.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"
GZIP_MAGIC = b"\x1f\x8b"
ZIP_MAGIC = b"PK\x03\x04"
WARC_MAGIC = b"WARC/"
OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# Extension surface (SURVEY.md §2.9, completing the extractor-handler
# registry in document.py): custom sniffers run BEFORE the builtin
# rules, in registration order; the first non-empty kind wins. A sniffer
# is ``fn(payload: bytes) -> str`` returning '' to pass. Pair a custom
# kind with ``register_extractor(kind, handler)`` to route new payload
# families (e.g. WARC records, gzip members) end-to-end.
_SNIFFERS: list = []


def register_sniffer(fn) -> None:
    _SNIFFERS.append(fn)


def unregister_sniffer(fn) -> None:
    if fn in _SNIFFERS:
        _SNIFFERS.remove(fn)


def sniff_payload(payload: bytes) -> str:
    """Return 'pdf' | 'html' | 'empty' | 'unknown' (or a custom kind)."""
    if not payload:
        return "empty"
    for fn in _SNIFFERS:
        try:
            kind = fn(payload)
        except Exception:
            kind = ""
        if kind:
            return kind
    head = payload[:1024]
    if head.startswith(PDF_MAGIC):
        return "pdf"
    if head.startswith(WARC_MAGIC):
        return "warc"
    if head.startswith(GZIP_MAGIC):
        return "gzip"
    if head.startswith(ZIP_MAGIC):
        return "zip"
    if head.startswith(OLE2_MAGIC):
        return "ole2"   # legacy binary Office compound file
    # see through byte-order marks (UTF-16 HTML interleaves NULs that
    # would otherwise hide the markup from the ASCII probes below;
    # decoding happens later in extractor/charset.py)
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    elif head[:2] in (b"\xff\xfe", b"\xfe\xff"):
        head = head[2:].replace(b"\x00", b"")
    lowered = head.lstrip()[:256].lower()
    if (
        lowered.startswith(b"<!doctype")
        or lowered.startswith(b"<html")
        or b"<html" in lowered
        or lowered.startswith(b"<head")
        or lowered.startswith(b"<body")
        or lowered.startswith(b"<")
    ):
        return "html"
    return "unknown"
