"""Payload content-type sniffing (S7 format router analog).

The reference routes by file extension
(/root/reference/src/converters/file_converter.py:64-100); web payloads have
no trustworthy extension, so we sniff magic bytes per row inside the batch
UDF and branch HTML vs PDF vs unknown.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"


def sniff_payload(payload: bytes) -> str:
    """Return 'pdf' | 'html' | 'empty' | 'unknown' for a raw payload."""
    if not payload:
        return "empty"
    head = payload[:1024]
    if head.startswith(PDF_MAGIC):
        return "pdf"
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
