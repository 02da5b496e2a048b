"""Document-level extraction: sniff -> route -> extract -> normalize -> score.

The per-row pure function the Ray batch stage calls once per page. Mirrors
the reference's dual-strategy router (`_has_xml_access` sophisticated-vs-
fallback predicate, /root/reference/src/processors/powerpoint/
powerpoint_processor.py:46-55, and the extension router
file_converter.py:64-100) with web semantics:

  sniff(payload):  pdf   -> minimal in-process PDF parse (extractor.pdf)
                   html  -> DOM walk -> block score/strip -> render
                   empty/unknown or failed parse, with a non-empty upstream
                   ``text`` column -> normalized plain-text fallback
                   (the MarkItDown-fallback analog, S8)

Per-row errors are captured, never raised (reference degradation principle,
content_extractor.py:74-76): the row comes back with ``error`` set and empty
text, so one poisoned page cannot kill a 10^12-row job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import DEFAULT_CONFIG, ExtractConfig
from .html_blocks import parse_html_blocks, score_and_filter
from .normalize import normalize_text
from .pdf import extract_pdf
from .render import render_blocks
from .sniff import sniff_payload


@dataclass
class ExtractResult:
    extracted_text: str = ""
    spans: list = field(default_factory=list)       # [{kind,start,end,href}]
    links: list = field(default_factory=list)       # [(text, url)]
    method: str = ""          # html | pdf | fallback_text | error
    error: str = ""
    n_blocks_kept: int = 0
    n_blocks_dropped: int = 0
    quality_score: float = 0.0   # kept-content share, 0..1


# ---------------------------------------------------------------------------
# Extension surface (SURVEY.md §2.9): pluggable payload-kind handlers.
# The reference exposes component injection / pluggable enhancement
# providers (powerpoint_processor.py:27-33, file_converter.py:14-36);
# here a user registers a handler for a sniffed kind — including new
# kinds their own sniffer variant emits, or overrides of the builtins —
# without touching the router below.
#
# A handler is ``fn(payload: bytes, text_fallback: str, cfg) ->
# ExtractResult``; it runs inside the same per-row try/except (the
# degradation principle applies to plug-ins too).
# ---------------------------------------------------------------------------

EXTRACTOR_REGISTRY: dict = {}


def register_extractor(kind: str, fn) -> None:
    """Register (or override) the handler for a sniffed payload kind."""
    EXTRACTOR_REGISTRY[kind] = fn


def unregister_extractor(kind: str) -> None:
    EXTRACTOR_REGISTRY.pop(kind, None)


def _fallback_text(text: str) -> ExtractResult:
    """Plain-text fallback: normalize upstream naive text into paragraphs."""
    paragraphs = [normalize_text(p) for p in text.split("\n\n")]
    paragraphs = [p for p in paragraphs if p]
    return ExtractResult(
        extracted_text="\n\n".join(paragraphs),
        method="fallback_text",
        n_blocks_kept=len(paragraphs),
        quality_score=1.0 if paragraphs else 0.0,
    )


_MAX_CONTAINER_DEPTH = 3


def extract_document(
    payload: bytes,
    text_fallback: str = "",
    cfg: ExtractConfig = DEFAULT_CONFIG,
    _depth: int = 0,
) -> ExtractResult:
    """Extract main content from one page payload. Pure; never raises."""
    try:
        if payload is not None and len(payload) > cfg.max_html_bytes:
            return ExtractResult(method="error", error="payload_too_large")

        kind = sniff_payload(payload or b"")

        handler = EXTRACTOR_REGISTRY.get(kind)
        if handler is not None:
            return handler(payload, text_fallback, cfg)

        if kind in ("gzip", "warc"):
            # container unwrap (S7 breadth): gzip members and WARC
            # records re-enter the router at bounded depth
            from .containers import gzip_inner, warc_inner

            if _depth >= _MAX_CONTAINER_DEPTH:
                return ExtractResult(method="error", error="container_depth")
            if kind == "gzip":
                try:
                    inner = gzip_inner(payload, cfg.max_html_bytes)
                except ValueError:
                    return ExtractResult(method="error",
                                         error="payload_too_large")
            else:
                inner = warc_inner(payload)
            if inner is None:
                if text_fallback:
                    return _fallback_text(text_fallback)
                return ExtractResult(method="error", error=f"{kind}_empty")
            res = extract_document(inner, text_fallback, cfg, _depth + 1)
            res.method = f"{kind}>{res.method}"   # container lineage
            return res

        if kind == "zip":
            # OOXML fallback family (S8 breadth): docx / xlsx / pptx /
            # epub; any other archive iterates members back through the
            # router (depth-bounded like gzip/warc)
            from .ooxml import extract_zip

            if _depth >= _MAX_CONTAINER_DEPTH:
                return ExtractResult(method="error", error="container_depth")
            text, link_pairs, method, err = extract_zip(payload,
                                                        depth=_depth)
            if err and not text and not link_pairs:
                if text_fallback:
                    return _fallback_text(text_fallback)
                return ExtractResult(method="error", error=err)
            return ExtractResult(
                extracted_text=text,
                links=list(link_pairs),
                method=method,
                n_blocks_kept=text.count("\n\n") + 1 if text else 0,
                quality_score=1.0 if text else 0.0,
                error=err,
            )

        if kind in ("csv", "json", "xml"):
            # standalone structured-text payloads (S8 breadth, the
            # reference's "Others" MarkItDown category, config.py:55-58)
            from .textdata import csv_to_text, json_to_text, xml_to_text

            conv = {"csv": csv_to_text, "json": json_to_text,
                    "xml": xml_to_text}[kind]
            text, err = conv(payload)
            if err and not text:
                if text_fallback:
                    return _fallback_text(text_fallback)
                return ExtractResult(method="error", error=err)
            return ExtractResult(
                extracted_text=text,
                method=kind,
                n_blocks_kept=text.count("\n\n") + 1 if text else 0,
                quality_score=1.0 if text else 0.0,
                error=err,
            )

        if kind == "ole2":
            # legacy binary Office family (S8 breadth): .doc/.xls/.ppt
            # via the in-process MS-CFB walker (reference routes these
            # to MarkItDown, config.py:78-92 / file_converter.py:90-97)
            from .ole2 import extract_ole2

            text, link_pairs, method, err = extract_ole2(payload)
            if err and not text and not link_pairs:
                if text_fallback:
                    return _fallback_text(text_fallback)
                return ExtractResult(method="error", error=err)
            return ExtractResult(
                extracted_text=text,
                links=list(link_pairs),
                method=method,
                n_blocks_kept=text.count("\n\n") + 1 if text else 0,
                quality_score=1.0 if text else 0.0,
                error=err,
            )

        if kind == "pdf":
            text, link_pairs, err = extract_pdf(payload)
            if err and not text:
                return ExtractResult(method="error", error=err)
            return ExtractResult(
                extracted_text=text,
                links=list(link_pairs),
                method="pdf",
                n_blocks_kept=text.count("\n\n") + 1 if text else 0,
                quality_score=1.0 if text else 0.0,
                error=err,
            )

        if kind == "html":
            # charset sniff (BOM > strict UTF-8 > declared > cp1252):
            # Common-Crawl HTML has a long legacy-encoding tail that a
            # bare utf-8 decode would mojibake (extractor/charset.py)
            from .charset import decode_html_payload

            html_text, _enc = decode_html_payload(payload)
            if cfg.use_fast_parser:
                from .html_fast import parse_html_blocks_fast
                blocks, title, boiler_chars = parse_html_blocks_fast(
                    html_text, cfg)
            else:
                blocks, title, boiler_chars = parse_html_blocks(html_text, cfg)
            kept, dropped_score = score_and_filter(blocks, cfg)
            text, spans, links = render_blocks(kept, title, cfg)
            if text:
                kept_chars = sum(b.char_count() for b in kept) or len(text)
                total = kept_chars + boiler_chars
                return ExtractResult(
                    extracted_text=text,
                    spans=spans,
                    links=links,
                    method="html",
                    n_blocks_kept=len(kept),
                    n_blocks_dropped=dropped_score,
                    quality_score=round(kept_chars / total, 6) if total else 0.0,
                )
            # parse produced nothing -> fallback
        if text_fallback:
            return _fallback_text(text_fallback)
        if kind == "empty":
            return ExtractResult(method="error", error="empty_payload")
        return ExtractResult(method="error", error="no_content")
    except Exception as exc:  # absolute backstop: degradation principle
        return ExtractResult(method="error", error=f"extract_error:{type(exc).__name__}")
