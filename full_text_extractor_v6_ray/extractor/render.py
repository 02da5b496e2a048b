"""Blocks -> (extracted_text, spans, links): deterministic markdown-ish render.

The analog of the reference's markdown renderer
(/root/reference/src/processors/powerpoint/markdown_converter.py:14-326):
title -> ``# ``, subheads -> ``##``.., bullets -> ``{indent}- ``, numbered ->
``1. ``, tables as pipe tables with ``|`` escaped (markdown_converter.py:280),
image placeholders (``:289-298``), and the consistent-formatting fold (a
paragraph whose every run is bold is wrapped once, ``:217-246``).

Spans are the rebuild's replacement for the reference's formatted_runs +
hyperlink table (text_processor.py:287-371 offset remapping): UTF-8 BYTE
offsets into the FINAL normalized ``extracted_text`` — computed while
emitting, after all normalization, so no remapping pass is needed
(SURVEY.md §7.4 "compute offsets after final normalization").

Span kinds: title | heading | list_item | link | table.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, ExtractConfig
from .blocks import Block, Segment
from .links import fix_url
from .normalize import normalize_text


class _Out:
    """String builder tracking UTF-8 byte position."""

    __slots__ = ("parts", "nbytes")

    def __init__(self):
        self.parts: list[str] = []
        self.nbytes = 0

    def emit(self, s: str):
        if s:
            self.parts.append(s)
            # ascii fast path: no encode allocation for byte counting
            self.nbytes += len(s) if s.isascii() else len(s.encode("utf-8"))

    def text(self) -> str:
        return "".join(self.parts)


def _merge_segments(segments: list[Segment]) -> list[tuple[str, bool, bool, bool, str, bool, bool]]:
    """Normalize per-segment text and merge adjacent same-format runs.

    Returns tuples (core, bold, italic, code, href, lead_space, trail_space)
    with empty cores carrying only boundary-space information.
    """
    if len(segments) == 1:  # common case: one unformatted run
        s = segments[0]
        merged: list[list] = [[s.text, s.bold, s.italic, s.code, s.href]]
    else:
        merged = []
        for seg in segments:
            key = (seg.bold, seg.italic, seg.code, seg.href)
            if merged and (merged[-1][1], merged[-1][2],
                           merged[-1][3], merged[-1][4]) == key:
                merged[-1][0] += seg.text
            else:
                merged.append([seg.text, seg.bold, seg.italic, seg.code,
                               seg.href])
    out = []
    for raw, b, i, c, h in merged:
        lead = bool(raw) and raw[0].isspace()
        trail = bool(raw) and raw[-1].isspace()
        core = normalize_text(raw)
        out.append((core, b, i, c, h, lead, trail))
    return out


def _render_inline(out: _Out, segments: list[Segment], spans: list[dict],
                   links: list[tuple[str, str]]):
    """Emit inline runs with formatting markers; record link spans."""
    if len(segments) == 1:
        # majority case: ONE unformatted run — the general path would
        # build merge/nonempty lists, run both fold scans and the run
        # loop just to emit the normalized core with no markers; fuse
        # it (byte-equivalent: marker is "", no lead/trail space can
        # be emitted for a single run, spans/links untouched)
        s = segments[0]
        if not (s.bold or s.italic or s.code or s.href):
            core = normalize_text(s.text)
            if core:
                out.emit(core)
            return
    runs = _merge_segments(segments)
    nonempty = [r for r in runs if r[0]]
    if not nonempty:
        return
    # consistent-formatting fold (markdown_converter.py:217-246 analog)
    fold_bold = all(r[1] for r in nonempty) and any(r[1] for r in nonempty)
    fold_italic = all(r[2] for r in nonempty) and any(r[2] for r in nonempty)

    if fold_bold:
        out.emit("**")
    if fold_italic:
        out.emit("*")

    pending_space = False
    emitted = False
    for core, b, i, c, h, lead, trail in runs:
        if not core:
            pending_space = pending_space or lead or trail
            continue
        if emitted and (pending_space or lead):
            out.emit(" ")
        marker = ""
        if b and not fold_bold:
            marker += "**"
        if i and not fold_italic:
            marker += "*"
        if c:
            marker = "`"
        if h:
            url = fix_url(h)
            out.emit(marker)
            out.emit("[")
            start = out.nbytes
            out.emit(core)
            end = out.nbytes
            out.emit("](" + url + ")")
            out.emit(marker[::-1] if marker != "`" else marker)
            spans.append({"kind": "link", "start": start, "end": end, "href": url})
            links.append((core, url))
        else:
            out.emit(marker)
            start = out.nbytes
            out.emit(core)
            end = out.nbytes
            out.emit(marker[::-1] if marker != "`" else marker)
        emitted = True
        pending_space = trail

    if fold_italic:
        out.emit("*")
    if fold_bold:
        out.emit("**")


def render_blocks(
    blocks: list[Block],
    title: str = "",
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> tuple[str, list[dict], list[tuple[str, str]]]:
    """Render blocks to (extracted_text, spans, links).

    ``title`` is the <title> fallback: promoted to a leading ``# `` heading
    when the document has no <h1> (document-order-with-title-promotion,
    SURVEY.md §7.4 — deliberately NOT the reference's content-reversal quirk,
    accessibility_extractor_v2.py:243).
    """
    out = _Out()
    spans: list[dict] = []
    links: list[tuple[str, str]] = []

    has_h1 = any(b.kind == "heading" and b.level == 1 for b in blocks)
    render_list: list[Block] = list(blocks)
    if title and not has_h1:
        render_list.insert(0, Block(kind="heading", level=1,
                                    segments=[Segment(title)]))

    prev_kind = None
    for blk in render_list:
        chunk_start = out.nbytes
        if prev_kind is not None:
            # inline emit: separators are ASCII constants (skip the
            # isascii/len dance — hot: once per block)
            if blk.kind == "li" and prev_kind == "li":
                out.parts.append("\n")
                out.nbytes += 1
            else:
                out.parts.append("\n\n")
                out.nbytes += 2
            chunk_start = out.nbytes

        if blk.kind == "heading":
            level = min(max(blk.level, 1), cfg.heading_max_level)
            out.emit("#" * level + " ")
            start = out.nbytes
            _render_inline(out, blk.segments, spans, links)
            end = out.nbytes
            if end > start:
                spans.append({
                    "kind": "title" if level == 1 else "heading",
                    "start": start, "end": end, "href": "",
                })
                prev_kind = blk.kind
            else:
                _rollback(out, spans, links, chunk_start)
                continue

        elif blk.kind == "para":
            start = out.nbytes
            _render_inline(out, blk.segments, spans, links)
            if out.nbytes > start:
                prev_kind = blk.kind
            else:
                _rollback(out, spans, links, chunk_start)
                continue

        elif blk.kind == "li":
            indent = cfg.bullet_indent * max(blk.level - 1, 0)
            prefix = f"{blk.index}. " if blk.ordered else "- "
            out.emit(indent + prefix)
            start = out.nbytes
            _render_inline(out, blk.segments, spans, links)
            end = out.nbytes
            if end > start:
                spans.append({"kind": "list_item", "start": start, "end": end,
                              "href": ""})
                prev_kind = blk.kind
            else:
                _rollback(out, spans, links, chunk_start)
                continue

        elif blk.kind == "table":
            start = out.nbytes
            _render_table(out, blk)
            end = out.nbytes
            if end > start:
                spans.append({"kind": "table", "start": start, "end": end,
                              "href": ""})
                prev_kind = blk.kind
            else:
                _rollback(out, spans, links, chunk_start)
                continue

        elif blk.kind == "pre":
            out.emit("```\n")
            out.emit(blk.pre_text)
            out.emit("\n```")
            prev_kind = blk.kind

        elif blk.kind == "img":
            out.emit(f"![{blk.alt}](image)")
            prev_kind = blk.kind

        else:  # unknown kind: skip deterministically
            _rollback(out, spans, links, chunk_start)
            continue

    return out.text(), spans, links


def _rollback(out: _Out, spans, links, to_bytes: int):
    """Undo emission back to a byte offset (empty block after normalize)."""
    while out.nbytes > to_bytes and out.parts:
        last = out.parts.pop()
        out.nbytes -= len(last.encode("utf-8"))
    while spans and spans[-1]["start"] >= out.nbytes:
        if spans[-1]["kind"] == "link" and links:
            links.pop()
        spans.pop()


def _render_table(out: _Out, blk: Block):
    """Pipe table; ``|`` in cells escaped (markdown_converter.py:280 analog)."""
    rows = blk.rows
    if not rows:
        return
    width = max(len(r) for r in rows)

    def cell(c: str) -> str:
        return c.replace("|", "\\|")

    first = rows[0] + [""] * (width - len(rows[0]))
    out.emit("| " + " | ".join(cell(c) for c in first) + " |")
    out.emit("\n")
    out.emit("| " + " | ".join("---" for _ in range(width)) + " |")
    for r in rows[1:]:
        r = r + [""] * (width - len(r))
        out.emit("\n")
        out.emit("| " + " | ".join(cell(c) for c in r) + " |")
