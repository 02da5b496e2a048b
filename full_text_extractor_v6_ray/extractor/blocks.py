"""Block model shared by the HTML walker and the renderer.

The analog of the reference's content-block tagged-union dicts
(/root/reference/src/processors/powerpoint/content_extractor.py:48-100) and
paragraph/run dicts (text_processor.py:37-62) — here as small dataclasses
that never cross a Ray stage boundary: they live inside one map_batches UDF
invocation (SURVEY.md §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(slots=True)
class Segment:
    """One inline run: text + formatting flags + raw href.

    Analog of the reference's formatted run
    (text_processor.py:395-400: {"text","bold","italic","hyperlink"}).
    """

    text: str
    bold: bool = False
    italic: bool = False
    code: bool = False
    href: str = ""


@dataclass(slots=True)
class Block:
    """One block-level unit of content in document order."""

    kind: str                 # heading | para | li | table | pre | img
    level: int = 0            # heading level (1..6) or list nesting depth (1..)
    ordered: bool = False     # list item from <ol>
    index: int = 0            # 1-based ordinal within an ordered list
    segments: list[Segment] = field(default_factory=list)
    rows: list[list[str]] = field(default_factory=list)   # table cell text
    header_row: bool = False  # first table row was <th> cells
    alt: str = ""             # img alt text
    pre_text: str = ""        # raw text for <pre> (whitespace preserved)

    def visible_text(self) -> str:
        """Concatenated raw segment text (pre-normalization)."""
        return "".join(s.text for s in self.segments)

    def link_char_count(self) -> int:
        return sum(len(s.text) for s in self.segments if s.href)

    def char_count(self) -> int:
        return sum(len(s.text) for s in self.segments)
