"""HTML -> block list: parse, reading-order walk, roles, boilerplate strip.

This is the web-page analog of the reference's reading-order extraction +
shape-content dispatch + meaningless-shape filter
(/root/reference/src/processors/powerpoint/accessibility_extractor_v2.py:34-83,
content_extractor.py:17-100, :255-300). Built on the stdlib
``html.parser.HTMLParser`` (no lxml in this environment): a single streaming
pass that maintains an explicit element stack (browser-style recovery for
malformed markup), segments text into blocks in document order (M4), expands
nested containers (M5), and drops kill/boilerplate subtrees (M7/M9).

Boilerplate stripping is two-layer, jusText/Readability-style:
  1. structural: subtrees under <nav>/<footer>/<aside>/<header>/<form>/...
     or containers whose class/id matches chrome markers are dropped;
  2. scoring: remaining text blocks with link-char density >
     ``cfg.max_link_density`` and fewer than ``cfg.min_words_linky`` words
     are dropped (done in ``score_and_filter``).

Determinism: pure function of (bytes, config); no set iteration order leaks
into output (stacks + lists only).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ..config import DEFAULT_CONFIG, ExtractConfig
from .blocks import Block, Segment
from .normalize import normalize_text, strip_bullet_prefix

# Tags that never contain content and never appear on the stack.
VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col",
     "source", "track", "wbr", "param"}
)

# Tags that open a new block (flush any in-progress paragraph).
BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "body", "html", "ul", "ol",
     "li", "table", "tr", "td", "th", "thead", "tbody", "tfoot", "pre",
     "blockquote", "h1", "h2", "h3", "h4", "h5", "h6", "figure",
     "figcaption", "dl", "dt", "dd", "fieldset", "address", "hr"}
)

_HEADING = re.compile(r"^h([1-6])$")
# dict lookup beats regex match in the per-tag hot path
_H_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# Generic / meaningless alt text (reference alt-quality regexes,
# content_extractor.py:182-210: image\d*, picture\d*, len<3, generic words).
_GENERIC_ALT = re.compile(
    r"^(?:image\d*|picture\d*|img\d*|photo\d*|graphic\d*|icon\d*|untitled|"
    r"screenshot\d*|logo)?(?:\.(?:png|jpe?g|gif|svg|webp))?$",
    re.IGNORECASE,
)


def alt_is_meaningful(alt: str, cfg: ExtractConfig = DEFAULT_CONFIG) -> bool:
    """Alt-text usefulness check (M10)."""
    alt = alt.strip()
    if len(alt) < cfg.min_alt_len:
        return False
    return not _GENERIC_ALT.match(alt)


# Per-config static tag facts (kill, boiler_tag, bold, italic, code,
# heading_level, is_block) — one dict lookup in the hot per-tag path
# replaces five set-membership tests. Shared across all parsers of the
# same (hashable, frozen) config within a worker process.
_TAGINFO_CACHE: dict = {}


def _taginfo_table(cfg: ExtractConfig) -> dict:
    tbl = _TAGINFO_CACHE.get(cfg)
    if tbl is None:
        tbl = {}
        _TAGINFO_CACHE[cfg] = tbl
    return tbl


class BlockParser(HTMLParser):
    """Streaming HTML -> list[Block] in document order.

    The element stack holds plain tuples
    ``(tag, kill, boiler, bold, italic, code, href, pre)`` — measurably
    cheaper to build than even a __slots__ class in this per-tag path.
    """

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        # convert_charrefs=True performs entity decoding (M19) at parse time.
        super().__init__(convert_charrefs=True)
        self.cfg = cfg
        self._taginfo = _taginfo_table(cfg)
        self.blocks: list[Block] = []
        self.title: str = ""
        self.dropped_boiler_chars = 0

        self._stack: list[tuple] = []
        # incremental flag counters (no stack scans per data event)
        self._kill_n = 0
        self._boiler_n = 0
        self._bold_n = 0
        self._italic_n = 0
        self._code_n = 0
        self._pre_n = 0
        self._href: list[str] = []

        self._segments: list[Segment] = []
        self._cur_kind = "para"
        self._cur_level = 0
        self._cur_ordered = False
        self._cur_index = 0

        # list nesting: [(ordered, counter)]
        self._lists: list[list] = []

        # table capture
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._cell: list[str] | None = None
        self._row_is_header = False
        self._first_row_header = False
        self._in_title = False
        self._pre_buf: list[str] = []

    # ---- helpers -------------------------------------------------------

    def _flush(self):
        """Close the in-progress block, if it has any visible content."""
        if self._segments:
            # equivalent to visible_text().strip() truthiness, no join;
            # plain loop beats a genexpr in this per-block hot path
            for s in self._segments:
                t = s.text
                if t and not t.isspace():
                    self.blocks.append(Block(
                        kind=self._cur_kind,
                        level=self._cur_level,
                        ordered=self._cur_ordered,
                        index=self._cur_index,
                        segments=self._segments,
                    ))
                    break
            self._segments = []
        # kind/level/ordered/index are only ever set together (heading /
        # li setters), so kind == "para" implies the rest are already at
        # defaults — skip 4 attribute writes on the (majority) no-op
        # flushes between consecutive block tags
        if self._cur_kind != "para":
            self._cur_kind = "para"
            self._cur_level = 0
            self._cur_ordered = False
            self._cur_index = 0

    def _is_boiler_attrs(self, attrs) -> bool:
        blob = ""
        for k, v in attrs:
            if k in ("class", "id", "role") and v:
                blob += " " + v.lower()
        if not blob:
            return False
        return any(m in blob for m in self.cfg.boilerplate_markers)

    # ---- parser events -------------------------------------------------

    def _tag_entry(self, tag):
        cfg = self.cfg
        e = (tag in cfg.kill_tags, tag in cfg.boilerplate_tags,
             tag in ("b", "strong"), tag in ("i", "em"), tag == "code",
             _H_LEVEL.get(tag, 0), tag in BLOCK_TAGS)
        self._taginfo[tag] = e
        return e

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            if tag == "br":
                if self._kill_n == 0 and self._boiler_n == 0:
                    if self._pre_n:
                        self._pre_buf.append("\n")
                    elif self._table_depth and self._cell is not None:
                        self._cell.append(" ")
                    else:
                        self._segments.append(Segment(
                            " ", self._bold_n > 0, self._italic_n > 0,
                            self._code_n > 0,
                            self._href[-1] if self._href else ""))
            elif tag == "img":
                self._handle_img(attrs)
            elif tag == "hr":
                if self._kill_n == 0 and self._boiler_n == 0 and not self._table_depth:
                    self._flush()
            return

        info = self._taginfo.get(tag)
        if info is None:
            info = self._tag_entry(tag)
        kill, boiler, bold, italic, code, hl, is_block = info
        if not boiler and attrs:
            boiler = self._is_boiler_attrs(attrs)
        href = ""
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    href = v
                    break

        active = self._kill_n == 0 and self._boiler_n == 0

        if tag == "title":
            # <title> lives inside <head> (a kill tag) — capture it anyway;
            # it is the h1-fallback for title promotion (render_blocks)
            self._in_title = True

        if active and is_block and not self._table_depth:
            # inline guard: most flushes between consecutive block tags
            # are no-ops (no segments, kind already "para") — skip the
            # call, not just the body (hot: every block tag)
            if self._segments or self._cur_kind != "para":
                self._flush()

        if active and not kill and not boiler:
            if hl:
                self._cur_kind = "heading"
                self._cur_level = hl
            elif tag == "ul" or tag == "ol":
                self._lists.append([tag == "ol", 0])
            elif tag == "li":
                if self._lists:
                    self._lists[-1][1] += 1
                    ordered, idx = self._lists[-1][0], self._lists[-1][1]
                    depth = len(self._lists)
                else:
                    ordered, idx, depth = False, 1, 1
                self._cur_kind = "li"
                self._cur_level = depth
                self._cur_ordered = ordered
                self._cur_index = idx
            elif tag == "table":
                self._table_depth += 1
                if self._table_depth == 1:
                    self._rows = []
                    self._first_row_header = False
            elif tag == "tr" and self._table_depth == 1:
                self._rows.append([])
                self._row_is_header = False
            elif tag in ("td", "th") and self._table_depth == 1:
                self._cell = []
                if tag == "th":
                    self._row_is_header = True
            elif tag == "pre":
                self._pre_buf = []

        self._stack.append((tag, kill, boiler, bold, italic, code, href,
                            tag == "pre"))
        if kill:
            self._kill_n += 1
        if boiler:
            self._boiler_n += 1
        if bold:
            self._bold_n += 1
        if italic:
            self._italic_n += 1
        if code:
            self._code_n += 1
        if tag == "pre":
            self._pre_n += 1
        if href:
            self._href.append(href)

    def handle_startendtag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.handle_starttag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def _pop(self, el: tuple):
        tag, kill, boiler, bold, italic, code, href, pre = el
        if kill:
            self._kill_n -= 1
        if boiler:
            self._boiler_n -= 1
        if bold:
            self._bold_n -= 1
        if italic:
            self._italic_n -= 1
        if code:
            self._code_n -= 1
        if pre:
            self._pre_n -= 1
        if href:
            self._href.pop()

        if tag == "title":
            self._in_title = False
        active = self._kill_n == 0 and self._boiler_n == 0
        if not active:
            return
        if tag in _H_LEVEL or tag in ("p", "li", "blockquote", "figure",
                                      "figcaption", "dt", "dd"):
            if not self._table_depth and (self._segments
                                          or self._cur_kind != "para"):
                self._flush()
        if tag in ("ul", "ol"):
            if self._lists:
                self._lists.pop()
            if not self._table_depth and (self._segments
                                          or self._cur_kind != "para"):
                self._flush()
        elif tag == "table":
            if self._table_depth == 1:
                rows = [r for r in self._rows if r]
                if rows:
                    self.blocks.append(Block(kind="table", rows=rows,
                                             header_row=self._first_row_header))
                self._rows = []
            self._table_depth = max(0, self._table_depth - 1)
        elif tag in ("td", "th") and self._table_depth == 1:
            if self._cell is not None and self._rows:
                self._rows[-1].append(normalize_text("".join(self._cell)))
            self._cell = None
        elif tag == "tr" and self._table_depth == 1:
            if self._rows and len(self._rows) == 1 and self._row_is_header:
                self._first_row_header = True
        elif tag == "pre":
            txt = "".join(self._pre_buf).strip("\n")
            if txt.strip():
                self._flush()
                self.blocks.append(Block(kind="pre", pre_text=txt))
            self._pre_buf = []

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        stack = self._stack
        # fast path: well-formed markup closes the top of stack
        if stack and stack[-1][0] == tag:
            self._pop(stack.pop())
            return
        # browser-style recovery: pop until the matching open tag (if any)
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == tag:
                while len(stack) > i:
                    self._pop(stack.pop())
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if self._in_title:
            self.title += data
            return
        if self._kill_n:
            return
        if self._boiler_n:
            self.dropped_boiler_chars += len(data.strip())
            return
        if self._pre_n:
            self._pre_buf.append(data)
            return
        if self._table_depth:
            if self._cell is not None:
                self._cell.append(data)
            return
        if not data:
            return
        self._segments.append(Segment(
            data, self._bold_n > 0, self._italic_n > 0, self._code_n > 0,
            self._href[-1] if self._href else ""))

    def _handle_img(self, attrs):
        if self._kill_n or self._boiler_n or self._table_depth:
            return
        alt = ""
        for k, v in attrs:
            if k == "alt" and v:
                alt = v
                break
        if not alt_is_meaningful(alt, self.cfg):
            return
        self._flush()
        self.blocks.append(Block(kind="img", alt=normalize_text(alt)))

    def close(self):
        super().close()
        # pop everything left open (malformed / truncated documents)
        while self._stack:
            self._pop(self._stack.pop())
        self._flush()


def parse_html_blocks(
    html_text: str, cfg: ExtractConfig = DEFAULT_CONFIG
) -> tuple[list[Block], str, int]:
    """Parse HTML into (blocks, title, dropped_boilerplate_chars)."""
    p = BlockParser(cfg)
    p.feed(html_text)
    p.close()
    return p.blocks, normalize_text(p.title), p.dropped_boiler_chars


def score_and_filter(
    blocks: list[Block], cfg: ExtractConfig = DEFAULT_CONFIG
) -> tuple[list[Block], int]:
    """Scoring layer of the boilerplate strip (M9).

    Drops 'linky' text blocks: link-char density > cfg.max_link_density and
    fewer than cfg.min_words_linky words — navigation chrome that survived
    the structural layer. Headings, tables, pre and images always pass.
    Also converts text-bullet pseudo-list paragraphs (``• item``) into list
    items (M15/M16 analog).
    """
    kept: list[Block] = []
    dropped = 0
    for blk in blocks:
        if blk.kind in ("para", "li"):
            # one pass over segments: total + link chars together; the
            # word count (join + split) only when the density test can
            # actually trip (linkless blocks skip it entirely)
            total = 0
            linked = 0
            for s in blk.segments:
                n = len(s.text)
                total += n
                if s.href:
                    linked += n
            if linked and total and linked / total > cfg.max_link_density:
                words = len(blk.visible_text().split())
                if words < cfg.min_words_linky:
                    dropped += 1
                    continue
        if blk.kind == "para" and len(blk.segments) >= 1:
            stripped, was_bullet = strip_bullet_prefix(blk.segments[0].text.lstrip())
            if was_bullet:
                blk = Block(kind="li", level=1, ordered=False, index=0,
                            segments=[Segment(stripped,
                                              blk.segments[0].bold,
                                              blk.segments[0].italic,
                                              blk.segments[0].code,
                                              blk.segments[0].href)]
                            + blk.segments[1:])
        kept.append(blk)
    return kept, dropped
