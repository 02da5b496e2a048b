"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

No external data: pages are synthesized from the driver's ``documents``
table (``doc_id, text, lang, source``) by wrapping each document's text into
one of the ten HTML templates of FIXTURES.md's catalog — every template
exercises specific operators from SURVEY.md §2 (headings, nested lists,
pipe-bearing tables, inline formatting, link zoo, boilerplate chrome, alt
text, entities, deep nesting, degenerate pages).

Everything is a pure function of ``(doc_id, text, lang, source, seed)`` —
NO global RNG — so generation runs embarrassingly parallel inside
``map_batches`` and two runs at different ``num_cpus`` see identical bytes
(the scaling-evidence requirement).

Row mix (deterministic by doc_id):
  - ``doc_id % 50 == 3``  -> PDF payload (minimal uncompressed PDF)
  - ``doc_id % 100 == 7`` -> malformed/truncated bytes (error/fallback path)
  - ``doc_id % 17 == 0``  -> url duplicated 3x with distinct warc_ts
                             (exercises first-by-ts dedup)
  - host drawn Zipf-ishly from the document's ``source`` so a few hosts are
    hot (exercises salted dedup).
"""

from __future__ import annotations

import datetime
import html as _html
import json
import random
import re

import pyarrow as pa

_BASE_TS = datetime.datetime(2025, 1, 1)

_TAG_STRIP = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

# deterministic host pool; rank-weighted (Zipf-ish) choice
_HOSTS = [f"site{i:02d}.example.org" for i in range(20)]
_HOST_WEIGHTS = [1.0 / (i + 1) for i in range(len(_HOSTS))]


def _words(text: str) -> list[str]:
    return text.split()


def _sentence(ws: list[str], rng: random.Random, lo=6, hi=14) -> str:
    n = rng.randint(lo, hi)
    picks = [ws[rng.randrange(len(ws))] for _ in range(n)]
    return " ".join(picks).capitalize() + "."


def _para(ws, rng, n_sent=3) -> str:
    return " ".join(_sentence(ws, rng) for _ in range(n_sent))


_NAV = (
    '<nav class="main-nav"><a href="/">Home</a> <a href="/news">News</a> '
    '<a href="/about">About</a> <a href="/contact">Contact</a></nav>'
)
_HEADER = '<header><div class="banner">Site banner — subscribe now!</div></header>'
_FOOTER = (
    '<footer><p>© 2025 Example Site · <a href="/privacy">Privacy</a> · '
    '<a href="/terms">Terms</a></p></footer>'
)
_AD = (
    '<div class="ad-box"><a href="https://ads.example.com/click?id=1">Buy now</a> '
    '<a href="https://ads.example.com/click?id=2">Limited offer</a></div>'
)


def _template_article(ws, rng, title):
    subs = [
        f"<h2>{_sentence(ws, rng, 3, 6)[:-1]}</h2>\n<p>{_para(ws, rng)}</p>"
        for _ in range(3)
    ]
    return f"<h1>{title}</h1>\n<p>{_para(ws, rng)}</p>\n" + "\n".join(subs)


def _template_lists(ws, rng, title):
    items = [_sentence(ws, rng, 2, 5)[:-1] for _ in range(8)]
    ul = (
        f"<ul><li>{items[0]}</li><li>{items[1]}"
        f"<ul><li>{items[2]}</li><li>{items[3]}"
        f"<ul><li>{items[4]}</li></ul></li></ul></li></ul>"
    )
    ol = f"<ol><li>{items[5]}</li><li>{items[6]}</li></ol>"
    pseudo = f"<p>• {items[7]}</p>\n<p>- {items[0]} again</p>"
    return f"<h1>{title}</h1>\n{ul}\n{ol}\n{pseudo}"


def _template_table(ws, rng, title):
    cells = [[f"{ws[rng.randrange(len(ws))]}|{rng.randint(0, 99)}"
              for _ in range(3)] for _ in range(4)]
    head = "<tr>" + "".join(f"<th>Col {i}</th>" for i in range(3)) + "</tr>"
    rows = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in cells
    )
    return (f"<h1>{title}</h1>\n<p>{_para(ws, rng, 2)}</p>\n"
            f"<table>{head}{rows}</table>")


def _template_inline(ws, rng, title):
    p1 = (f"<p>Mixed {_sentence(ws, rng, 3, 5)[:-1]} <b>bold run</b> then "
          f"<i>italic run</i> and <b><i>both</i></b> styles.</p>")
    p2 = f"<p><b>{_sentence(ws, rng)} {_sentence(ws, rng)}</b></p>"  # uniform bold -> fold
    p3 = f"<p><em>{_sentence(ws, rng)}</em></p>"
    return f"<h1>{title}</h1>\n{p1}\n{p2}\n{p3}"


def _template_links(ws, rng, title):
    return (
        f"<h1>{title}</h1>\n"
        f"<p>See <a href='https://example.com/a'>schemed link</a>, "
        f"<a href='www.sample.net/b'>www link</a>, "
        f"<a href='plain.org/c'>bare host</a>, "
        f"<a href='someone@mail.example.com'>email us</a>, "
        f"<a href='tel:+15550100'>call</a>, and "
        f"<a href='#section-2'>a fragment</a> in {_sentence(ws, rng)}</p>\n"
        f"<p>{_para(ws, rng)}</p>"
    )


def _template_boilerplate(ws, rng, title):
    return (
        f"{_HEADER}\n{_NAV}\n{_AD}\n"
        f"<article><h1>{title}</h1>\n<p>{_para(ws, rng, 4)}</p></article>\n"
        f"<aside class='sidebar'><a href='/x'>x</a> <a href='/y'>y</a></aside>\n"
        f"{_FOOTER}"
    )


def _template_images(ws, rng, title):
    return (
        f"<h1>{title}</h1>\n"
        f"<img src='a.png' alt='Chart of {ws[rng.randrange(len(ws))]} totals by month'>\n"
        f"<p>{_para(ws, rng)}</p>\n"
        f"<img src='b.png' alt='image1.png'>\n"
        f"<img src='c.png' alt=''>\n"
        f"<figure><img src='d.png' alt='Diagram showing the {ws[rng.randrange(len(ws))]} flow'>"
        f"<figcaption>Figure: {_sentence(ws, rng, 3, 6)}</figcaption></figure>"
    )


def _template_entities(ws, rng, title):
    return (
        f"<h1>{title}</h1>\n"
        f"<p>Fish &amp; chips&nbsp;&nbsp;cost &#163;5 &#8212; &#8220;quoted&#8221; "
        f"café vs café (NFC).</p>\n"
        f"<p>   runs   of\t\twhitespace\n\n  and nbsp   {_sentence(ws, rng)}</p>"
    )


def _template_nesting(ws, rng, title):
    inner = f"<p>{_para(ws, rng)}</p>"
    for i in range(6):
        inner = f"<div class='wrap{i}'><section>{inner}</section></div>"
    return f"<h1>{title}</h1>\n{inner}\n<div><div><p>{_sentence(ws, rng)}</p></div></div>"


def _template_degenerate(ws, rng, title):
    big = " ".join(ws[rng.randrange(len(ws))] for _ in range(150))
    return f"<p>{big}</p>\n<p>   </p>\n<p></p>"


_TEMPLATES = [
    _template_article, _template_lists, _template_table, _template_inline,
    _template_links, _template_boilerplate, _template_images,
    _template_entities, _template_nesting, _template_degenerate,
]


def _mk_pdf(paragraphs: list[str], link: str = "", per_page: int = 2,
            compress: bool = False, objstm: bool = False) -> bytes:
    """Minimal deterministic PDF: ``per_page`` paragraphs per page (page
    tree with /Kids order), optional FlateDecode content streams, and the
    link annotation optionally packed into a /Type /ObjStm object stream
    (PDF 1.5 layout) — exercising the extractor.pdf structural paths."""
    import zlib

    def esc(s: str) -> str:
        return (s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
                .encode("latin-1", errors="replace").decode("latin-1"))

    chunks = [paragraphs[i:i + per_page]
              for i in range(0, len(paragraphs), per_page)] or [[]]
    n_pages = len(chunks)
    page_nums = [3 + 2 * i for i in range(n_pages)]
    content_nums = [4 + 2 * i for i in range(n_pages)]
    annot_num = 3 + 2 * n_pages
    kids = " ".join(f"{p} 0 R" for p in page_nums)

    parts: list[bytes] = [b"%PDF-1.5\n" if objstm else b"%PDF-1.4\n"]
    parts.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    parts.append(f"2 0 obj << /Type /Pages /Kids [{kids}] "
                 f"/Count {n_pages} >> endobj\n".encode("latin-1"))

    annot = (f"<< /Type /Annot /Subtype /Link /Rect [72 60 200 80] "
             f"/A << /S /URI /URI ({esc(link)}) >> >>") if link else ""
    for i, (pnum, cnum, paras) in enumerate(
            zip(page_nums, content_nums, chunks)):
        annots = f"/Annots [{annot_num} 0 R] " if annot and i == 0 else ""
        parts.append(
            f"{pnum} 0 obj << /Type /Page /Parent 2 0 R "
            f"/Contents {cnum} 0 R {annots}>> endobj\n".encode("latin-1"))
        content = "\n".join(
            f"BT /F1 12 Tf 72 {720 - 40 * j} Td ({esc(p)}) Tj ET"
            for j, p in enumerate(paras)).encode("latin-1")
        filt = b""
        if compress:
            content = zlib.compress(content, 6)
            filt = b"/Filter /FlateDecode "
        parts.append(f"{cnum} 0 obj << {filt.decode()}/Length "
                     f"{len(content)} >> stream\n".encode("latin-1")
                     + content + b"\nendstream endobj\n")

    if annot:
        if objstm:
            inner = annot.encode("latin-1")
            header = f"{annot_num} 0 ".encode("latin-1")
            first = len(header)
            data = zlib.compress(header + inner, 6)
            parts.append(
                f"{annot_num + 1} 0 obj << /Type /ObjStm /N 1 "
                f"/First {first} /Filter /FlateDecode /Length {len(data)} "
                f">> stream\n".encode("latin-1")
                + data + b"\nendstream endobj\n")
        else:
            parts.append(f"{annot_num} 0 obj {annot} endobj\n"
                         .encode("latin-1"))
    parts.append(b"trailer << /Root 1 0 R >>\n%%EOF\n")
    return b"".join(parts)


def _mk_pdf_cid_xref(paragraphs: list[str], link: str = "",
                     per_page: int = 2) -> bytes:
    """Third PDF shape: PDF 1.5 with a compressed XREF STREAM (W [1 4 2],
    PNG predictor 12) and CID-style text — every string a 2-byte-code HEX
    string decoded through a Type0 font's /ToUnicode bfrange CMap.

    Text content is byte-identical to the literal-string shapes: the same
    latin-1 errors='replace' transform is applied before encoding, so the
    golden fixtures pin that the sophisticated parse path (xref offsets,
    predictor, hex strings, CMap mapping) yields the same extraction."""
    import zlib

    def to_latin(s: str) -> str:
        return s.encode("latin-1", errors="replace").decode("latin-1")

    chunks = [paragraphs[i:i + per_page]
              for i in range(0, len(paragraphs), per_page)] or [[]]
    n_pages = len(chunks)
    page_nums = [3 + 2 * i for i in range(n_pages)]
    content_nums = [4 + 2 * i for i in range(n_pages)]
    annot_num = 3 + 2 * n_pages
    font_num, tou_num, xref_num = annot_num + 1, annot_num + 2, annot_num + 3
    kids = " ".join(f"{p} 0 R" for p in page_nums)

    out = bytearray(b"%PDF-1.5\n")
    offs: dict[int, int] = {}

    def add(num: int, body: bytes) -> None:
        offs[num] = len(out)
        out.extend(f"{num} 0 obj ".encode("latin-1") + body + b" endobj\n")

    add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    add(2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
        .encode("latin-1"))
    esc_link = (link.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)"))
    res = f"/Resources << /Font << /F9 {font_num} 0 R >> >> "
    for i, (pnum, cnum, paras) in enumerate(
            zip(page_nums, content_nums, chunks)):
        annots = f"/Annots [{annot_num} 0 R] " if link and i == 0 else ""
        add(pnum, (f"<< /Type /Page /Parent 2 0 R /Contents {cnum} 0 R "
                   f"{res}{annots}>>").encode("latin-1"))
        content = "\n".join(
            "BT /F9 12 Tf 72 %d Td <%s> Tj ET"
            % (720 - 40 * j,
               "".join("%04X" % ord(c) for c in to_latin(p)))
            for j, p in enumerate(paras)).encode("latin-1")
        add(cnum, (b"<< /Length " + str(len(content)).encode()
                   + b" >> stream\n" + content + b"\nendstream"))
    if link:
        add(annot_num, (f"<< /Type /Annot /Subtype /Link "
                        f"/Rect [72 60 200 80] "
                        f"/A << /S /URI /URI ({esc_link}) >> >>")
            .encode("latin-1"))
    add(font_num, (f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
                   f"/ToUnicode {tou_num} 0 R >>").encode("latin-1"))
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 beginbfrange\n<0000> <00FF> <0000>\nendbfrange\nend")
    add(tou_num, b"<< /Length " + str(len(cmap)).encode()
        + b" >> stream\n" + cmap + b"\nendstream")

    # xref stream: type-1 rows for objects 1..xref_num, predictor 12
    xoff = len(out)
    offs[xref_num] = xoff
    rows = [b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")]
    for n in range(1, xref_num + 1):
        rows.append(b"\x01" + offs[n].to_bytes(4, "big")
                    + (0).to_bytes(2, "big"))
    enc = bytearray()
    prev = bytes(7)
    for r in rows:
        enc += b"\x02" + bytes((r[j] - prev[j]) & 0xFF for j in range(7))
        prev = r
    data = zlib.compress(bytes(enc), 6)
    out.extend(f"{xref_num} 0 obj ".encode("latin-1")
               + b"<< /Type /XRef /Size " + str(xref_num + 1).encode()
               + b" /W [1 4 2] /Root 1 0 R /Filter /FlateDecode"
               + b" /DecodeParms << /Predictor 12 /Columns 7 >> /Length "
               + str(len(data)).encode() + b" >> stream\n" + data
               + b"\nendstream endobj\n")
    out.extend(b"startxref\n" + str(xoff).encode() + b"\n%%EOF\n")
    return bytes(out)


def _naive_text(html_str: str) -> str:
    """Upstream 'wet'-style naive text: tag strip + entity decode + collapse."""
    return _WS.sub(" ", _html.unescape(_TAG_STRIP.sub(" ", html_str))).strip()


def build_page_row(doc_id: int, text: str, lang: str, source: str,
                   seed: int = 42) -> list[dict]:
    """One document -> 1..3 page rows (duplicates share url, differ in ts).

    Pure function of its arguments; returns dicts with keys
    (url, warc_ts, html, text, lang).
    """
    rng = random.Random(seed * 1_000_003 + doc_id)
    ws = _words(text) or ["placeholder"]
    title = " ".join(ws[:4]).title() or f"Document {doc_id}"

    host = rng.choices(_HOSTS, weights=_HOST_WEIGHTS, k=1)[0]
    # keep the document's source in the path for lineage
    url = f"https://{host}/{source}/doc-{doc_id}"
    ts0 = _BASE_TS + datetime.timedelta(seconds=int(doc_id) * 7)

    if doc_id % 50 == 3:
        paras = [_sentence(ws, rng, 8, 12) for _ in range(3)]
        # three PDF shapes: plain multi-page (…03), FlateDecode content +
        # ObjStm-packed annotation (…53, PDF 1.5 layout), and xref-stream
        # + CID/ToUnicode hex-string text (%150==103 — same extracted
        # bytes by construction, pinning the sophisticated parse path)
        if doc_id % 150 == 103:
            payload = _mk_pdf_cid_xref(
                paras, link=f"https://{host}/ref/{doc_id}", per_page=2)
        else:
            fancy = doc_id % 100 == 53
            payload = _mk_pdf(paras, link=f"https://{host}/ref/{doc_id}",
                              per_page=2, compress=fancy, objstm=fancy)
        naive = " ".join(paras)
    elif doc_id % 100 == 7:
        payload = b"\x00\x01\x02GARBAGE<<<not html" + bytes(str(doc_id), "ascii")
        naive = _WS.sub(" ", text).strip()
    else:
        tmpl = _TEMPLATES[doc_id % len(_TEMPLATES)]
        body = tmpl(ws, rng, _html.escape(title))
        # appendix padding: brings avg page size to a few KB so the bench
        # measures parsing throughput, not per-row scheduling overhead
        appendix = "\n".join(f"<p>{_para(ws, rng, 4)}</p>" for _ in range(6))
        body += f"\n<h2>Appendix</h2>\n{appendix}"
        # Head metadata (author / OpenGraph dates / JSON-LD) — arithmetic
        # on doc_id only, NEVER the rng: consuming rng draws here would
        # shift every later draw and change the golden extracted_text.
        # Presence varies by doc_id so completeness has a distribution.
        author = f"Author {doc_id % 37:02d}"
        pub = (ts0 - datetime.timedelta(days=doc_id % 365)
               ).strftime("%Y-%m-%dT%H:%M:%S")
        mod = (ts0 - datetime.timedelta(days=doc_id % 30)
               ).strftime("%Y-%m-%dT%H:%M:%S")
        head_meta = ""
        if doc_id % 5 != 1:
            head_meta += f"<meta name='author' content='{author}'>"
        if doc_id % 4 != 2:
            head_meta += ("<meta property='article:published_time' "
                          f"content='{pub}'>")
        if doc_id % 3 == 0:
            head_meta += ("<meta property='article:modified_time' "
                          f"content='{mod}'>")
        islands = (
            f'<script type="application/json">'
            f'{{"doc_id": {doc_id}, "lang": "{lang}", '
            f'"n_words": {len(ws)}}}</script>'
        )
        if doc_id % 2 == 0:
            ld = {"@context": "https://schema.org", "@type": "Article",
                  "headline": title, "datePublished": pub,
                  "author": {"@type": "Person", "name": author}}
            islands += ('<script type="application/ld+json">'
                        + json.dumps(ld, sort_keys=True) + "</script>")
        if doc_id % 10 == 2:
            # chart data island (M12 analog with numeric series — the web
            # counterpart of content_extractor.py:368-421's chart_type /
            # title / categories / series extraction)
            n_series = 1 + doc_id % 3
            cats = [f"Q{q + 1}" for q in range(4)]
            series = [{"name": f"series_{s}",
                       "values": [float((doc_id + s * 7 + q * 3) % 100)
                                  for q in range(4)]}
                      for s in range(n_series)]
            chart = {"chart": {"type": ["bar", "line", "pie"][doc_id % 3],
                               "title": f"{title} metrics",
                               "categories": cats, "series": series}}
            islands += ('<script type="application/json">'
                        + json.dumps(chart, sort_keys=True) + "</script>")
        html_str = (
            f"<!DOCTYPE html>\n<html lang='{lang}'><head>"
            f"<title>{_html.escape(title)}</title>"
            f"<meta charset='utf-8'>{head_meta}<style>.x{{color:red}}</style>"
            f"<script>var t={doc_id};</script>"
            # JSON data islands (killed in extraction, surfaced by
            # stages/metadata.DataIslandBatch / ChartSeriesBatch)
            f"{islands}</head>\n"
            f"<body>\n{body}\n</body></html>"
        )
        payload = html_str.encode("utf-8")
        naive = _naive_text(html_str)

    rows = [{"url": url, "warc_ts": ts0, "html": payload,
             "text": naive, "lang": lang}]
    if doc_id % 17 == 0:
        for k in (1, 2):  # re-crawls: same url & bytes, later timestamps
            rows.append({"url": url,
                         "warc_ts": ts0 + datetime.timedelta(days=k),
                         "html": payload, "text": naive, "lang": lang})
    return rows


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


class PageGenBatch:
    """map_batches UDF: documents batch -> pages batch (1..3 rows per doc).

    Stateless and pure per row; used as a plain function stage (no actor
    state needed). Arrow in / Arrow out.

    ``replicate=R`` synthesizes R distinct pages per document (distinct
    doc-id offsets -> distinct urls/templates) — the bench uses it to scale
    the corpus without touching the frozen correctness corpus (R=1).
    """

    _VARIANT_STRIDE = 10_000_019  # prime >> any doc_id, keeps ids disjoint

    def __init__(self, seed: int = 42, replicate: int = 1):
        self.seed = seed
        self.replicate = max(1, int(replicate))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        sources = batch["source"].to_pylist()
        for d, t, l, s in zip(doc_ids, texts, langs, sources):
            for v in range(self.replicate):
                rows.extend(build_page_row(int(d) + v * self._VARIANT_STRIDE,
                                           t or "", l or "", s or "",
                                           self.seed))
        return _rows_to_table(rows)


def pages_table_from_documents(documents: pa.Table, seed: int = 42) -> pa.Table:
    """Driver-side (small scale) variant for tests: full table in memory."""
    rows: list[dict] = []
    for d, t, l, s in zip(documents["doc_id"].to_pylist(),
                          documents["text"].to_pylist(),
                          documents["lang"].to_pylist(),
                          documents["source"].to_pylist()):
        rows.extend(build_page_row(int(d), t or "", l or "", s or "", seed))
    return _rows_to_table(rows)
