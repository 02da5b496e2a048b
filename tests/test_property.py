"""Property-based robustness: the extractor must never crash, always emit
valid spans, and be bit-deterministic — on ARBITRARY byte soup and on
randomly generated HTML."""

import string

from hypothesis import given, settings, strategies as st

from full_text_extractor_v6_ray.extractor import extract_document, fix_url
from full_text_extractor_v6_ray.extractor.normalize import normalize_text

TAGS = ["p", "div", "b", "i", "a", "ul", "li", "h1", "h2", "table", "tr",
        "td", "nav", "script", "span", "pre", "img", "br", "title"]

text_chunk = st.text(
    alphabet=string.ascii_letters + string.digits + " .,&<>\"'=/-•é ",
    max_size=40)


@st.composite
def html_soup(draw):
    n = draw(st.integers(1, 30))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(text_chunk))
        elif kind == 1:
            t = draw(st.sampled_from(TAGS))
            attr = draw(st.sampled_from(
                ["", " class='x'", " href='www.a.com'", " alt='diagram of x'",
                 " class='ad-box'", " lang=en", " href=", " <"]))
            parts.append(f"<{t}{attr}>")
        elif kind == 2:
            parts.append(f"</{draw(st.sampled_from(TAGS))}>")
        else:
            parts.append(draw(st.sampled_from(
                ["<!-- c -->", "<!DOCTYPE html>", "<![CDATA[x]]>", "<?pi?>",
                 "&amp;", "&#65;", "&bogus;", "<", ">", "</"])))
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(html_soup())
def test_extract_never_raises_and_spans_valid(html):
    r = extract_document(html.encode("utf-8"), "fallback text")
    assert r.method in ("html", "fallback_text", "error", "pdf")
    raw = r.extracted_text.encode("utf-8")
    for s in r.spans:
        assert 0 <= s["start"] <= s["end"] <= len(raw)
        raw[s["start"]:s["end"]].decode("utf-8")  # utf-8 boundary slice


@settings(max_examples=100, deadline=None)
@given(html_soup())
def test_extract_deterministic(html):
    payload = html.encode("utf-8")
    a = extract_document(payload, "")
    b = extract_document(payload, "")
    assert a.extracted_text == b.extracted_text
    assert a.spans == b.spans
    assert a.method == b.method


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_arbitrary_bytes_never_raise(payload):
    r = extract_document(payload, "fb")
    assert r.error == "" or r.extracted_text == ""


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_fix_url_idempotent(u):
    once = fix_url(u)
    assert fix_url(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@st.composite
def html_soup_sane_tags(draw):
    """Soup whose '<' appear only at genuine tag starts.

    stdlib html.parser's treatment of '<' INSIDE a tag is a pathological
    artifact (e.g. '<A</p>' parses as a start tag literally named 'a<');
    the fast tokenizer intentionally does not clone that bug-for-bug —
    both parsers are crash-free and span-valid on such inputs (properties
    above), but byte parity is only promised for structurally sane markup.
    """
    sane_text = st.text(
        alphabet=string.ascii_letters + string.digits + " .,&\"'=/->é ",
        max_size=40)
    n = draw(st.integers(1, 30))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(sane_text))
        elif kind == 1:
            t = draw(st.sampled_from(TAGS))
            attr = draw(st.sampled_from(
                ["", " class='x'", " href='www.a.com'", " alt='diagram of x'",
                 " class='ad-box'", " lang=en"]))
            parts.append(f"<{t}{attr}>")
        elif kind == 2:
            parts.append(f"</{draw(st.sampled_from(TAGS))}>")
        else:
            parts.append(draw(st.sampled_from(
                ["<!-- c -->", "<!DOCTYPE html>", "&amp;", "&#65;",
                 "&bogus;", ">"])))
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(html_soup_sane_tags())
def test_fast_parser_parity_on_soup(html):
    from full_text_extractor_v6_ray.extractor.html_blocks import (
        parse_html_blocks,
        score_and_filter,
    )
    from full_text_extractor_v6_ray.extractor.html_fast import (
        parse_html_blocks_fast,
    )
    from full_text_extractor_v6_ray.extractor.render import render_blocks

    b1, t1, d1 = parse_html_blocks(html)
    b2, t2, d2 = parse_html_blocks_fast(html)
    k1, _ = score_and_filter(b1)
    k2, _ = score_and_filter(b2)
    assert render_blocks(k1, t1) == render_blocks(k2, t2)
