"""Extractor semantics unit tests (one behavior per test, SURVEY.md §2)."""

from full_text_extractor_v6_ray.extractor import extract_document
from full_text_extractor_v6_ray.extractor.html_blocks import alt_is_meaningful


def ext(html: str, fallback: str = ""):
    return extract_document(html.encode(), fallback)


def test_headings_and_title_span():
    r = ext("<html><body><h1>Top</h1><h2>Sub</h2><p>body text here</p></body></html>")
    assert r.extracted_text == "# Top\n\n## Sub\n\nbody text here"
    kinds = [(s["kind"], r.extracted_text.encode()[s["start"]:s["end"]].decode())
             for s in r.spans]
    assert ("title", "Top") in kinds
    assert ("heading", "Sub") in kinds


def test_title_promotion_without_h1():
    r = ext("<html><head><title>Page Title</title></head><body><p>text</p></body></html>")
    assert r.extracted_text.startswith("# Page Title")


def test_no_title_promotion_with_h1():
    r = ext("<html><head><title>T</title></head><body><h1>Real</h1></body></html>")
    assert r.extracted_text == "# Real"


def test_nested_lists_depth_and_numbering():
    r = ext("<ul><li>a</li><li>b<ul><li>c</li></ul></li></ul><ol><li>x</li><li>y</li></ol>")
    assert r.extracted_text == "- a\n- b\n  - c\n1. x\n2. y"


def test_pseudo_bullet_paragraph_becomes_list_item():
    r = ext("<p>• pseudo item</p>")
    assert r.extracted_text == "- pseudo item"
    assert r.spans[0]["kind"] == "list_item"


def test_table_pipe_escape_and_header():
    r = ext("<table><tr><th>H1</th><th>A|B</th></tr><tr><td>x</td><td>y</td></tr></table>")
    assert r.extracted_text == "| H1 | A\\|B |\n| --- | --- |\n| x | y |"
    assert r.spans[0]["kind"] == "table"


def test_inline_formatting_and_fold():
    r = ext("<p>a <b>bb</b> c</p><p><b>all bold</b></p>")
    assert r.extracted_text == "a **bb** c\n\n**all bold**"


def test_link_rendering_and_span_offsets():
    r = ext("<p>go <a href='www.x.com'>there</a> now</p>")
    assert r.extracted_text == "go [there](https://www.x.com) now"
    (span,) = [s for s in r.spans if s["kind"] == "link"]
    assert r.extracted_text.encode()[span["start"]:span["end"]] == b"there"
    assert span["href"] == "https://www.x.com"
    assert r.links == [("there", "https://www.x.com")]


def test_boilerplate_structural_strip():
    r = ext("<nav><a href='/'>Home</a></nav><p>real content</p>"
            "<footer>foot</footer><aside>side</aside>")
    assert r.extracted_text == "real content"


def test_boilerplate_marker_class_strip():
    r = ext("<div class='ad-box'><a href='/b'>Buy</a></div><p>keep me</p>")
    assert r.extracted_text == "keep me"


def test_linky_block_scoring_strip():
    linky = "".join(f"<a href='/{i}'>L{i}</a> " for i in range(6))
    r = ext(f"<div><p>{linky}</p></div><p>a real paragraph with plenty of words</p>")
    assert r.extracted_text == "a real paragraph with plenty of words"
    assert r.n_blocks_dropped == 1


def test_script_style_killed():
    r = ext("<script>var x=1;</script><style>.a{}</style><p>visible</p>")
    assert r.extracted_text == "visible"


def test_entities_and_unicode_bytes():
    r = ext("<p>Fish &amp; chips&nbsp;&#163;5 café</p>")
    assert r.extracted_text == "Fish & chips £5 café"


def test_img_alt_quality():
    assert alt_is_meaningful("A chart of totals")
    assert not alt_is_meaningful("image1.png")
    assert not alt_is_meaningful("ab")
    assert not alt_is_meaningful("logo")
    r = ext("<img alt='Chart of sales'><img alt='image2.png'><p>t</p>")
    assert r.extracted_text == "![Chart of sales](image)\n\nt"


def test_pre_preserves_whitespace():
    r = ext("<pre>a  b\n  c</pre>")
    assert r.extracted_text == "```\na  b\n  c\n```"


def test_malformed_html_recovers():
    r = ext("<p>unclosed <b>bold<p>next para</i></div>")
    assert "unclosed" in r.extracted_text and "next para" in r.extracted_text
    assert r.method == "html"


def test_empty_payload_error():
    r = extract_document(b"", "")
    assert r.method == "error" and r.error == "empty_payload"


def test_garbage_falls_back_to_text():
    r = extract_document(b"\x00\x01binary junk", "upstream naive text")
    assert r.method == "fallback_text"
    assert r.extracted_text == "upstream naive text"


def test_determinism_byte_identical():
    html = ("<h1>T</h1><p>a <b>b</b> <a href='x.com'>c</a></p>"
            "<ul><li>i</li></ul>").encode()
    a = extract_document(html, "")
    b = extract_document(html, "")
    assert a.extracted_text.encode() == b.extracted_text.encode()
    assert a.spans == b.spans


def test_extractor_registry_plugin():
    """§2.9 extension surface: a registered handler takes over a sniffed
    kind and unregistering restores the builtin route."""
    from full_text_extractor_v6_ray.extractor import (
        ExtractResult,
        register_extractor,
        unregister_extractor,
    )

    def custom(payload, fallback, cfg):
        return ExtractResult(extracted_text="CUSTOM:" + payload.decode(),
                             method="custom", n_blocks_kept=1,
                             quality_score=1.0)

    payload = b"\x00binaryish payload"
    base = extract_document(payload, "fallback text")
    assert base.method != "custom"

    register_extractor("unknown", custom)
    try:
        r = extract_document(payload, "fallback text")
        assert r.method == "custom"
        assert r.extracted_text.startswith("CUSTOM:")
    finally:
        unregister_extractor("unknown")
    after = extract_document(payload, "fallback text")
    assert after.method == base.method


def test_extractor_registry_plugin_errors_are_captured():
    """Degradation principle applies to plug-ins: a raising handler
    yields an error row, never an exception."""
    from full_text_extractor_v6_ray.extractor import (
        register_extractor,
        unregister_extractor,
    )

    def bad(payload, fallback, cfg):
        raise ValueError("plugin boom")

    register_extractor("unknown", bad)
    try:
        r = extract_document(b"\x00odd bytes", "")
        assert r.method == "error"
        assert r.error.startswith("extract_error:")
    finally:
        unregister_extractor("unknown")


def test_sniffer_registry_end_to_end():
    """§2.9: a custom sniffer + matching handler route a new payload
    family (magic-prefixed) end-to-end without touching the router."""
    from full_text_extractor_v6_ray.extractor import (
        ExtractResult,
        register_extractor,
        register_sniffer,
        unregister_extractor,
        unregister_sniffer,
    )

    def sniff_warcish(payload: bytes) -> str:
        return "warcish" if payload.startswith(b"WARC/1.0") else ""

    def handle_warcish(payload, fallback, cfg):
        body = payload.split(b"\r\n\r\n", 1)[-1].decode("utf-8", "replace")
        return ExtractResult(extracted_text=body.strip(), method="warcish",
                             n_blocks_kept=1, quality_score=1.0)

    register_sniffer(sniff_warcish)
    register_extractor("warcish", handle_warcish)
    try:
        r = extract_document(b"WARC/1.0\r\nx: y\r\n\r\nrecord body", "")
        assert r.method == "warcish"
        assert r.extracted_text == "record body"
        # builtin routes untouched
        html = extract_document(b"<html><body><p>hi</p></body></html>", "")
        assert html.method == "html"
    finally:
        unregister_sniffer(sniff_warcish)
        unregister_extractor("warcish")
    assert extract_document(b"WARC/1.0\r\n\r\nz", "z").method != "warcish"
