from full_text_extractor_v6_ray.extractor import extract_document
from full_text_extractor_v6_ray.extractor.pdf import extract_pdf
from full_text_extractor_v6_ray.sources.pages_gen import _mk_pdf


def test_pdf_text_and_link():
    payload = _mk_pdf(["First paragraph.", "Second (with parens)."],
                      link="https://x.com/ref")
    text, links, err = extract_pdf(payload)
    assert err == ""
    assert text == "First paragraph.\n\nSecond (with parens)."
    assert links == [("Link on page 1", "https://x.com/ref")]


def test_pdf_routed_by_sniff():
    payload = _mk_pdf(["Hello PDF."])
    r = extract_document(payload, "")
    assert r.method == "pdf"
    assert r.extracted_text == "Hello PDF."


def test_pdf_escape_decoding():
    payload = _mk_pdf([r"a\b (c) d"])
    text, _, err = extract_pdf(payload)
    assert "(c)" in text and err == ""


def test_unparseable_pdf_is_error_not_garbage():
    r = extract_document(b"%PDF-1.7\nbinary compressed stuff", "")
    assert r.method == "error"
    assert r.error == "pdf_unsupported"


def test_pdf_inline_text_urls_scanned():
    """M22 parity: bare URLs in PDF text are collected with a +/-50-char
    context window (hyperlink_extractor.py:283-296) and (url, page)
    membership dedup (J2)."""
    payload = _mk_pdf(["Visit https://docs.example.org/guide today.",
                       "Repeat: https://docs.example.org/guide."],
                      link="https://annot.example.org/x", per_page=2)
    text, links, err = extract_pdf(payload)
    assert err == ""
    assert [u for _, u in links] == ["https://annot.example.org/x",
                                     "https://docs.example.org/guide"]
    ctx = [t for t, u in links if u == "https://docs.example.org/guide"][0]
    assert "Visit" in ctx and "today" in ctx   # context window, not bare url


def test_pdf_multipage_segmentation():
    """Five paragraphs at 2/page -> 3 pages in /Kids order; text joins
    pages in order; regex URLs report the right page via dedup scope."""
    paras = [f"Paragraph number {i}." for i in range(5)]
    paras[4] = "Last visit https://per.page/url here."
    payload = _mk_pdf(paras, per_page=2)
    text, links, err = extract_pdf(payload)
    assert err == ""
    assert text.split("\n\n") == [
        "Paragraph number 0.", "Paragraph number 1.", "Paragraph number 2.",
        "Paragraph number 3.", "Last visit https://per.page/url here."]
    assert [u for _, u in links] == ["https://per.page/url"]


def test_pdf_flate_and_objstm():
    """PDF 1.5 shape: FlateDecode content streams + the link annotation
    packed inside a /Type /ObjStm object stream."""
    payload = _mk_pdf(["Compressed alpha.", "Compressed beta.",
                       "Compressed gamma."],
                      link="https://objstm.example.org/a",
                      per_page=2, compress=True, objstm=True)
    assert b"FlateDecode" in payload and b"ObjStm" in payload
    assert b"Compressed alpha." not in payload   # genuinely compressed
    text, links, err = extract_pdf(payload)
    assert err == ""
    assert text == ("Compressed alpha.\n\nCompressed beta.\n\n"
                    "Compressed gamma.")
    assert links == [("Link on page 1", "https://objstm.example.org/a")]


def test_pdf_same_url_distinct_pages_kept():
    """(url, page) dedup keeps one hit per page, not one global."""
    paras = ["See https://dup.example.org/x now.",
             "Also https://dup.example.org/x again.",
             "And https://dup.example.org/x once more."]
    payload = _mk_pdf(paras, per_page=1)
    _, links, err = extract_pdf(payload)
    assert err == ""
    assert [u for _, u in links] == ["https://dup.example.org/x"] * 3


def test_corpus_cid_xref_shape_matches_plain_shape():
    """The third corpus PDF shape (doc_id %150==103: xref stream with PNG
    predictor 12 + Type0/ToUnicode hex-string text) extracts byte-identical
    text/links/spans to the plain literal-string shape by construction —
    golden fixtures therefore pin the sophisticated parse path end-to-end."""
    from full_text_extractor_v6_ray.sources.pages_gen import _mk_pdf_cid_xref

    paras = ["First cid paragraph.", "Second (with parens).",
             "Third https://inline.example.org/p here."]
    link = "https://anchor.example.org/ref"
    plain = _mk_pdf(paras, link=link, per_page=2)
    fancy = _mk_pdf_cid_xref(paras, link=link, per_page=2)
    assert fancy.startswith(b"%PDF-1.5") and b"/Type /XRef" in fancy
    assert b"(" + paras[0].encode()[:5] not in fancy  # no literal strings
    t1, l1, e1 = extract_pdf(plain)
    t2, l2, e2 = extract_pdf(fancy)
    assert (t1, l1, e1) == (t2, l2, e2)
    assert e1 == "" and t1.split("\n\n")[0] == paras[0]
