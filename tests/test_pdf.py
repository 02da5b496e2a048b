from full_text_extractor_v6_ray.extractor import extract_document
from full_text_extractor_v6_ray.extractor.pdf import extract_pdf
from full_text_extractor_v6_ray.sources.pages_gen import _mk_pdf


def test_pdf_text_and_link():
    payload = _mk_pdf(["First paragraph.", "Second (with parens)."],
                      link="https://x.com/ref")
    text, links, err = extract_pdf(payload)
    assert err == ""
    assert text == "First paragraph.\n\nSecond (with parens)."
    assert links == ["https://x.com/ref"]


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
    """M22 parity: bare URLs in PDF text are collected (J2 dedup)."""
    payload = _mk_pdf(["Visit https://docs.example.org/guide today.",
                       "Repeat: https://docs.example.org/guide."],
                      link="https://annot.example.org/x")
    text, links, err = extract_pdf(payload)
    assert err == ""
    assert links == ["https://annot.example.org/x",
                     "https://docs.example.org/guide"]
