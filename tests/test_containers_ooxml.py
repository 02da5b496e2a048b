"""Container unwrap (gzip / WARC) + OOXML fallback (docx/xlsx/pptx) —
S7/S8 breadth vs the reference's MarkItDown fallback family
(file_converter.py:143-222)."""

import gzip
import io
import zipfile

from full_text_extractor_v6_ray.extractor.document import extract_document
from full_text_extractor_v6_ray.extractor.sniff import sniff_payload

HTML = (b"<html><head><title>T</title></head><body>"
        b"<h1>Container Title</h1><p>Inner page body text that is long "
        b"enough to be kept by the scorer as real content.</p>"
        b"</body></html>")


def _warc_record(body: bytes, http: bool = True,
                 wtype: bytes = b"response") -> bytes:
    if http:
        block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                 + body)
        ctype = b"application/http; msgtype=response"
    else:
        block = body
        ctype = b"text/html"
    return (b"WARC/1.0\r\n"
            b"WARC-Type: " + wtype + b"\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n"
            b"\r\n" + block + b"\r\n\r\n")


def test_sniff_containers():
    assert sniff_payload(gzip.compress(HTML)) == "gzip"
    assert sniff_payload(_warc_record(HTML)) == "warc"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "x")
    assert sniff_payload(buf.getvalue()) == "zip"


def test_gzip_member_unwraps_to_html():
    res = extract_document(gzip.compress(HTML))
    assert res.error == ""
    assert res.method == "gzip>html"
    assert "Container Title" in res.extracted_text


def test_warc_response_record_unwraps_http_body():
    res = extract_document(_warc_record(HTML))
    assert res.error == ""
    assert res.method == "warc>html"
    assert "Inner page body text" in res.extracted_text


def test_warc_resource_record_without_http():
    res = extract_document(_warc_record(HTML, http=False,
                                        wtype=b"resource"))
    assert res.method == "warc>html"


def test_gzipped_warc_record_nests():
    res = extract_document(gzip.compress(_warc_record(HTML)))
    assert res.method == "gzip>warc>html"
    assert "Container Title" in res.extracted_text


def test_warc_request_record_falls_back():
    res = extract_document(_warc_record(b"GET / HTTP/1.1\r\n\r\n",
                                        wtype=b"request"),
                           text_fallback="naive text")
    assert res.method == "fallback_text"
    assert res.extracted_text == "naive text"


def _zip_bytes(members: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in members.items():
            zf.writestr(name, content)
    return buf.getvalue()


def test_docx_paragraphs_tables_links():
    doc = """<?xml version="1.0"?>
    <w:document><w:body>
      <w:p><w:r><w:t>First paragraph</w:t></w:r></w:p>
      <w:p><w:r><w:t>Visit </w:t></w:r>
        <w:hyperlink r:id="rId7"><w:r><w:t>our site</w:t></w:r></w:hyperlink>
      </w:p>
      <w:tbl>
        <w:tr><w:tc><w:p><w:r><w:t>A</w:t></w:r></w:p></w:tc>
              <w:tc><w:p><w:r><w:t>B|C</w:t></w:r></w:p></w:tc></w:tr>
      </w:tbl>
      <w:p><w:r><w:t>After table</w:t></w:r></w:p>
    </w:body></w:document>"""
    rels = ('<Relationships><Relationship Id="rId7" Type="x" '
            'Target="https://example.test/site" TargetMode="External"/>'
            '</Relationships>')
    payload = _zip_bytes({"word/document.xml": doc,
                          "word/_rels/document.xml.rels": rels})
    res = extract_document(payload)
    assert res.method == "docx" and res.error == ""
    assert "First paragraph" in res.extracted_text
    assert "| A | B\\|C |" in res.extracted_text
    assert "After table" in res.extracted_text
    # table cell text must not double as a body paragraph
    assert res.extracted_text.count("A") >= 1
    assert ("our site", "https://example.test/site") in res.links


def test_xlsx_shared_and_inline_strings():
    shared = ('<sst><si><t>Alpha</t></si><si><t>Beta</t></si></sst>')
    sheet = """<worksheet><sheetData>
      <row r="1"><c r="A1" t="s"><v>0</v></c>
                 <c r="B1"><v>42</v></c></row>
      <row r="2"><c r="A2" t="s"><v>1</v></c>
                 <c r="B2" t="inlineStr"><is><t>Inline</t></is></c></row>
    </sheetData></worksheet>"""
    payload = _zip_bytes({"xl/workbook.xml": "<workbook/>",
                          "xl/sharedStrings.xml": shared,
                          "xl/worksheets/sheet1.xml": sheet})
    res = extract_document(payload)
    assert res.method == "xlsx" and res.error == ""
    assert "| Alpha | 42 |" in res.extracted_text
    assert "| Beta | Inline |" in res.extracted_text


def test_pptx_slides_in_order_with_links():
    s1 = ('<p:sld><p:txBody><a:p><a:r><a:t>Slide one title</a:t></a:r>'
          '</a:p></p:txBody></p:sld>')
    s2 = ('<p:sld><p:txBody><a:p><a:r><a:rPr>'
          '<a:hlinkClick r:id="rId2"/></a:rPr>'
          '<a:t>Linked text</a:t></a:r></a:p></p:txBody></p:sld>')
    rels2 = ('<Relationships><Relationship Id="rId2" Type="x" '
             'Target="https://deck.test/ref" TargetMode="External"/>'
             '</Relationships>')
    payload = _zip_bytes({
        "ppt/presentation.xml": "<p:presentation/>",
        "ppt/slides/slide2.xml": s2,
        "ppt/slides/slide1.xml": s1,
        "ppt/slides/_rels/slide2.xml.rels": rels2,
    })
    res = extract_document(payload)
    assert res.method == "pptx" and res.error == ""
    assert res.extracted_text.index("Slide one title") < \
        res.extracted_text.index("Linked text")
    assert res.links and res.links[0][1] == "https://deck.test/ref"


def test_unknown_zip_iterates_members():
    payload = _zip_bytes({"random/file.bin": "zzz"})
    res = extract_document(payload)
    # generic archives iterate members through the router (reference
    # "ZIP iterates over contents"); a text-like member degrades to
    # its own decoded text under a per-member header
    assert res.method == "zip" and res.error == ""
    assert res.extracted_text == "## random/file.bin\n\nzzz"


def test_bad_zip_degrades():
    payload = b"PK\x03\x04" + b"\x00" * 40
    res = extract_document(payload, text_fallback="fallback body")
    assert res.method == "fallback_text"


def _warcinfo_record() -> bytes:
    block = b"software: synthetic-crawler/1.0\r\nformat: WARC file\r\n"
    return (b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n"
            b"\r\n" + block + b"\r\n\r\n")


def test_warc_multi_record_skips_warcinfo_and_request():
    """Real .warc files lead with a warcinfo record and interleave
    request records; the router finds the first CONTENT record."""
    payload = (_warcinfo_record()
               + _warc_record(b"GET / HTTP/1.1\r\n\r\n", wtype=b"request")
               + _warc_record(HTML))
    res = extract_document(payload)
    assert res.error == ""
    assert res.method == "warc>html"
    assert "Inner page body text" in res.extracted_text


def test_warc_multi_record_honors_content_length_boundaries():
    """The first response record's Content-Length bounds its block even
    when more records follow — trailing records never bleed into the
    extracted page."""
    second = (b"<html><body><h1>Second Record</h1><p>Should never appear "
              b"in the first record's extraction output at all.</p>"
              b"</body></html>")
    payload = _warc_record(HTML) + _warc_record(second)
    res = extract_document(payload)
    assert res.method == "warc>html"
    assert "Inner page body text" in res.extracted_text
    assert "Second Record" not in res.extracted_text


def test_warc_only_noncontent_records_is_empty():
    payload = _warcinfo_record() + _warc_record(
        b"GET / HTTP/1.1\r\n\r\n", wtype=b"request")
    res = extract_document(payload)
    assert res.method == "error" and res.error == "warc_empty"


def _chart_pptx(chart_xml: str, extra: dict | None = None) -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/presentation.xml", "<p:presentation/>")
        zf.writestr("ppt/charts/chart1.xml", chart_xml)
        for name, xml in (extra or {}).items():
            zf.writestr(name, xml)
    return buf.getvalue()


def test_pptx_chart_series_parses_drawingml():
    from full_text_extractor_v6_ray.extractor.ooxml import pptx_chart_series

    xml = (
        "<c:chartSpace><c:chart>"
        "<c:title><a:t>Sales</a:t></c:title>"
        "<c:plotArea><c:lineChart>"
        "<c:ser><c:tx><c:strRef>"
        '<c:pt idx="0"><c:v>East</c:v></c:pt></c:strRef></c:tx>'
        # scrambled idx order; parser must sort by idx
        '<c:cat><c:strRef><c:pt idx="1"><c:v>Feb</c:v></c:pt>'
        '<c:pt idx="0"><c:v>Jan</c:v></c:pt></c:strRef></c:cat>'
        '<c:val><c:numRef><c:numCache><c:pt idx="1"><c:v>2.5</c:v></c:pt>'
        '<c:pt idx="0"><c:v>1.5</c:v></c:pt></c:numCache></c:numRef></c:val>'
        "</c:ser>"
        "<c:ser><c:tx><c:v>West</c:v></c:tx>"
        '<c:val><c:numRef><c:numCache><c:pt idx="0"><c:v>9</c:v></c:pt>'
        '<c:pt idx="1"><c:v>oops</c:v></c:pt>'   # non-numeric -> skipped
        "</c:numCache></c:numRef></c:val></c:ser>"
        "</c:lineChart></c:plotArea></c:chart></c:chartSpace>")
    out = pptx_chart_series(_chart_pptx(xml))
    assert len(out) == 2
    east, west = out
    assert east["chart_type"] == "lineChart" and east["title"] == "Sales"
    assert east["series_name"] == "East"
    assert east["categories"] == ["Jan", "Feb"]
    assert east["values"] == [1.5, 2.5]
    assert west["series_name"] == "West"
    assert west["values"] == [9.0]           # 'oops' dropped, not fatal
    assert west["categories"] == []


def test_pptx_chart_series_never_raises():
    from full_text_extractor_v6_ray.extractor.ooxml import pptx_chart_series

    assert pptx_chart_series(b"not a zip") == []
    # a malformed chart part contributes nothing; a second good one parses
    good = ("<c:chartSpace><c:chart><c:plotArea><c:pieChart>"
            '<c:ser><c:val><c:numRef><c:numCache>'
            '<c:pt idx="0"><c:v>4</c:v></c:pt>'
            "</c:numCache></c:numRef></c:val></c:ser>"
            "</c:pieChart></c:plotArea></c:chart></c:chartSpace>")
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/charts/chart1.xml", "<c:chartSpace")  # truncated
        zf.writestr("ppt/charts/chart2.xml", good)
    out = pptx_chart_series(buf.getvalue())
    assert len(out) == 1
    assert out[0]["chart_idx"] == 2
    assert out[0]["chart_type"] == "pieChart"
    assert out[0]["values"] == [4.0]
