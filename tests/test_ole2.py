"""Legacy OLE2 binary Office ingestion (extractor/ole2.py): MS-CFB
container round-trips, .doc piece-table text (ANSI + Unicode pieces,
HYPERLINK fields, cell marks), .xls BIFF8 (SST CONTINUE splits, RK /
MULRK / BOOLERR cells, multi-sheet), .ppt text atoms — and the
sniff->route->extract integration."""

from __future__ import annotations

import struct

import pytest

from full_text_extractor_v6_ray.extractor.document import extract_document
from full_text_extractor_v6_ray.extractor.ole2 import (
    CompoundFile,
    _rk_value,
    build_cfb,
    build_doc,
    build_ppt,
    build_xls,
    extract_ole2,
)
from full_text_extractor_v6_ray.extractor.sniff import sniff_payload


# ---------------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------------

def test_cfb_roundtrip_mini_and_regular_streams():
    streams = [("small", b"s" * 100),            # mini-stream path
               ("edge", b"e" * 4095),            # largest mini stream
               ("big", b"B" * 4096),             # smallest regular stream
               ("huge", bytes(range(256)) * 64)]  # multi-sector regular
    data = build_cfb(streams)
    cf = CompoundFile(data)
    assert cf.names() == {"small", "edge", "big", "huge"}
    for name, blob in streams:
        assert cf.stream(name) == blob, name
    # placement honors the 4096 cutoff
    sizes = {e["name"]: e["size"] for e in cf.entries if e["type"] == 2}
    assert sizes["edge"] == 4095 and sizes["big"] == 4096
    assert cf.stream("missing") is None


def test_cfb_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        CompoundFile(b"\xd0\xcf\x11\xe0 nope")
    with pytest.raises(ValueError):
        CompoundFile(b"not ole2 at all" * 40)
    data = bytearray(build_cfb([("s", b"x" * 5000)]))
    cf_ok = CompoundFile(bytes(data))
    assert cf_ok.stream("s") == b"x" * 5000
    truncated = bytes(data[:1024])
    assert extract_ole2(truncated)[3].startswith("ole2_error")


def test_cfb_fat_cycle_guard():
    data = bytearray(build_cfb([("s", b"y" * 9000)]))
    cf = CompoundFile(bytes(data))
    # corrupt the FAT: point the stream's first sector at itself
    e = next(x for x in cf.entries if x["name"] == "s")
    # find the fat sector region: patch every FAT entry for the stream's
    # start sector to loop back to itself
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (fat_sec0,) = struct.unpack_from("<I", data, 76)    # first DIFAT slot
    fat_off = 512 + fat_sec0 * 512
    struct.pack_into("<I", data, fat_off + 4 * e["start"], e["start"])
    res = extract_ole2(bytes(data))
    assert res[3].startswith("ole2_")   # degraded, no hang / raise


def test_unknown_compound_file_reports_unsupported():
    data = build_cfb([("SomeCustomStream", b"abc" * 100)])
    text, links, method, err = extract_ole2(data)
    assert (method, err) == ("ole2", "ole2_unsupported")


# ---------------------------------------------------------------------------
# .doc
# ---------------------------------------------------------------------------

def test_doc_paragraphs_and_unicode_pieces():
    d = build_doc(["First paragraph.", "Zwölf Boxkämpfer — naïve."],
                  pieces_compressed=[True, False])
    text, links, method, err = extract_ole2(d)
    assert method == "doc" and err == ""
    assert text == "First paragraph.\n\nZwölf Boxkämpfer — naïve."


def test_doc_punctuation_survives_special_char_strip():
    # regression: the specials table must drop ONLY control chars —
    # printable punctuation passes through untouched
    d = build_doc(["Call f(x), use [a] {b} 'c' \"d\" 100% & <e>."])
    text, _, _, err = extract_ole2(d)
    assert err == ""
    assert text == "Call f(x), use [a] {b} 'c' \"d\" 100% & <e>."


def test_doc_hyperlink_fields():
    d = build_doc(["Intro para."],
                  links=[("Click here", "https://ex.com/a"),
                         ("", "https://ex.com/bare")])
    text, links, method, err = extract_ole2(d)
    assert method == "doc"
    assert links == [("Click here", "https://ex.com/a"),
                     ("https://ex.com/bare", "https://ex.com/bare")]
    # display text stays in the body, field plumbing does not
    assert "Click here" in text and "HYPERLINK" not in text


def test_doc_cell_marks_render_pipe_rows():
    # cell marks (0x07) inside a paragraph render as a pipe row
    d = build_doc(["a\x07b\x07\x07", "after table"])
    text, _, method, _ = extract_ole2(d)
    assert "| a | b |" in text and "after table" in text


def test_doc_missing_table_stream_degrades():
    d = build_doc(["body"])
    cf = CompoundFile(d)
    wd = cf.stream("WordDocument")
    broken = build_cfb([("WordDocument", wd)])    # no 1Table
    text, _, method, err = extract_ole2(broken)
    assert text == "" and err.startswith("ole2_error")


# ---------------------------------------------------------------------------
# .xls
# ---------------------------------------------------------------------------

def test_xls_multisheet_cells_and_types():
    x = build_xls([
        ("Revenue", [["region", "total"], ["emea", 1250], ["apac", 0.5]]),
        ("Flags", [["ok", True], ["bad", False]]),
    ])
    text, links, method, err = extract_ole2(x)
    assert method == "xls" and err == ""
    assert text.split("\n\n") == [
        "## Revenue",
        "| region | total |",
        "| emea | 1250 |",
        "| apac | 0.5 |",
        "## Flags",
        "| ok | TRUE |",
        "| bad | FALSE |",
    ]


def test_xls_sst_continue_records():
    # force tiny SST records so strings split mid-character-stream; the
    # CONTINUE cursor must reassemble every string exactly
    rows = [[f"value-{i:03d}-" + "long" * 10] for i in range(40)]
    x = build_xls([("S", rows)], sst_record_cap=50)
    text, _, method, err = extract_ole2(x)
    assert err == ""
    for i in range(40):
        assert f"value-{i:03d}-" in text


def test_xls_rk_and_mulrk_records():
    # builder emits NUMBER; craft RK/MULRK records by hand to pin the
    # RK decode (int30, f64-high-bits, x100 divisor) and MULRK layout
    from full_text_extractor_v6_ray.extractor.ole2 import (
        _XLS_BOF, _XLS_EOF, _XLS_MULRK, _XLS_RK, _biff)

    assert _rk_value(100 << 2 | 0x02) == 100.0
    assert _rk_value((-7 << 2) & 0xFFFFFFFF | 0x02) == -7.0
    assert _rk_value(12345 << 2 | 0x03) == 123.45
    packed = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    assert _rk_value((packed >> 32) & 0xFFFFFFFC) == 2.5

    bof = _biff(_XLS_BOF, struct.pack("<HHHHII", 0x0600, 0x0010,
                                      0, 0, 0, 0))
    rk = _biff(_XLS_RK, struct.pack("<HHHI", 0, 0, 0, (42 << 2) | 0x02))
    mulrk = _biff(_XLS_MULRK, struct.pack("<HH", 1, 0)
                  + struct.pack("<HI", 0, (7 << 2) | 0x02)
                  + struct.pack("<HI", 0, (800 << 2) | 0x03)
                  + struct.pack("<H", 1))
    sheet = bof + rk + mulrk + _biff(_XLS_EOF, b"")

    base = build_xls([("T", [["x"]])])
    cf = CompoundFile(base)
    wb = cf.stream("Workbook")
    # splice: replace the sheet substream with the crafted one by
    # rebuilding globals for a single sheet at the right offset
    from full_text_extractor_v6_ray.extractor.ole2 import (
        _XLS_BOUNDSHEET, _XLS_SST)
    bof_g = _biff(_XLS_BOF, struct.pack("<HHHHII", 0x0600, 0x0005,
                                        0, 0, 0, 0))
    sst = _biff(_XLS_SST, struct.pack("<II", 0, 0))
    name = "T"
    bs_payload = (struct.pack("<IHBB", 0, 0, len(name), 0x01)
                  + name.encode("utf-16-le"))
    bs = _biff(_XLS_BOUNDSHEET, bs_payload)
    globals_blob = bof_g + bs + sst + _biff(_XLS_EOF, b"")
    bs_payload = (struct.pack("<IHBB", len(globals_blob), 0,
                              len(name), 0x01) + name.encode("utf-16-le"))
    globals_blob = (bof_g + _biff(_XLS_BOUNDSHEET, bs_payload) + sst
                    + _biff(_XLS_EOF, b""))
    crafted = build_cfb([("Workbook", globals_blob + sheet)])
    text, _, method, err = extract_ole2(crafted)
    assert err == ""
    assert text.split("\n\n") == ["## T", "| 42 |", "| 7 | 8 |"]


# ---------------------------------------------------------------------------
# .ppt
# ---------------------------------------------------------------------------

def test_ppt_text_atoms_and_paragraph_marks():
    p = build_ppt(["Deck Title", "Bullet one\rBullet two", "bytes atom"],
                  as_bytes=[False, False, True])
    text, links, method, err = extract_ole2(p)
    assert method == "ppt" and err == ""
    assert text == "Deck Title\n\nBullet one\n\nBullet two\n\nbytes atom"


def test_ppt_nested_containers_walk():
    # wrap atoms two containers deep; the walker must recurse
    inner_atom = (struct.pack("<HHI", 0, 0x0FA0, 10)
                  + "inner".encode("utf-16-le"))
    mid = struct.pack("<HHI", 0x000F, 0x0FF0, len(inner_atom)) + inner_atom
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(mid)) + mid
    data = build_cfb([("PowerPoint Document", doc)])
    text, _, method, err = extract_ole2(data)
    assert (text, method, err) == ("inner", "ppt", "")


# ---------------------------------------------------------------------------
# sniff -> route -> extract integration
# ---------------------------------------------------------------------------

def test_sniff_routes_ole2():
    assert sniff_payload(build_doc(["x"]))[:4] == "ole2"
    assert sniff_payload(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest") == "ole2"


def test_extract_document_routes_all_three():
    for payload, method, needle in [
        (build_doc(["Routed doc body."]), "doc", "Routed doc body."),
        (build_xls([("S", [["cell", 9]])]), "xls", "| cell | 9 |"),
        (build_ppt(["Routed ppt."]), "ppt", "Routed ppt."),
    ]:
        res = extract_document(payload)
        assert res.method == method and needle in res.extracted_text
        assert res.error == "" and res.quality_score == 1.0


def test_extract_document_ole2_fallback_to_text():
    data = build_cfb([("Mystery", b"\x00" * 200)])
    res = extract_document(data, text_fallback="plain fallback text")
    assert res.method == "fallback_text"
    assert "plain fallback text" in res.extracted_text
    res2 = extract_document(data)
    assert res2.method == "error" and res2.error == "ole2_unsupported"


def test_xls_formula_cached_results():
    # FORMULA records carry the cached result: numeric f64, bool, or a
    # string delivered by the following STRING record (MS-XLS 2.4.127)
    from full_text_extractor_v6_ray.extractor.ole2 import (
        _XLS_BOF, _XLS_BOUNDSHEET, _XLS_EOF, _XLS_FORMULA, _XLS_SST,
        _XLS_STRING, _biff)

    def formula(row, col, value_bytes, extra=b""):
        # row, col, ixfe, 8-byte FormulaValue, grbit+chn+cce stub
        return _biff(_XLS_FORMULA, struct.pack("<HHH", row, col, 0)
                     + value_bytes + struct.pack("<HIH", 0, 0, 0) + extra)

    num = formula(0, 0, struct.pack("<d", 12.5))
    sval = formula(0, 1, struct.pack("<BBIH", 0, 0, 0, 0xFFFF))
    srec = _biff(_XLS_STRING, struct.pack("<HB", 5, 0x01)
                 + "hello".encode("utf-16-le"))
    # FormulaValue is exactly 8 bytes: tag=1 (bool), pad, value=1, pad,
    # u16 pad, fExprO=0xFFFF at bytes 6-7
    bval = formula(1, 0, struct.pack("<BBBBHH", 1, 0, 1, 0, 0, 0xFFFF))
    bof_s = _biff(_XLS_BOF, struct.pack("<HHHHII", 0x0600, 0x0010,
                                        0, 0, 0, 0))
    sheet = bof_s + num + sval + srec + bval + _biff(_XLS_EOF, b"")

    bof_g = _biff(_XLS_BOF, struct.pack("<HHHHII", 0x0600, 0x0005,
                                        0, 0, 0, 0))
    sst = _biff(_XLS_SST, struct.pack("<II", 0, 0))
    name = "F"
    probe = (bof_g
             + _biff(_XLS_BOUNDSHEET,
                     struct.pack("<IHBB", 0, 0, len(name), 0x01)
                     + name.encode("utf-16-le"))
             + sst + _biff(_XLS_EOF, b""))
    globals_blob = (bof_g
                    + _biff(_XLS_BOUNDSHEET,
                            struct.pack("<IHBB", len(probe), 0,
                                        len(name), 0x01)
                            + name.encode("utf-16-le"))
                    + sst + _biff(_XLS_EOF, b""))
    data = build_cfb([("Workbook", globals_blob + sheet)])
    text, _, method, err = extract_ole2(data)
    assert err == ""
    assert text.split("\n\n") == ["## F", "| 12.5 | hello |", "| TRUE |"]


def test_summary_properties_roundtrip():
    import datetime

    from full_text_extractor_v6_ray.extractor.ole2 import (
        ole2_summary_properties,
    )

    d = build_doc(["body text"], summary={
        "title": "Q Report", "subject": "numbers", "author": "A. Writer",
        "keywords": "q,report", "comments": "draft",
        "last_modified_by": "B. Editor", "revision": 7,
        "created": datetime.datetime(2023, 5, 1, 12, 30, 0),
        "modified": datetime.datetime(2023, 6, 2, 8, 0, 0)})
    props = ole2_summary_properties(d)
    assert props["title"] == "Q Report"
    assert props["author"] == "A. Writer"
    assert props["last_modified_by"] == "B. Editor"
    assert props["revision"] == "7"
    assert props["created"] == "2023-05-01T12:30:00Z"
    assert props["modified"] == "2023-06-02T08:00:00Z"
    # the body stream is untouched by the property stream
    text, _, method, err = extract_ole2(d)
    assert method == "doc" and "body text" in text


def test_summary_properties_absent_or_garbage():
    from full_text_extractor_v6_ray.extractor.ole2 import (
        ole2_summary_properties,
    )

    assert all(v == "" for v in
               ole2_summary_properties(build_doc(["x"])).values())
    assert all(v == "" for v in
               ole2_summary_properties(b"not ole2").values())
    # wrong byte-order marker -> ignored cleanly
    bad = build_cfb([("\x05SummaryInformation", b"\x00" * 64)])
    assert all(v == "" for v in ole2_summary_properties(bad).values())


def test_ooxml_core_properties():
    import io
    import zipfile

    from full_text_extractor_v6_ray.extractor.ooxml import (
        ooxml_core_properties,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document/>")
        zf.writestr("docProps/core.xml",
                    "<cp:coreProperties>"
                    "<dc:title>T &amp; Co</dc:title>"
                    "<dc:creator>Ann</dc:creator>"
                    "<cp:lastModifiedBy>Bob</cp:lastModifiedBy>"
                    "<cp:revision>3</cp:revision>"
                    '<dcterms:created xsi:type="dcterms:W3CDTF">'
                    "2024-01-05T10:00:00Z</dcterms:created>"
                    "</cp:coreProperties>")
        zf.writestr("docProps/app.xml",
                    "<Properties><Application>MSO</Application>"
                    "<Slides>12</Slides><Words>120</Words></Properties>")
    props = ooxml_core_properties(buf.getvalue())
    assert props["title"] == "T & Co" and props["author"] == "Ann"
    assert props["last_modified_by"] == "Bob"
    assert props["revision"] == "3"
    assert props["created"] == "2024-01-05T10:00:00Z"
    assert props["application"] == "MSO"
    assert props["n_slides"] == "12" and props["n_words"] == "120"
    # zips without docProps degrade to empty strings
    assert all(v == "" for v in ooxml_core_properties(b"PK").values())


def test_ppt_slide_segmentation():
    from full_text_extractor_v6_ray.extractor.ole2 import build_ppt

    p = build_ppt(slides=[["Title A", "Body A1"], ["Title B"], []])
    text, _, method, err = extract_ole2(p)
    assert (method, err) == ("ppt", "")
    assert text == ("## Slide 1\n\nTitle A\n\nBody A1"
                    "\n\n## Slide 2\n\nTitle B")
    # flat decks (no SlidePersistAtom) keep the headerless shape
    assert extract_ole2(build_ppt(["X", "Y"]))[0] == "X\n\nY"


def test_document_summary_information():
    from full_text_extractor_v6_ray.extractor.ole2 import (
        _DOCSUMMARY_STREAM,
        _FMTID_DOCSUMMARY,
        _PIDDSI,
        build_summary_stream,
        ole2_doc_summary_properties,
    )

    dsi = build_summary_stream(
        {"company": "ACME Corp", "n_slides": 12, "category": "deck",
         "manager": "M. Boss"},
        pid_map=_PIDDSI, fmtid=_FMTID_DOCSUMMARY)
    data = build_cfb([("PowerPoint Document", b"\x00" * 8),
                      (_DOCSUMMARY_STREAM, dsi)])
    assert ole2_doc_summary_properties(data) == {
        "category": "deck", "n_slides": "12", "manager": "M. Boss",
        "company": "ACME Corp"}
    # absent stream / garbage -> empty fields, never raises
    assert all(v == "" for v in
               ole2_doc_summary_properties(build_doc(["x"])).values())
    assert all(v == "" for v in
               ole2_doc_summary_properties(b"junk").values())
