"""Round-3 PDF breadth (reference hyperlink_extractor.py:201-307 parity
targets): xref streams + classic tables, LZW/ASCIIHex/ASCII85 filters,
PNG predictors, CID/ToUnicode hex-string text, GoTo links and rect-text
anchors, and endobj-bytes-inside-stream robustness."""

import zlib

from full_text_extractor_v6_ray.extractor.pdf import (
    _lzw_decode,
    _png_predictor,
    _xref_object_offsets,
    extract_pdf,
)


def _obj(num: int, body: bytes) -> bytes:
    return f"{num} 0 obj ".encode() + body + b" endobj\n"


def _basic_objects(content: bytes, extra: dict[int, bytes] | None = None,
                   content_header: bytes = b"") -> dict[int, bytes]:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (b"<< " + content_header + b"/Length "
            + str(len(content)).encode() + b" >> stream\n" + content
            + b"\nendstream"),
    }
    if extra:
        objs.update(extra)
    return objs


def _assemble(objs: dict[int, bytes], xref: str | None = None,
              inject_before: dict[int, bytes] | None = None) -> bytes:
    """Concatenate objects, recording offsets; optionally append a
    cross-reference (classic ``table`` or 1.5 ``stream``, predictor 12)."""
    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        if inject_before and num in inject_before:
            out += inject_before[num]
        offsets[num] = len(out)
        out += _obj(num, objs[num])
    if xref is None:
        out += b"trailer << /Root 1 0 R >>\n%%EOF\n"
        return bytes(out)
    if xref == "table":
        start = len(out)
        maxn = max(offsets)
        out += b"xref\n0 " + str(maxn + 1).encode() + b"\n"
        out += b"0000000000 65535 f \n"
        for n in range(1, maxn + 1):
            out += b"%010d 00000 n \n" % offsets.get(n, 0)
        out += (b"trailer << /Size " + str(maxn + 1).encode()
                + b" /Root 1 0 R >>\nstartxref\n" + str(start).encode()
                + b"\n%%EOF\n")
        return bytes(out)
    # xref STREAM: W [1 4 2], rows for objects 0..max, predictor 12 (Up)
    xnum = max(offsets) + 1
    xoff = len(out)
    rows = []
    rows.append(b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big"))
    for n in range(1, xnum):
        rows.append(b"\x01" + offsets.get(n, 0).to_bytes(4, "big")
                    + (0).to_bytes(2, "big"))
    rows.append(b"\x01" + xoff.to_bytes(4, "big") + (0).to_bytes(2, "big"))
    # forward-apply the PNG Up predictor, then flate
    rowlen = 7
    enc = bytearray()
    prev = bytes(rowlen)
    for r in rows:
        enc += b"\x02" + bytes((r[j] - prev[j]) & 0xFF for j in range(rowlen))
        prev = r
    data = zlib.compress(bytes(enc), 6)
    out += _obj(xnum, b"<< /Type /XRef /Size " + str(xnum + 1).encode()
                + b" /W [1 4 2] /Root 1 0 R /Filter /FlateDecode"
                + b" /DecodeParms << /Predictor 12 /Columns 7 >> /Length "
                + str(len(data)).encode() + b" >> stream\n" + data
                + b"\nendstream")
    out += b"startxref\n" + str(xoff).encode() + b"\n%%EOF\n"
    return bytes(out)


def test_xref_stream_rescues_object_the_scan_missed():
    content = b"BT /F1 12 Tf 72 700 Td (Rescued by xref) Tj ET"
    objs = _basic_objects(content)
    # a truncated header (no endobj) right before object 4 makes the
    # forward scan swallow object 4's header into the bogus object
    broken = {4: b"90 0 obj << /Broken true >>\n"}
    without_xref = _assemble(objs, xref=None, inject_before=broken)
    text, links, err = extract_pdf(without_xref)
    assert "Rescued by xref" not in text  # the scan alone really does miss it
    with_xref = _assemble(objs, xref="stream", inject_before=broken)
    offs = _xref_object_offsets(with_xref)
    assert 4 in offs and with_xref[offs[4]:offs[4] + 7] == b"4 0 obj"
    text, links, err = extract_pdf(with_xref)
    assert err == ""
    assert "Rescued by xref" in text


def test_classic_xref_table_offsets():
    content = b"BT (Classic table) Tj ET"
    payload = _assemble(_basic_objects(content), xref="table")
    offs = _xref_object_offsets(payload)
    assert offs and payload[offs[1]:offs[1] + 7] == b"1 0 obj"
    assert payload[offs[4]:offs[4] + 7] == b"4 0 obj"
    text, _, err = extract_pdf(payload)
    assert err == "" and "Classic table" in text


def _pack_codes(codes: list[int]) -> bytes:
    """Bit-pack LZW codes with the decoder's width schedule (replayed)."""
    width, table_len, prev_seen = 9, 258, False
    bitbuf, nbits, out = 0, 0, bytearray()
    for code in codes:
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if code == 256:
            table_len, width, prev_seen = 258, 9, False
            continue
        if code == 257:
            break
        if prev_seen:
            table_len += 1
        prev_seen = True
        if table_len + 1 >= (1 << width) and width < 12:
            width += 1
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    codes = [256]
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            codes.append(table[w])
            table[wc] = next_code
            next_code += 1
            w = bytes([ch])
    if w:
        codes.append(table[w])
    codes.append(257)
    return _pack_codes(codes)


def test_lzw_roundtrip_and_content_stream():
    for msg in (b"TOBEORNOTTOBEORTOBEORNOT", b"aaaaaaaaaaaaaaaaaaaa",
                bytes(range(200)) * 3):
        assert _lzw_decode(_lzw_encode(msg)) == msg
    content = b"BT 72 700 Td (LZW decoded text) Tj ET"
    payload = _assemble(_basic_objects(
        _lzw_encode(content), content_header=b"/Filter /LZWDecode "))
    text, _, err = extract_pdf(payload)
    assert err == "" and "LZW decoded text" in text


def test_asciihex_and_ascii85_filters():
    content = b"BT (Hex filter text) Tj ET"
    hexed = content.hex().encode() + b">"
    p1 = _assemble(_basic_objects(
        hexed, content_header=b"/Filter /ASCIIHexDecode "))
    assert "Hex filter text" in extract_pdf(p1)[0]

    import base64
    content2 = b"BT (A85 chained text) Tj ET"
    chained = base64.a85encode(zlib.compress(content2)) + b"~>"
    p2 = _assemble(_basic_objects(
        chained,
        content_header=b"/Filter [/ASCII85Decode /FlateDecode] "))
    assert "A85 chained text" in extract_pdf(p2)[0]


def test_png_predictor_sub_up_paeth():
    rows = [bytes([10, 20, 30, 40]), bytes([12, 22, 33, 44]),
            bytes([5, 5, 5, 5])]
    # forward-encode with Up, decode back
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc += b"\x02" + bytes((r[j] - prev[j]) & 0xFF for j in range(4))
        prev = r
    assert _png_predictor(bytes(enc), columns=4) == b"".join(rows)
    # Sub
    enc2 = bytearray()
    for r in rows:
        row = bytearray(r)
        out = bytes([row[0]]) + bytes((row[j] - row[j - 1]) & 0xFF
                                      for j in range(1, 4))
        enc2 += b"\x01" + out
    assert _png_predictor(bytes(enc2), columns=4) == b"".join(rows)


def test_endobj_bytes_inside_stream_do_not_truncate():
    content = b"BT (sneaky endobj inside a literal) Tj (more text) Tj ET"
    payload = _assemble(_basic_objects(content))
    text, _, err = extract_pdf(payload)
    assert err == ""
    assert "sneaky endobj inside a literal" in text and "more text" in text


def test_cid_tounicode_hex_strings():
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"beginbfchar\n<0048> <0048>\n<0065> <0065>\nendbfchar\n"
            b"beginbfrange\n<006C> <006F> <006C>\nendbfrange\nend")
    content = (b"BT /F1 12 Tf 72 700 Td "
               b"<00480065006C006C006F> Tj ET")
    objs = _basic_objects(content, extra={
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake"
            b" /ToUnicode 6 0 R >>"),
        6: (b"<< /Length " + str(len(cmap)).encode() + b" >> stream\n"
            + cmap + b"\nendstream"),
    })
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
               b" /Resources << /Font << /F1 5 0 R >> >> >>")
    text, _, err = extract_pdf(_assemble(objs))
    assert err == ""
    assert "Hello" in text


def test_goto_link_with_rect_anchor_and_uri_anchor():
    c1 = (b"BT /F1 12 Tf 100 700 Td (See chapter two) Tj "
          b"0 -300 Td (unrelated far text) Tj ET")
    c2 = b"BT (Chapter two body) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Annots [7 0 R 8 0 R] >>"),
        4: (b"<< /Length " + str(len(c1)).encode() + b" >> stream\n" + c1
            + b"\nendstream"),
        5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        6: (b"<< /Length " + str(len(c2)).encode() + b" >> stream\n" + c2
            + b"\nendstream"),
        7: (b"<< /Type /Annot /Subtype /Link /Rect [95 690 220 710]"
            b" /A << /S /GoTo /D [5 0 R /XYZ null null null] >> >>"),
        8: (b"<< /Type /Annot /Subtype /Link /Rect [95 390 220 410]"
            b" /A << /S /URI /URI (https://example.test/far) >> >>"),
    }
    text, links, err = extract_pdf(_assemble(objs))
    assert err == ""
    by_url = dict((u, t) for t, u in links)
    # GoTo -> #page=N with the rect-anchored words (reference :249-271)
    assert by_url.get("#page=2") == "See chapter two"
    # URI rect sits at y~400 where "unrelated far text" landed via Td
    assert by_url.get("https://example.test/far") == "unrelated far text"


def test_goto_without_nearby_text_uses_placeholder():
    c1 = b"BT 100 700 Td (top text only) Tj ET"
    c2 = b"BT (second) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Annots [7 0 R] >>"),
        4: (b"<< /Length " + str(len(c1)).encode() + b" >> stream\n" + c1
            + b"\nendstream"),
        5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        6: (b"<< /Length " + str(len(c2)).encode() + b" >> stream\n" + c2
            + b"\nendstream"),
        7: (b"<< /Type /Annot /Subtype /Link /Rect [10 10 60 30]"
            b" /Dest [5 0 R /Fit] >>"),
    }
    text, links, err = extract_pdf(_assemble(objs))
    assert err == ""
    assert ("Go to page 2", "#page=2") in links


def test_named_dest_via_name_tree():
    """/A /GoTo /D (string-name) resolves through the catalog's
    /Names -> /Dests name tree (root /Kids -> leaf /Names pairs), with
    both inline-array and indirect destinations."""
    c1 = b"BT 100 700 Td (see appendix) Tj ET"
    c2 = b"BT (appendix body) Tj ET"
    c3 = b"BT (notes body) Tj ET"
    objs = {
        1: (b"<< /Type /Catalog /Pages 2 0 R"
            b" /Names << /Dests 10 0 R >> >>"),
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R 6 0 R] /Count 3 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Annots [8 0 R 9 0 R] >>"),
        4: (b"<< /Length " + str(len(c1)).encode() + b" >> stream\n" + c1
            + b"\nendstream"),
        5: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        6: b"<< /Type /Page /Parent 2 0 R /Contents 14 0 R >>",
        7: (b"<< /Length " + str(len(c2)).encode() + b" >> stream\n" + c2
            + b"\nendstream"),
        8: (b"<< /Type /Annot /Subtype /Link /Rect [95 690 220 710]"
            b" /A << /S /GoTo /D (appendix) >> >>"),
        9: (b"<< /Type /Annot /Subtype /Link /Rect [10 10 40 20]"
            b" /Dest (notes) >>"),
        10: b"<< /Kids [11 0 R] >>",                       # tree root
        11: (b"<< /Limits [(appendix) (notes)]"            # leaf node
             b" /Names [(appendix) [5 0 R /Fit] (notes) 12 0 R] >>"),
        12: b"[6 0 R /XYZ null null null]",                # indirect dest
        14: (b"<< /Length " + str(len(c3)).encode() + b" >> stream\n" + c3
             + b"\nendstream"),
    }
    text, links, err = extract_pdf(_assemble(objs))
    assert err == ""
    by_url = dict((u, t) for t, u in links)
    assert by_url.get("#page=2") == "see appendix"   # rect-anchored
    assert by_url.get("#page=3") == "Go to page 3"   # placeholder


def test_named_dest_old_style_dict_and_hash_escape():
    """Old-style PDF 1.1 catalog /Dests dictionary; the annot names the
    dest as a name OBJECT with a #20 hex escape."""
    c1 = b"BT (jump here) Tj ET"
    c2 = b"BT (target two) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R /Dests 8 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Annots [7 0 R] >>"),
        4: (b"<< /Length " + str(len(c1)).encode() + b" >> stream\n" + c1
            + b"\nendstream"),
        5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        6: (b"<< /Length " + str(len(c2)).encode() + b" >> stream\n" + c2
            + b"\nendstream"),
        7: (b"<< /Type /Annot /Subtype /Link /Rect [10 10 40 20]"
            b" /A << /S /GoTo /D /sec#20two >> >>"),
        8: b"<< /sec#20two [5 0 R /Fit] >>",
    }
    text, links, err = extract_pdf(_assemble(objs))
    assert err == ""
    # c1 has no Td -> its text sits at the (0,0) origin, inside the
    # expanded /Rect, so the anchor is the rect text
    assert ("jump here", "#page=2") in links


def test_named_dest_unknown_name_emits_nothing():
    c1 = b"BT (solo) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Annots [5 0 R] >>"),
        4: (b"<< /Length " + str(len(c1)).encode() + b" >> stream\n" + c1
            + b"\nendstream"),
        5: (b"<< /Type /Annot /Subtype /Link /Rect [10 10 40 20]"
            b" /Dest (missing) >>"),
    }
    text, links, err = extract_pdf(_assemble(objs))
    assert err == "" and links == [] and "solo" in text


def _xref_stream_obj(xnum: int, rows: list[bytes], root: bytes = b"",
                     index: bytes = b"") -> bytes:
    """Bare /Type /XRef object (W [1 4 2], no predictor) for hybrids."""
    data = zlib.compress(b"".join(rows), 6)
    return _obj(xnum, b"<< /Type /XRef /Size " + str(xnum + 1).encode()
                + b" /W [1 4 2] " + index + root
                + b" /Filter /FlateDecode /Length "
                + str(len(data)).encode() + b" >> stream\n" + data
                + b"\nendstream")


def _row(kind: int, a: int, b: int) -> bytes:
    return bytes([kind]) + a.to_bytes(4, "big") + b.to_bytes(2, "big")


def test_hybrid_xrefstm_rescues_scan_missed_object():
    """PDF 1.5 hybrid-reference file: classic table for objects 1-3,
    trailer /XRefStm pointing at a companion stream that alone knows
    object 4 (which the forward scan misses via a broken header)."""
    content = b"BT (Hybrid rescued) Tj ET"
    objs = _basic_objects(content)
    broken = {4: b"90 0 obj << /Broken true >>\n"}

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num in sorted(objs):
        if num in broken:
            out += broken[num]
        offsets[num] = len(out)
        out += _obj(num, objs[num])
    # companion xref stream carrying ONLY object 4
    xnum = 5
    stm_off = len(out)
    out += _xref_stream_obj(
        xnum, [_row(1, offsets[4], 0)], index=b"/Index [4 1] ")
    # classic table covering 0-3 (object 4 absent on purpose)
    tbl_off = len(out)
    out += b"xref\n0 4\n0000000000 65535 f \n"
    for n in (1, 2, 3):
        out += b"%010d 00000 n \n" % offsets[n]
    out += (b"trailer << /Size 6 /Root 1 0 R /XRefStm "
            + str(stm_off).encode() + b" >>\nstartxref\n"
            + str(tbl_off).encode() + b"\n%%EOF\n")
    payload = bytes(out)

    offs = _xref_object_offsets(payload)
    assert offs.get(4) == offsets[4]
    assert payload[offs[1]:offs[1] + 7] == b"1 0 obj"
    text, _, err = extract_pdf(payload)
    assert err == "" and "Hybrid rescued" in text


def test_free_entry_shadows_stale_offset():
    """An object freed in the NEWEST section must not resurrect from an
    older table's stale ``n`` entry."""
    content = b"BT (Shadow) Tj ET"
    objs = _basic_objects(content)
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += _obj(num, objs[num])
    # OLD table: all four objects live
    old_off = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for n in (1, 2, 3, 4):
        out += b"%010d 00000 n \n" % offsets[n]
    out += b"trailer << /Size 5 /Root 1 0 R >>\n"
    # NEW table: object 4 freed, /Prev to the old table
    new_off = len(out)
    out += (b"xref\n4 1\n0000000000 00001 f \n"
            b"trailer << /Size 5 /Root 1 0 R /Prev "
            + str(old_off).encode() + b" >>\nstartxref\n"
            + str(new_off).encode() + b"\n%%EOF\n")
    offs = _xref_object_offsets(bytes(out))
    assert 4 not in offs
    assert offs.get(1) == offsets[1] and offs.get(3) == offsets[3]
