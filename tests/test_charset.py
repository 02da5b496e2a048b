"""Charset sniffing/decoding tests (extractor/charset.py) + the
end-to-end legacy-encoding extraction path."""

from __future__ import annotations

import pytest

from full_text_extractor_v6_ray.extractor.charset import (
    decode_html_payload,
    sniff_declared_charset,
)
from full_text_extractor_v6_ray.extractor.document import extract_document
from full_text_extractor_v6_ray.extractor.sniff import sniff_payload


def _page(body: str, charset_meta: str | None = None) -> str:
    meta = (f'<meta charset="{charset_meta}">' if charset_meta else "")
    return (f"<!doctype html><html><head>{meta}<title>T</title></head>"
            f"<body><p>{body}</p></body></html>")


def test_utf8_plain():
    text, enc = decode_html_payload(_page("héllo wörld").encode("utf-8"))
    assert enc == "utf-8" and "héllo wörld" in text


def test_utf8_bom():
    raw = b"\xef\xbb\xbf" + _page("data").encode("utf-8")
    text, enc = decode_html_payload(raw)
    assert enc == "utf-8" and not text.startswith("﻿")


def test_utf16_le_bom_roundtrip():
    raw = _page("пример").encode("utf-16")  # includes the LE BOM
    text, enc = decode_html_payload(raw)
    assert enc == "utf-16-le" and "пример" in text
    assert sniff_payload(raw) == "html"


def test_cp1251_with_meta():
    body = "Привет мир"
    raw = _page(body, "windows-1251").encode("cp1251")
    text, enc = decode_html_payload(raw)
    assert enc == "cp1251" and body in text


def test_shift_jis_with_meta():
    body = "日本語のテスト"
    raw = _page(body, "Shift_JIS").encode("shift_jis")
    text, enc = decode_html_payload(raw)
    assert body in text


def test_gb2312_label_maps_to_gb18030():
    body = "中文测试"
    raw = _page(body, "gb2312").encode("gb18030")
    text, enc = decode_html_payload(raw)
    assert enc == "gb18030" and body in text


def test_valid_utf8_beats_wrong_declaration():
    # UTF-8 bytes wrongly declared as iso-8859-1: strict-UTF-8 rung wins
    raw = _page("naïve café", "iso-8859-1").encode("utf-8")
    text, enc = decode_html_payload(raw)
    assert enc == "utf-8" and "naïve café" in text


def test_undeclared_legacy_falls_back_to_cp1252():
    raw = _page("caf\xe9 cr\xe8me").encode("cp1252")
    text, enc = decode_html_payload(raw)
    assert enc == "cp1252" and "café crème" in text


def test_unknown_label_falls_back():
    raw = _page("d\xe9j\xe0", "x-no-such-charset").encode("cp1252")
    text, enc = decode_html_payload(raw)
    assert enc == "cp1252" and "déjà" in text


def test_declared_charset_prescan_window():
    assert sniff_declared_charset(
        b"<html><head><meta http-equiv='Content-Type' "
        b"content='text/html; charset=KOI8-R'></head>") == "koi8-r"
    # declaration outside the 1 KiB prescan window is ignored
    raw = b"<html>" + b" " * 1200 + b"<meta charset='koi8-r'>"
    assert sniff_declared_charset(raw) is None


def test_extract_document_legacy_page_end_to_end():
    body = "Съешь ещё этих мягких французских булок"
    raw = _page(body, "windows-1251").encode("cp1251")
    res = extract_document(raw, None)
    assert res.method == "html"
    assert body in res.extracted_text


def test_extract_document_utf8_unchanged():
    # ASCII/UTF-8 pages take the identical rung as before the charset
    # ladder landed (golden byte-identity depends on this)
    raw = _page("plain ascii body").encode("utf-8")
    res = extract_document(raw, None)
    assert res.method == "html" and "plain ascii body" in res.extracted_text
