import unicodedata

from full_text_extractor_v6_ray.extractor.normalize import (
    normalize_text,
    normalize_ws,
    strip_bullet_prefix,
)


def test_ws_collapse():
    assert normalize_ws("a   b\t\tc\n\nd") == "a b c d"
    assert normalize_ws("  x  ") == "x"
    assert normalize_ws("") == ""


def test_nbsp_collapses():
    assert normalize_text("a\xa0\xa0b") == "a b"


def test_nfc():
    decomposed = "café"  # e + combining acute
    assert normalize_text(decomposed) == "café"
    assert unicodedata.is_normalized("NFC", normalize_text(decomposed))


def test_strip_bullet_prefix():
    assert strip_bullet_prefix("• item") == ("item", True)
    assert strip_bullet_prefix("- dash item") == ("dash item", True)
    assert strip_bullet_prefix("▪▪ double") == ("double", True)
    assert strip_bullet_prefix("normal text") == ("normal text", False)
    # a bare bullet with nothing after it is not a list item
    assert strip_bullet_prefix("-") == ("-", False)
