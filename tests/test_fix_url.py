"""fix_url unit tests — mirrors the reference's healthiest suite
(/root/reference/tests/test_hyperlink_extractor.py:13-44)."""

from full_text_extractor_v6_ray.extractor import fix_url


def test_email_gets_mailto():
    assert fix_url("someone@example.com") == "mailto:someone@example.com"
    assert fix_url("a.b+c@sub.domain.org") == "mailto:a.b+c@sub.domain.org"


def test_www_gets_https():
    assert fix_url("www.example.com") == "https://www.example.com"
    assert fix_url("WWW.Example.com/path") == "https://WWW.Example.com/path"


def test_bare_tld_host_gets_https():
    assert fix_url("example.com/path") == "https://example.com/path"
    assert fix_url("sub.site.org") == "https://sub.site.org"


def test_schemed_passthrough():
    for u in ("https://x.com", "http://x.com", "mailto:a@b.com",
              "tel:+15550100", "ftp://files.net"):
        assert fix_url(u) == u


def test_fragment_passthrough():
    assert fix_url("#section-2") == "#section-2"


def test_empty_and_none():
    assert fix_url("") == ""
    assert fix_url(None) == ""
    assert fix_url("   ") == ""


def test_relative_path_unchanged():
    assert fix_url("/about") == "/about"
    assert fix_url("page.html") == "page.html"
