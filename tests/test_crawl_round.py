"""Composed crawl round (pipelines/crawl_round.py): robots parse+apply,
sitemap discovery, politeness schedule, and incremental CDC extraction
wired end-to-end over a WARC snapshot."""

from __future__ import annotations

import datetime
import os

import pytest

from full_text_extractor_v6_ray.pipelines.crawl_round import crawl_round
from full_text_extractor_v6_ray.pipelines.incremental import (
    read_current_corpus,
)
from full_text_extractor_v6_ray.sources.warc import build_warc_segment

_TS = datetime.datetime(2024, 3, 1)


def _html(body: str) -> bytes:
    return (f"<html><head><title>T</title></head><body><p>{body}</p>"
            f"</body></html>").encode()


_SITEMAP = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://h0.ex/s1</loc><priority>0.9</priority></url>"
    "<url><loc>https://h0.ex/s2</loc><priority>0.2</priority></url>"
    "</urlset>").encode()

_ROBOTS_H0 = b"User-agent: *\nDisallow: /priv\nCrawl-delay: 3\n"
_ROBOTS_H2 = b"User-agent: *\nDisallow: /x\n"


def _snapshot(tmp_path, extra_page: bytes | None = None):
    recs = [
        ("https://h0.ex/robots.txt", _TS, _ROBOTS_H0),
        ("https://h0.ex/sitemap.xml", _TS, _SITEMAP),
        ("https://h0.ex/a", _TS, _html("h0 page a")),
        ("https://h0.ex/priv/secret", _TS, _html("h0 hidden")),
        ("https://h0.ex/b", _TS, _html("h0 page b")),
        ("https://h1.ex/c", _TS, _html("h1 page c")),
        ("https://h2.ex/robots.txt", _TS, _ROBOTS_H2),
        ("https://h2.ex/x1", _TS, _html("h2 blocked")),
        ("https://h2.ex/y", _TS, extra_page or _html("h2 page y")),
    ]
    d = str(tmp_path / "warc")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "seg-00000.warc"), "wb") as f:
        f.write(build_warc_segment(recs, payload_digest=True))
    return d


def test_crawl_round_end_to_end(ray_session, tmp_path):
    warc_dir = _snapshot(tmp_path)
    state = str(tmp_path / "state")
    out = crawl_round(warc_dir, state)

    s = out["summary"]
    # allowed content = h0:/a,/b  h1:/c  h2:/y  (robots drop /priv*, /x*)
    assert s["extracted_rows"] == 4 and s["n_new"] == 4

    corpus = {r["url"]: r["extracted_text"]
              for r in read_current_corpus(state).take_all()}
    assert set(corpus) == {"https://h0.ex/a", "https://h0.ex/b",
                           "https://h1.ex/c", "https://h2.ex/y"}
    assert "h0 page a" in corpus["https://h0.ex/a"]

    rows = out["schedule"].take_all()
    by_url = {r["url"]: r for r in rows}
    # frontier = allowed urls + sitemap-discovered (robots-filtered)
    assert set(by_url) == {"https://h0.ex/a", "https://h0.ex/b",
                           "https://h0.ex/s1", "https://h0.ex/s2",
                           "https://h1.ex/c", "https://h2.ex/y"}
    # politeness: h0 has 4 frontier urls -> waves 1..4, s1 (pri .9) first,
    # s2 (pri .2) last; delay from Crawl-delay: 3
    h0 = sorted((r["wave"], r["url"]) for r in rows
                if r["host"] == "h0.ex")
    assert h0[0] == (1, "https://h0.ex/s1")
    assert h0[-1] == (4, "https://h0.ex/s2")
    assert all(r["delay_s"] == 3 for r in rows if r["host"] == "h0.ex")
    assert all(r["fetch_at_s"] == (r["wave"] - 1) * 3
               for r in rows if r["host"] == "h0.ex")
    # h1 has no robots record -> default delay 1
    assert by_url["https://h1.ex/c"]["delay_s"] == 1
    assert by_url["https://h1.ex/c"]["wave"] == 1
    # h2's robots declares no Crawl-delay -> default (parse yields -1,
    # clamped to the default minimum)
    assert by_url["https://h2.ex/y"]["delay_s"] == 1


def test_crawl_round_cdc_second_round_noop(ray_session, tmp_path):
    warc_dir = _snapshot(tmp_path)
    state = str(tmp_path / "state2")
    first = crawl_round(warc_dir, state)
    assert first["summary"]["extracted_rows"] == 4

    second = crawl_round(warc_dir, state)
    assert second["summary"]["round"] == 1
    assert second["summary"]["extracted_rows"] == 0
    assert second["summary"]["n_unchanged"] == 4

    # change ONE page -> exactly one re-extraction
    warc_dir3 = _snapshot(tmp_path / "v3",
                          extra_page=_html("h2 page y CHANGED"))
    third = crawl_round(warc_dir3, state)
    assert third["summary"]["n_changed"] == 1
    assert third["summary"]["extracted_rows"] == 1
    corpus = {r["url"]: r["extracted_text"]
              for r in read_current_corpus(state).take_all()}
    assert "CHANGED" in corpus["https://h2.ex/y"]


def test_crawl_round_no_meta_records(ray_session, tmp_path):
    # a snapshot with zero robots/sitemap records: everything is
    # allowed, default delays, frontier = the content urls
    recs = [(f"https://nm{i}.ex/p{i}", _TS, _html(f"plain {i}"))
            for i in range(4)]
    d = str(tmp_path / "warc")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "seg-00000.warc"), "wb") as f:
        f.write(build_warc_segment(recs, payload_digest=True))

    out = crawl_round(d, str(tmp_path / "state"))
    assert out["summary"]["extracted_rows"] == 4
    assert out["rules"].num_rows == 0
    rows = out["schedule"].take_all()
    assert len(rows) == 4
    assert all(r["delay_s"] == 1 and r["wave"] == 1 for r in rows)
