"""Incremental recrawl extraction (pipelines/incremental.py): only
new+changed pages re-extract; tombstones retire gone urls; the
reconstructed corpus matches a full re-extraction."""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pytest

from full_text_extractor_v6_ray.pipelines.incremental import (
    incremental_extraction_round,
    read_current_corpus,
)

_TS = datetime.datetime(2024, 1, 1)


def _html(body: str) -> bytes:
    return (f"<html><head><title>T</title></head><body><p>{body}</p>"
            f"</body></html>").encode()


def _pages(rows: dict[str, str]):
    import ray.data

    urls = sorted(rows)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([_TS] * len(urls), pa.timestamp("us")),
        "html": pa.array([_html(rows[u]) for u in urls], pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array(["en"] * len(urls), pa.string()),
    }))


@pytest.fixture()
def state_dir(tmp_path):
    d = str(tmp_path / "incr")
    shutil.rmtree(d, ignore_errors=True)
    return d


def test_incremental_rounds(ray_session, state_dir):
    v1 = {f"https://h{i}.ex/p{i}": f"body {i} v1" for i in range(6)}
    s = incremental_extraction_round(_pages(v1), state_dir)
    assert s["round"] == 0
    assert s["n_new"] == 6 and s["extracted_rows"] == 6
    assert s["n_changed"] == s["n_gone"] == s["n_unchanged"] == 0

    # round 2: p1 changed, p2 gone, p9 new, rest unchanged
    v2 = dict(v1)
    v2["https://h1.ex/p1"] = "body 1 v2"
    del v2["https://h2.ex/p2"]
    v2["https://h9.ex/p9"] = "body 9 v1"
    s2 = incremental_extraction_round(_pages(v2), state_dir)
    assert s2["round"] == 1
    assert s2["n_new"] == 1 and s2["n_changed"] == 1
    assert s2["n_gone"] == 1 and s2["n_unchanged"] == 4
    assert s2["extracted_rows"] == 2

    # the round-1 delta parquet holds ONLY the re-extracted rows
    import ray.data

    delta1 = ray.data.read_parquet(
        os.path.join(state_dir, "delta", "round-1"))
    urls1 = sorted(r["url"] for r in delta1.take_all())
    assert urls1 == ["https://h1.ex/p1", "https://h9.ex/p9"]

    # reconstructed corpus == extracting v2 from scratch
    corpus = {r["url"]: r["extracted_text"]
              for r in read_current_corpus(state_dir).take_all()}
    assert set(corpus) == set(v2)
    assert "body 1 v2" in corpus["https://h1.ex/p1"]
    assert "body 0 v1" in corpus["https://h0.ex/p0"]
    assert "https://h2.ex/p2" not in corpus

    # round 3 with identical input: a no-op delta
    s3 = incremental_extraction_round(_pages(v2), state_dir)
    assert s3["round"] == 2
    assert s3["extracted_rows"] == 0 and s3["n_gone"] == 0
    assert s3["n_unchanged"] == 6
    corpus3 = {r["url"] for r in read_current_corpus(state_dir).take_all()}
    assert corpus3 == set(v2)


def test_incremental_resurrected_url(ray_session, state_dir):
    # a url that dies in round 1 and returns in round 2 must be live
    # again (delta round > tombstone round)
    a = {"https://h.ex/a": "alpha v1", "https://h.ex/b": "beta"}
    incremental_extraction_round(_pages(a), state_dir)
    incremental_extraction_round(_pages({"https://h.ex/b": "beta"}),
                                 state_dir)
    s3 = incremental_extraction_round(
        _pages({"https://h.ex/a": "alpha v2",
                "https://h.ex/b": "beta"}), state_dir)
    assert s3["n_new"] == 1
    corpus = {r["url"]: r["extracted_text"]
              for r in read_current_corpus(state_dir).take_all()}
    assert set(corpus) == {"https://h.ex/a", "https://h.ex/b"}
    assert "alpha v2" in corpus["https://h.ex/a"]


def test_incremental_join_fallback_equivalence(ray_session, tmp_path):
    # broadcast_max=0 forces the bucketed semi-join path; results must
    # match the broadcast path exactly
    import ray.data

    v1 = {f"https://j{i}.ex/p{i}": f"j body {i}" for i in range(8)}
    v2 = dict(v1)
    v2["https://j3.ex/p3"] = "j body 3 CHANGED"
    v2["https://j9.ex/p9"] = "j body 9"

    outs = {}
    for mode, bmax in (("broadcast", 10**9), ("join", 0)):
        d = str(tmp_path / mode)
        incremental_extraction_round(_pages(v1), d, broadcast_max=bmax)
        s = incremental_extraction_round(_pages(v2), d, broadcast_max=bmax)
        assert s["extracted_rows"] == 2
        delta = ray.data.read_parquet(os.path.join(d, "delta", "round-1"))
        outs[mode] = sorted((r["url"], r["extracted_text"])
                            for r in delta.take_all())
    assert outs["broadcast"] == outs["join"]
