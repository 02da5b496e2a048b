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
    compact_state,
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


def test_incremental_trusts_warc_payload_digest(ray_session, tmp_path):
    # segments carry WARC-Payload-Digest; the round must diff on the
    # recorded digests (hash_col) without re-hashing payloads
    import ray.data

    from full_text_extractor_v6_ray.sources.warc import (
        build_warc_segment,
        read_warc_dir,
    )

    def write_round(d, bodies):
        os.makedirs(d, exist_ok=True)
        recs = [(u, _TS, b) for u, b in sorted(bodies.items())]
        with open(os.path.join(d, "seg-00000.warc"), "wb") as f:
            f.write(build_warc_segment(recs, payload_digest=True))

    v1 = {f"https://w{i}.ex/p{i}": _html(f"warc body {i}")
          for i in range(5)}
    v2 = dict(v1)
    v2["https://w2.ex/p2"] = _html("warc body 2 CHANGED")
    del v2["https://w4.ex/p4"]

    d1, d2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    write_round(d1, v1)
    write_round(d2, v2)
    state = str(tmp_path / "state")

    s0 = incremental_extraction_round(
        read_warc_dir(d1, include_digest=True), state,
        hash_col="payload_digest")
    assert s0["n_new"] == 5
    s1 = incremental_extraction_round(
        read_warc_dir(d2, include_digest=True), state,
        hash_col="payload_digest")
    assert s1["n_changed"] == 1 and s1["n_gone"] == 1
    assert s1["n_unchanged"] == 3 and s1["extracted_rows"] == 1
    delta = ray.data.read_parquet(os.path.join(state, "delta", "round-1"))
    rows = delta.take_all()
    assert [r["url"] for r in rows] == ["https://w2.ex/p2"]
    assert "CHANGED" in rows[0]["extracted_text"]


def test_digest_null_rows_fall_back_to_md5(ray_session, tmp_path):
    # pages with a null digest hash via md5; a changed digest-less page
    # is still detected
    import ray.data

    def pages_with_digest(rows, digests):
        urls = sorted(rows)
        return ray.data.from_arrow(pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([_TS] * len(urls), pa.timestamp("us")),
            "html": pa.array([_html(rows[u]) for u in urls], pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
            "payload_digest": pa.array([digests.get(u) for u in urls],
                                       pa.string()),
        }))

    state = str(tmp_path / "fb")
    v1 = {"https://f.ex/a": "aaa", "https://f.ex/b": "bbb"}
    dg = {"https://f.ex/a": "sha1:AAA"}  # b has no digest
    incremental_extraction_round(pages_with_digest(v1, dg), state,
                                 hash_col="payload_digest")
    v2 = {"https://f.ex/a": "aaa", "https://f.ex/b": "bbb CHANGED"}
    s = incremental_extraction_round(pages_with_digest(v2, dg), state,
                                     hash_col="payload_digest")
    assert s["n_changed"] == 1 and s["n_unchanged"] == 1

def _corpus_table(state_dir):
    batches = list(read_current_corpus(state_dir)
                   .iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches).combine_chunks().sort_by("url")


def test_compact_state_preserves_corpus(ray_session, state_dir):
    import ray.data

    v1 = {f"https://c{i}.ex/p{i}": f"c body {i} v1" for i in range(6)}
    incremental_extraction_round(_pages(v1), state_dir)
    v2 = dict(v1)
    v2["https://c1.ex/p1"] = "c body 1 v2"
    del v2["https://c2.ex/p2"]
    v2["https://c9.ex/p9"] = "c body 9"
    incremental_extraction_round(_pages(v2), state_dir)

    before = _corpus_table(state_dir)
    s = compact_state(state_dir)
    assert s["folded_rounds"] == [0, 1]
    after = _corpus_table(state_dir)
    # byte-equal reconstruction, round provenance included
    assert after.equals(before)

    # superseded rounds are gone; exactly one base round remains
    deltas = sorted(os.listdir(os.path.join(state_dir, "delta")))
    assert deltas == ["round-2"]
    assert sorted(os.listdir(os.path.join(state_dir, "manifest"))) == \
        ["round-2"]
    tomb_root = os.path.join(state_dir, "tombstones")
    assert not os.path.isdir(tomb_root) or os.listdir(tomb_root) == []

    # idempotent: compacting a compacted state is a fold of one base
    compact_state(state_dir)
    assert _corpus_table(state_dir).equals(before)

    # a subsequent incremental round diffs against the copied manifest
    v3 = dict(v2)
    v3["https://c3.ex/p3"] = "c body 3 v3"
    s3 = incremental_extraction_round(_pages(v3), state_dir)
    assert s3["n_changed"] == 1 and s3["n_new"] == 0
    assert s3["n_unchanged"] == len(v2) - 1
    corpus = {r["url"]: r["extracted_text"]
              for r in read_current_corpus(state_dir).take_all()}
    assert "c body 3 v3" in corpus["https://c3.ex/p3"]
    assert set(corpus) == set(v3)


def test_hash_kind_mismatch_rejected(ray_session, state_dir):
    v1 = {"https://hk.ex/a": "aaa", "https://hk.ex/b": "bbb"}
    incremental_extraction_round(_pages(v1), state_dir)  # md5 mode
    with pytest.raises(ValueError, match="hash mode mismatch"):
        incremental_extraction_round(
            _pages(v1).map_batches(
                lambda b: b.append_column(
                    "payload_digest",
                    pa.array(["sha1:X"] * b.num_rows, pa.string())),
                batch_format="pyarrow"),
            state_dir, hash_col="payload_digest")
    # same mode still fine
    s = incremental_extraction_round(_pages(v1), state_dir)
    assert s["n_unchanged"] == 2


def test_crashed_round_rerun_leaves_no_partial_files(ray_session, state_dir):
    import ray.data

    v1 = {f"https://r{i}.ex/p{i}": f"r body {i}" for i in range(4)}
    incremental_extraction_round(_pages(v1), state_dir)

    # simulate a round-1 attempt that crashed after partially writing
    # delta/tombstone/manifest-tmp dirs
    junk_delta = os.path.join(state_dir, "delta", "round-1")
    os.makedirs(junk_delta, exist_ok=True)
    stray = pa.table({"url": pa.array(["https://stale.ex/x"]),
                      "round": pa.array([1], pa.int64())})
    import pyarrow.parquet as pq
    pq.write_table(stray, os.path.join(junk_delta, "crashed.parquet"))
    os.makedirs(os.path.join(state_dir, "manifest", "round-1.tmp"),
                exist_ok=True)
    pq.write_table(stray, os.path.join(
        state_dir, "manifest", "round-1.tmp", "crashed.parquet"))

    # an uncommitted round is invisible to readers
    urls = {r["url"] for r in read_current_corpus(state_dir).take_all()}
    assert "https://stale.ex/x" not in urls

    v2 = dict(v1)
    v2["https://r0.ex/p0"] = "r body 0 v2"
    s = incremental_extraction_round(_pages(v2), state_dir)
    assert s["round"] == 1 and s["n_changed"] == 1

    delta = ray.data.read_parquet(os.path.join(state_dir, "delta",
                                               "round-1"))
    assert [r["url"] for r in delta.take_all()] == ["https://r0.ex/p0"]
    man = ray.data.read_parquet(os.path.join(state_dir, "manifest",
                                             "round-1"))
    assert man.count() == len(v2)
    assert "https://stale.ex/x" not in {
        r["url"] for r in man.take_all()}


def test_cdx_slim_source_equivalence(ray_session, tmp_path):
    # a CDX capture index (md5 digests of record bodies) can drive the
    # diff directly: rounds via slim= must equal rounds via page scan
    import ray.data

    from full_text_extractor_v6_ray.sources.warc import (
        build_cdx_index,
        build_warc_segment,
        read_warc_dir,
    )

    def write_round(d, bodies):
        os.makedirs(d, exist_ok=True)
        recs = [(u, _TS, b) for u, b in sorted(bodies.items())]
        with open(os.path.join(d, "seg-00000.warc"), "wb") as f:
            f.write(build_warc_segment(recs))

    v1 = {f"https://cx{i}.ex/p{i}": _html(f"cdx body {i}")
          for i in range(6)}
    v2 = dict(v1)
    v2["https://cx2.ex/p2"] = _html("cdx body 2 CHANGED")
    del v2["https://cx5.ex/p5"]

    dirs = {}
    for tag, bodies in (("r0", v1), ("r1", v2)):
        d = str(tmp_path / tag)
        write_round(d, bodies)
        dirs[tag] = d

    def cdx_slim(d):
        return build_cdx_index(d).map_batches(
            lambda b: pa.table({"url": b.column("url"),
                                "hash": b.column("digest")}),
            batch_format="pyarrow")

    out = {}
    for mode in ("scan", "cdx"):
        state = str(tmp_path / f"state_{mode}")
        sums = []
        for tag in ("r0", "r1"):
            pages = read_warc_dir(dirs[tag])
            kw = {"slim": cdx_slim(dirs[tag])} if mode == "cdx" else {}
            sums.append(incremental_extraction_round(pages, state, **kw))
        corpus = sorted(
            (r["url"], r["extracted_text"])
            for r in read_current_corpus(state).take_all())
        out[mode] = (sums, corpus)

    (s_scan, c_scan), (s_cdx, c_cdx) = out["scan"], out["cdx"]
    assert [s["extracted_rows"] for s in s_cdx] == \
        [s["extracted_rows"] for s in s_scan] == [6, 1]
    assert s_cdx[1]["n_changed"] == 1 and s_cdx[1]["n_gone"] == 1
    assert c_cdx == c_scan
    # hash kinds interop: a cdx round after a scan round is fine (both
    # are md5 of the body)
    state = str(tmp_path / "state_scan")
    s = incremental_extraction_round(read_warc_dir(dirs["r1"]), state,
                                     slim=cdx_slim(dirs["r1"]))
    assert s["n_unchanged"] == 5 and s["extracted_rows"] == 0
