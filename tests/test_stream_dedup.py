"""Streaming cross-round URL dedup: sharded index actors + compaction.

Contract under test (state/url_index.py): filter_batch is a
NON-MUTATING probe against committed state; commit_batch/commit_from
apply accepted pairs only after the round's output is durable. A round
that fails after filtering therefore loses nothing on retry.
"""

import os

import pandas as pd
import pyarrow as pa


def _pages(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([pd.Timestamp(r[1]) if r[1] else None
                             for r in rows], pa.timestamp("us")),
    })


def test_index_keep_latest_semantics(ray_session):
    from full_text_extractor_v6_ray.state.url_index import StreamUrlDedup

    idx = StreamUrlDedup(num_shards=3)
    # in-batch dup: only the newest u1 survives locally
    out1 = idx.filter_batch(_pages([
        ("u1", "2024-01-02"), ("u2", "2024-01-01"), ("u1", "2024-01-01")]))
    assert sorted(out1["url"].to_pylist()) == ["u1", "u2"]
    assert pd.Timestamp(out1.sort_by("url")["warc_ts"][0].as_py()) \
        == pd.Timestamp("2024-01-02")
    idx.commit_batch(out1)  # round 1's write succeeded

    # replay same ts -> rejected; strictly newer -> accepted; new url -> accepted
    out2 = idx.filter_batch(_pages([
        ("u1", "2024-01-02"), ("u1", "2024-01-03"), ("u3", "2024-01-01")]))
    got = sorted(zip(out2["url"].to_pylist(),
                     [str(t) for t in out2["warc_ts"].to_pylist()]))
    assert [g[0] for g in got] == ["u1", "u3"]
    assert got[0][1].startswith("2024-01-03")
    idx.commit_batch(out2)

    # older than seen -> rejected
    out3 = idx.filter_batch(_pages([("u1", "2024-01-01")]))
    assert out3.num_rows == 0
    assert sum(idx.sizes()) == 3  # u1, u2, u3


def test_probe_is_non_mutating_retry_safe(ray_session):
    """A round that fails after filtering (no commit) must lose nothing:
    the retry re-admits the exact same rows."""
    from full_text_extractor_v6_ray.state.url_index import StreamUrlDedup

    idx = StreamUrlDedup(num_shards=2)
    batch = _pages([("a", "2024-01-01"), ("b", "2024-02-01")])
    first = idx.filter_batch(batch)
    assert first.num_rows == 2
    assert sum(idx.sizes()) == 0  # probe left no trace
    retry = idx.filter_batch(batch)  # simulated retry of a failed round
    assert retry.num_rows == 2
    idx.commit_batch(retry)
    assert sum(idx.sizes()) == 2
    assert idx.filter_batch(batch).num_rows == 0  # now committed -> rejected


def test_null_url_or_ts_rows_dropped_explicitly(ray_session):
    from full_text_extractor_v6_ray.state.url_index import StreamUrlDedup

    idx = StreamUrlDedup(num_shards=2)
    batch = pa.table({
        "url": pa.array(["ok", None, "no-ts"], pa.string()),
        "warc_ts": pa.array([pd.Timestamp("2024-01-01"),
                             pd.Timestamp("2024-01-02"), None],
                            pa.timestamp("us")),
    })
    out = idx.filter_batch(batch)
    assert out["url"].to_pylist() == ["ok"]
    assert idx.commit_batch(batch) == 1  # same null-drop on commit


def test_compacted_stream_equals_batch_dedup(ray_session):
    """Union of per-round accepted rows, compacted, == one batch
    keep-latest over all raw rounds (the log-compaction contract)."""
    import ray.data
    from full_text_extractor_v6_ray.state.url_index import StreamUrlDedup

    rounds = [
        [("a", "2024-01-01"), ("b", "2024-01-01")],
        [("a", "2024-01-03"), ("c", "2024-01-02"), ("b", "2024-01-01")],
        [("a", "2024-01-02"), ("c", "2024-01-05"), ("d", "2024-01-01")],
    ]
    idx = StreamUrlDedup(num_shards=2)
    accepted = []
    for r in rounds:
        out = idx.filter_batch(_pages(r))
        idx.commit_batch(out)  # each round's write succeeded
        accepted.append(out)
    appended = pa.concat_tables([t for t in accepted if t.num_rows])

    from full_text_extractor_v6_ray.stages.dedup import dedup_latest_by_ts

    compact = (dedup_latest_by_ts(ray.data.from_arrow(appended),
                                  tie_break=None)
               .to_pandas().sort_values("url").reset_index(drop=True))
    allraw = pa.concat_tables([_pages(r) for r in rounds])
    exp = (dedup_latest_by_ts(ray.data.from_arrow(allraw), tie_break=None)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert compact["url"].tolist() == exp["url"].tolist()
    assert compact["warc_ts"].tolist() == exp["warc_ts"].tolist()
    # and the stream never re-accepted a stale version of a seen ts
    assert appended.num_rows == 6  # 2 + 2 (b stale) + 2 (a stale)


def test_snapshot_restore_identical_and_reshard(ray_session, tmp_path):
    """Kill the actors (fresh StreamUrlDedup), restore from snapshot:
    identical committed view — including with a DIFFERENT shard count
    (rehash path)."""
    from full_text_extractor_v6_ray.state.url_index import StreamUrlDedup

    idx = StreamUrlDedup(num_shards=3)
    b1 = _pages([("a", "2024-01-01"), ("b", "2024-02-01"),
                 ("c", "2024-03-01")])
    idx.commit_batch(b1)
    snap = tmp_path / "snap"
    idx.snapshot(str(snap), through_round=7)

    for shards in (3, 5):  # same count (bulk load) and reshard (rehash)
        fresh = StreamUrlDedup(num_shards=shards)
        assert fresh.restore_snapshot(str(snap)) == 7
        assert sum(fresh.sizes()) == 3
        # stale + equal ts rejected, newer accepted — state is identical
        probe = fresh.filter_batch(_pages([
            ("a", "2024-01-01"), ("b", "2024-01-15"), ("c", "2024-03-02")]))
        assert probe["url"].to_pylist() == ["c"]

    # no snapshot -> None (caller falls back to full replay)
    assert StreamUrlDedup(num_shards=2).restore_snapshot(
        str(tmp_path / "nope")) is None


def test_folder_tail_dedup_rounds(ray_session, tmp_path):
    from full_text_extractor_v6_ray.sources.stream import (
        FolderTail,
        read_stream_output_latest,
    )

    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    f1 = land / "p1.html"
    f2 = land / "p2.html"
    f1.write_text("<html><body><p>one</p></body></html>")
    f2.write_text("<html><body><p>two</p></body></html>")
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    os.utime(f2, (1_700_000_000, 1_700_000_000))

    tail = FolderTail(str(land), str(out), dedup_urls=True,
                      num_index_shards=2)
    r1 = tail.poll_once()
    assert r1["n_files"] == 2 and r1["n_rows"] == 2

    # f1 re-lands: content changed but SAME mtime second -> fresh file
    # (size changed) yet the index rejects it (ts not strictly newer)
    f1.write_text("<html><body><p>one-again</p></body></html>")
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    # f2 re-lands genuinely newer
    f2.write_text("<html><body><p>two-v2</p></body></html>")
    os.utime(f2, (1_700_000_100, 1_700_000_100))
    r2 = tail.poll_once()
    assert r2["n_files"] == 2
    assert r2["n_rows"] == 1  # only f2's newer crawl got through

    latest = read_stream_output_latest(str(out)).to_pandas()
    assert len(latest) == 2
    row2 = latest[latest["url"].str.endswith("p2.html")].iloc[0]
    assert "two-v2" in row2["extracted_text"]

    # restarted tailer rebuilds the index from the manifest partitions:
    # a re-landed old crawl is still rejected
    f1.write_text("<html><body><p>one-v3-but-old-ts</p></body></html>")
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    tail2 = FolderTail(str(land), str(out), dedup_urls=True,
                       num_index_shards=2)
    r3 = tail2.poll_once()
    assert r3["n_rows"] == 0


def test_folder_tail_snapshot_restart_skips_replay(ray_session, tmp_path,
                                                   monkeypatch):
    """With snapshot_every=1, a restarted tailer restores the snapshot
    and replays NOTHING (no output read), yet still rejects stale
    re-crawls — mid-stream actor death recovery without full replay."""
    from full_text_extractor_v6_ray.sources import stream as stream_mod

    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    f1 = land / "p1.html"
    f1.write_text("<html><body><p>one</p></body></html>")
    os.utime(f1, (1_700_000_000, 1_700_000_000))

    tail = stream_mod.FolderTail(str(land), str(out), dedup_urls=True,
                                 num_index_shards=2, snapshot_every=1)
    assert tail.poll_once()["n_rows"] == 1
    f1.write_text("<html><body><p>one-v2</p></body></html>")
    os.utime(f1, (1_700_000_050, 1_700_000_050))
    assert tail.poll_once()["n_rows"] == 1
    assert os.path.exists(out / "url_index_snapshot" / "snapshot.json")

    # "kill" the actors: a brand-new tailer process. The snapshot covers
    # every round, so restart must not touch the output partitions.
    real_read = stream_mod.read_stream_output

    def forbid_replay(out_dir, rounds=None):
        if rounds:
            raise AssertionError(
                "restart replayed output despite full snapshot")
        return real_read(out_dir, rounds=rounds)

    monkeypatch.setattr(stream_mod, "read_stream_output", forbid_replay)
    tail2 = stream_mod.FolderTail(str(land), str(out), dedup_urls=True,
                                  num_index_shards=2, snapshot_every=1)
    monkeypatch.setattr(stream_mod, "read_stream_output", real_read)

    # stale re-crawl rejected purely from snapshot state
    f1.write_text("<html><body><p>one-v3-old-ts</p></body></html>")
    os.utime(f1, (1_700_000_050, 1_700_000_050))
    assert tail2.poll_once()["n_rows"] == 0

    # compacted view identical to a full-replay restart
    from full_text_extractor_v6_ray.sources.stream import (
        read_stream_output_latest,
    )
    latest = read_stream_output_latest(str(out)).to_pandas()
    assert len(latest) == 1
    assert "one-v2" in latest.iloc[0]["extracted_text"]
