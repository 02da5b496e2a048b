"""Micro-batch folder tailing: manifest diff, crash recovery, reader."""

from __future__ import annotations

import json
import os
import shutil

from full_text_extractor_v6_ray.sources.stream import (
    MANIFEST, FolderTail, read_stream_output,
)

HTML_A = (b"<!doctype html><html><body><h1>Wave One</h1>"
          b"<p>First landed page with enough real sentence content to "
          b"survive the boilerplate scorer intact and verbatim.</p>"
          b"</body></html>")
HTML_B = (b"<!doctype html><html><body><h1>Wave Two</h1>"
          b"<p>Second wave page, also long enough to be kept as body "
          b"content by the scoring pass without any trouble.</p>"
          b"</body></html>")


def test_tail_ingests_only_new_files(ray_session, tmp_path):
    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()

    (land / "one.html").write_bytes(HTML_A)
    tail = FolderTail(str(land), str(out))
    r1 = tail.poll_once()
    assert r1 == {"round": 0, "n_files": 1, "n_rows": 1}

    # nothing new -> no round, no partition
    r2 = tail.poll_once()
    assert r2["round"] is None

    (land / "two.html").write_bytes(HTML_B)
    r3 = tail.poll_once()
    assert r3 == {"round": 1, "n_files": 1, "n_rows": 1}

    got = read_stream_output(str(out)).to_pandas()
    assert len(got) == 2
    assert {"Wave One", "Wave Two"} <= set(
        t.splitlines()[0].lstrip("# ") for t in got["extracted_text"])


def test_tail_survives_restart_and_modified_file(ray_session, tmp_path):
    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    f = land / "page.html"
    f.write_bytes(HTML_A)

    FolderTail(str(land), str(out)).poll_once()

    # fresh tailer over the same out_dir: manifest makes the file old news
    tail2 = FolderTail(str(land), str(out))
    assert tail2.poll_once()["round"] is None

    # same path, new content (size + mtime change) -> re-ingested
    f.write_bytes(HTML_B + b"<!-- grown -->")
    os.utime(f, ns=(1, 10**18))
    r = tail2.poll_once()
    assert r["n_files"] == 1
    assert len(read_stream_output(str(out)).to_pandas()) == 2


def test_tail_crash_between_write_and_manifest(ray_session, tmp_path):
    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    (land / "one.html").write_bytes(HTML_A)

    tail = FolderTail(str(land), str(out))
    tail.poll_once()

    # simulate a crash AFTER the partition write but BEFORE the manifest
    # append: orphan the partition by truncating the manifest
    manifest = out / MANIFEST
    entry = json.loads(manifest.read_text().strip())
    manifest.write_text("")
    orphan = out / entry["partition"]
    assert orphan.is_dir()

    # restart: the file is re-processed into a fresh round directory
    tail3 = FolderTail(str(land), str(out))
    r = tail3.poll_once()
    assert r["n_files"] == 1 and r["round"] == 0

    # reader sees exactly the manifest-named partition (no double rows
    # even though the orphan directory still exists on disk)
    got = read_stream_output(str(out)).to_pandas()
    assert len(got) == 1


def test_tail_run_loop_bounded(ray_session, tmp_path):
    land = tmp_path / "land"
    out = tmp_path / "out"
    land.mkdir()
    (land / "one.html").write_bytes(HTML_A)
    totals = FolderTail(str(land), str(out)).run(poll_interval=0.0,
                                                 idle_stop=2)
    assert totals["n_files"] == 1 and totals["n_rows"] == 1
    assert totals["polls"] >= 3
