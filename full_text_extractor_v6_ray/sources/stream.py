"""Micro-batch streaming ingestion: tail a landing folder for new files.

The reference processes one static folder per run
(``/root/reference/src/processors/folder_processor.py:14-99``); a
live-crawl engine ingests a DIRECTORY THAT KEEPS GROWING (WARC dumps
landing from crawlers). This driver composes the existing folder
source (discovery + pages projection), sniffer/container router, and
extraction stage into the standard micro-batch streaming shape:

  poll -> diff against a durable manifest -> build a Dataset over NEW
  files only -> extract -> write one parquet partition per poll round
  -> append the manifest entry.

Exactly-once-per-file contract (crash-safe ordering): the round's
output partition is written BEFORE its manifest entry, and partition
directories are keyed by round id recorded in the manifest — a crash
between the two re-processes that round's files into a fresh round
directory on restart while the orphaned directory is ignored (readers
go through ``read_stream_output``, which only reads partitions the
manifest names). File identity is (path, size, mtime_ns): a file
re-landing with new content is re-ingested, an untouched one never is.

At 100 TB scale the manifest stays driver-side tiny (one row per FILE,
not per record); the bytes stream through ``read_binary_files`` shards
exactly as in the batch path. Each round is an independent bounded
Dataset pipeline, so backpressure and spilling reset round to round.
The ONE piece of cross-round Ray state is the optional url index
(``state/url_index.py``), and it follows a probe/commit protocol so
retries stay safe: filtering only PROBES the committed state, and the
round's accepted (url, ts) pairs are COMMITTED from the durably-written
partition strictly AFTER its manifest entry lands — a round that fails
anywhere before that leaves the index untouched and the retry
re-admits the same rows. (A crash between manifest append and commit
can admit a duplicate append on retry; the compacted view is identical
— see the contract in ``state/url_index.py``.)

Restart recovery is snapshot-aware: every ``snapshot_every`` committed
rounds the index checkpoints per-shard parquet under
``out_dir/url_index_snapshot``; a restarted tailer restores the
snapshot and replays only the manifest rounds AFTER it, not the whole
output history.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from .folder import discover_files, _ToPages

MANIFEST = "stream_manifest.jsonl"


def _file_sig(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size,
            "mtime_ns": st.st_mtime_ns}


def _load_manifest(out_dir: str) -> tuple[list[dict], set[tuple]]:
    """Returns (round entries, set of ingested file signatures)."""
    rounds: list[dict] = []
    seen: set[tuple] = set()
    path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                entry = json.loads(line)
                rounds.append(entry)
                for sig in entry["files"]:
                    seen.add((sig["path"], sig["size"], sig["mtime_ns"]))
    return rounds, seen


class FolderTail:
    """Stateful micro-batch tailer over one landing folder.

    ``poll_once()`` is the unit of progress (and of testing): ingest
    every not-yet-seen file, write ``round=<n>`` parquet under
    ``out_dir``, append one manifest line. ``run()`` loops with a
    sleep until ``max_polls`` or ``idle_stop`` consecutive empty
    polls — bounded by construction so jobs always terminate in tests
    and can run indefinitely in production with both set to 0.
    """

    def __init__(self, folder: str, out_dir: str,
                 extensions: tuple[str, ...] | None = None,
                 recursive: bool = False,
                 dedup_urls: bool = False, num_index_shards: int = 8,
                 snapshot_every: int = 0):
        self.folder = folder
        self.out_dir = out_dir
        self.extensions = extensions
        self.recursive = recursive
        self.snapshot_every = snapshot_every
        os.makedirs(out_dir, exist_ok=True)
        self.rounds, self.seen = _load_manifest(out_dir)
        self.url_index = None
        if dedup_urls:
            # cross-round keep-latest state (state/url_index.py); on a
            # restarted tailer, restore the last snapshot (if any) and
            # replay ONLY the rounds after it so re-landed (url, ts)
            # pairs are rejected, not re-extracted — never a full
            # output-history replay when a snapshot exists
            from ..state.url_index import StreamUrlDedup

            self.url_index = StreamUrlDedup(num_shards=num_index_shards)
            through = self.url_index.restore_snapshot(self._snap_dir())
            tail_rounds = [e for e in self.rounds
                           if through is None or e["round"] > through]
            if tail_rounds:
                self.url_index.commit_from(
                    read_stream_output(out_dir, rounds=tail_rounds))

    def _snap_dir(self) -> str:
        return os.path.join(self.out_dir, "url_index_snapshot")

    def _next_round_id(self) -> int:
        return 1 + max((e["round"] for e in self.rounds), default=-1)

    def poll_once(self) -> dict:
        """One micro-batch: returns {round, n_files, n_rows} (round is
        None when no new files landed)."""
        import ray.data

        from ..pipelines.extract_pipeline import extract_pages

        paths = discover_files(self.folder, extensions=self.extensions,
                               recursive=self.recursive)
        sigs = [_file_sig(p) for p in paths]
        fresh = [s for s in sigs
                 if (s["path"], s["size"], s["mtime_ns"]) not in self.seen]
        if not fresh:
            return {"round": None, "n_files": 0, "n_rows": 0}

        rid = self._next_round_id()
        # unique per ATTEMPT: a crashed round's orphan directory must
        # never be written into (or read) by the retry
        part = f"round={rid}-{uuid.uuid4().hex[:8]}"
        part_dir = os.path.join(self.out_dir, part)
        ds = ray.data.read_binary_files([s["path"] for s in fresh],
                                        include_paths=True)
        pages = ds.map_batches(_ToPages(), batch_format="pyarrow",
                               zero_copy_batch=True)
        if self.url_index is not None:
            # streaming keep-latest: already-seen (url, ts) pairs are
            # dropped BEFORE extraction spends cycles on them
            pages = pages.map_batches(self.url_index.filter_batch,
                                      batch_format="pyarrow")
        extracted = extract_pages(pages)
        os.makedirs(part_dir, exist_ok=True)  # a fully-deduped round
        extracted.write_parquet(part_dir)     # may write zero files

        # count from the written partition (no second pipeline run)
        import pyarrow.parquet as pq
        n_rows = sum(pq.read_metadata(os.path.join(part_dir, f)).num_rows
                     for f in os.listdir(part_dir)
                     if f.endswith(".parquet"))

        entry = {"round": rid, "files": fresh, "n_rows": n_rows,
                 "partition": part}
        # output first, manifest second (see module docstring)
        with open(os.path.join(self.out_dir, MANIFEST), "a") as f:
            f.write(json.dumps(entry, sort_keys=True) + "\n")
        self.rounds.append(entry)
        for s in fresh:
            self.seen.add((s["path"], s["size"], s["mtime_ns"]))
        if self.url_index is not None and n_rows:
            # commit STRICTLY AFTER the durable write + manifest entry —
            # probe state during filtering never mutated the index, so a
            # failure anywhere above re-admits these rows on retry
            self.url_index.commit_from(
                read_stream_output(self.out_dir, rounds=[entry]))
        if (self.url_index is not None and self.snapshot_every
                and len(self.rounds) % self.snapshot_every == 0):
            self.url_index.snapshot(self._snap_dir(), through_round=rid)
        return {"round": rid, "n_files": len(fresh), "n_rows": n_rows}

    def run(self, poll_interval: float = 5.0, max_polls: int = 0,
            idle_stop: int = 0) -> dict:
        """Poll loop; returns totals. ``max_polls``/``idle_stop`` of 0
        mean unbounded (production tail)."""
        polls = idle = files = rows = 0
        while True:
            res = self.poll_once()
            polls += 1
            if res["round"] is None:
                idle += 1
            else:
                idle = 0
                files += res["n_files"]
                rows += res["n_rows"]
            if max_polls and polls >= max_polls:
                break
            if idle_stop and idle >= idle_stop:
                break
            time.sleep(poll_interval)
        return {"polls": polls, "n_files": files, "n_rows": rows}


def read_stream_output(out_dir: str,
                       rounds: list[dict] | None = None) -> "ray.data.Dataset":
    """Dataset over every manifest-named partition (orphaned directories
    from crashed rounds are excluded by construction). Pass ``rounds``
    to restrict to specific manifest entries (tail replay / per-round
    commit)."""
    import ray.data

    if rounds is None:
        rounds, _ = _load_manifest(out_dir)
    files = []
    for e in rounds:
        d = os.path.join(out_dir, e["partition"])
        if os.path.isdir(d):
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not files:
        import pyarrow as pa
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(files)


def read_stream_output_latest(out_dir: str) -> "ray.data.Dataset":
    """Compacted global view: exactly one row per url — the latest
    crawl. The log-compaction companion of the streaming url index
    (state/url_index.py): newer versions APPEND across rounds; this is
    the bounded keyed keep-latest pass that collapses them, the same
    operator the batch path uses (stages/dedup.py:dedup_latest_by_ts)."""
    from ..stages.dedup import dedup_latest_by_ts

    ds = read_stream_output(out_dir)
    try:
        names = ds.schema().names
    except Exception:
        names = []
    if "url" not in names:
        return ds
    return dedup_latest_by_ts(ds)
