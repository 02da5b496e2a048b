"""Sharded cross-round URL index: streaming keep-latest dedup state.

This is the one place the engine drops to raw Ray actors, exactly per
the design rule: the Dataset API cannot express a MUTABLE INDEX SHARED
ACROSS INDEPENDENT PIPELINES (each micro-batch poll round is its own
bounded Dataset job; keep-latest-per-url must survive between them).

Semantics — the log-compaction contract (Kafka-style), as a
PROBE / COMMIT two-phase protocol so index state never runs ahead of
durable output:
  - ``filter_batch`` (probe, NON-MUTATING): a page row passes iff its
    ``warc_ts`` is STRICTLY NEWER than anything the index has
    COMMITTED for its url. Probing never updates the index, so a round
    that fails after filtering leaves no trace — the retry re-offers
    the same rows and they pass again (no silent loss).
  - ``commit_batch`` (MUTATING): applied by the caller only AFTER the
    round's output is durably written and named by the manifest.
    Committed state therefore always corresponds to rows a reader can
    actually see.
  - Because accepted newer versions APPEND (no retraction of rows
    already written in earlier rounds), the global latest-per-url view
    is ``read_stream_output(...)`` + the standard keyed keep-latest
    compaction (``stages/dedup.py:dedup_latest_by_ts``) — one bounded
    batch job, the same operator the batch path uses.
  - Races are benign and resolved by compaction: two batches of the
    SAME round (or a crash between manifest append and commit) can
    both pass versions of one url; the appended duplicates collapse in
    the compacted view. A probe can never let a STALE version through
    once a newer one is committed — that is the only invariant the
    index must hold, and commit-after-durable-write preserves it.

Null handling: rows with a null url or null warc_ts are DROPPED
explicitly at the top of ``filter_batch`` (they carry no identity /
ordering and previously fell through NaN comparisons silently).

Scale shape:
  - shards scale with the cluster (one dict per actor); keys are the
    16-byte md5 of the url (never the url string) + an 8-byte
    timestamp — ~60 B/url of Python dict overhead per entry. 128-bit
    keys keep accidental collisions negligible at 10^12 urls (a 64-bit
    fingerprint would not).
  - one RPC per (batch, shard): the filter partitions each batch by
    url-hash vectorized and sends packed bytes + int64 arrays, so
    actor traffic is O(num_shards) per batch, never O(rows).
  - restart: actors die with the Ray session; ``rebuild_from`` replays
    (url, warc_ts) pairs from the manifest-named output partitions —
    column-pruned, so recovery reads two thin columns, not the corpus.
    ``snapshot``/``restore_snapshot`` checkpoint shard state to parquet
    so a 10^12-url deployment replays only the post-snapshot tail.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class UrlIndexShard:
    """One hash-shard of the url -> latest-committed-warc_ts map.

    ``num_cpus=0``: shards are memory homes that answer sub-millisecond
    dict probes — they must not reserve cores the data tasks need.
    """

    def __init__(self):
        self._latest: dict[bytes, int] = {}

    def probe(self, keys: bytes, ts: np.ndarray) -> np.ndarray:
        """NON-MUTATING: keys packed 16-byte md5 digests; ts int64
        epoch-us. Returns a bool mask — True where strictly newer than
        the committed state."""
        lat = self._latest
        out = np.empty(len(ts), dtype=bool)
        for i, t in enumerate(ts.tolist()):
            prev = lat.get(keys[16 * i:16 * i + 16])
            out[i] = prev is None or t > prev
        return out

    def commit(self, keys: bytes, ts: np.ndarray) -> None:
        """MUTATING keep-max update — call only for durably-written
        rows (after the round's parquet + manifest entry succeed)."""
        lat = self._latest
        for i, t in enumerate(ts.tolist()):
            k = keys[16 * i:16 * i + 16]
            prev = lat.get(k)
            if prev is None or t > prev:
                lat[k] = t

    def size(self) -> int:
        return len(self._latest)

    def dump(self) -> tuple[bytes, np.ndarray]:
        """Snapshot payload: (packed 16-byte keys, int64 ts array)."""
        n = len(self._latest)
        keys = b"".join(self._latest.keys())
        ts = np.fromiter(self._latest.values(), dtype=np.int64, count=n)
        return keys, ts

    def load(self, keys: bytes, ts: np.ndarray) -> int:
        """Replace state from a snapshot payload; returns entry count."""
        self._latest = {keys[16 * i:16 * i + 16]: int(t)
                        for i, t in enumerate(ts.tolist())}
        return len(self._latest)


def _digests(urls: list[str]) -> tuple[bytes, np.ndarray]:
    """md5 digests packed back-to-back + a uint64 shard-hash per url."""
    digs = [hashlib.md5(u.encode("utf-8")).digest() for u in urls]
    packed = b"".join(digs)
    h = np.frombuffer(packed, dtype=np.uint64)[::2]  # first 8 bytes
    return packed, h


class StreamUrlDedup:
    """Probe/commit batch filter backed by a pool of UrlIndexShard actors.

    Use as ``pages.map_batches(index.filter_batch, batch_format="pyarrow")``
    inside each micro-batch round (non-mutating probe), then
    ``index.commit_batch(...)`` / ``commit_from(...)`` once the round's
    output is durable; the SAME instance (same actor handles) must be
    reused across rounds — that is the point.
    """

    def __init__(self, num_shards: int = 8,
                 url_col: str = "url", ts_col: str = "warc_ts"):
        self.num_shards = num_shards
        self.url_col = url_col
        self.ts_col = ts_col
        self.shards = [UrlIndexShard.remote() for _ in range(num_shards)]

    def _local_latest(self, batch: pa.Table) -> pa.Table:
        """Drop null url/ts rows, then keep the newest ts per url
        WITHIN the batch (<=1 probe per url per batch, shrinks the
        per-shard payload before any RPC)."""
        import pyarrow.compute as pc

        valid = pc.and_(pc.is_valid(batch.column(self.url_col)),
                        pc.is_valid(batch.column(self.ts_col)))
        if not pc.all(valid).as_py():
            batch = batch.filter(valid)
        if batch.num_rows == 0:
            return batch
        order = pc.sort_indices(batch, sort_keys=[
            (self.url_col, "ascending"), (self.ts_col, "descending")])
        sorted_b = batch.take(order)
        uarr = sorted_b.column(self.url_col).combine_chunks()
        n = len(uarr)
        first_tail = pc.not_equal(uarr.slice(1), uarr.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False) if n > 1 else \
            np.empty(0, dtype=bool)
        first = np.concatenate(([True], first_tail))
        return sorted_b.filter(pa.array(first))

    def _sharded(self, local: pa.Table):
        """(packed digests, int64 ts, shard id per row) for a
        null-free locally-deduped table."""
        urls = local.column(self.url_col).to_pylist()
        ts = local.column(self.ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        packed, shard_hash = _digests(urls)
        shard_of = (shard_hash % np.uint64(self.num_shards)).astype(np.int64)
        return packed, ts, shard_of

    def filter_batch(self, batch: pa.Table) -> pa.Table:
        """NON-MUTATING probe: rows strictly newer than committed state
        (null url/ts rows dropped explicitly)."""
        if batch.num_rows == 0:
            return batch
        local = self._local_latest(batch)
        if local.num_rows == 0:
            return local
        packed, ts, shard_of = self._sharded(local)
        keep = np.zeros(local.num_rows, dtype=bool)
        pending = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx) == 0:
                continue
            sub_keys = b"".join(packed[16 * i:16 * i + 16] for i in idx)
            pending.append((idx, self.shards[s].probe.remote(
                sub_keys, ts[idx])))
        for idx, ref in pending:
            keep[idx] = ray.get(ref)
        return local.filter(pa.array(keep))

    def commit_batch(self, batch: pa.Table) -> int:
        """MUTATING: record (url, ts) pairs as committed (keep-max).
        Call only for rows that are durably written. Returns rows
        committed (after null-drop + local keep-latest)."""
        if batch.num_rows == 0:
            return 0
        local = self._local_latest(batch)
        if local.num_rows == 0:
            return 0
        packed, ts, shard_of = self._sharded(local)
        pending = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx) == 0:
                continue
            sub_keys = b"".join(packed[16 * i:16 * i + 16] for i in idx)
            pending.append(self.shards[s].commit.remote(sub_keys, ts[idx]))
        ray.get(pending)
        return local.num_rows

    def commit_from(self, ds: "ray.data.Dataset") -> int:
        """Commit (url, ts) pairs from a durable output Dataset into
        the index (post-write commit / restart recovery). Returns rows
        scanned."""
        try:
            names = ds.schema().names
        except Exception:
            names = []
        if self.url_col not in names or self.ts_col not in names:
            return 0
        n = 0
        for batch in (ds.select_columns([self.url_col, self.ts_col])
                      .iter_batches(batch_format="pyarrow")):
            t = pa.Table.from_batches([batch]) \
                if isinstance(batch, pa.RecordBatch) else batch
            self.commit_batch(t)
            n += t.num_rows
        return n

    # restart recovery = committing every durably-readable pair
    rebuild_from = commit_from

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])

    # -- snapshot checkpointing (ROADMAP 3) --------------------------------

    def snapshot(self, snap_dir: str, through_round: int) -> str:
        """Write per-shard parquet snapshots + a manifest recording the
        last stream round whose commits they contain. Returns the
        manifest path. Atomic per file (tmp + rename); a torn snapshot
        (missing manifest) is ignored by ``restore_snapshot``."""
        os.makedirs(snap_dir, exist_ok=True)
        dumps = ray.get([s.dump.remote() for s in self.shards])
        for i, (keys, ts) in enumerate(dumps):
            t = pa.table({
                "key": pa.array([keys[16 * j:16 * j + 16]
                                 for j in range(len(ts))], pa.binary(16)),
                "ts": pa.array(ts, pa.int64()),
            })
            tmp = os.path.join(snap_dir, f".shard={i}.parquet.tmp")
            import pyarrow.parquet as pq
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(snap_dir, f"shard={i}.parquet"))
        man = {"num_shards": self.num_shards,
               "through_round": through_round,
               "entries": int(sum(len(ts) for _, ts in dumps))}
        tmp = os.path.join(snap_dir, ".snapshot.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f, sort_keys=True)
        path = os.path.join(snap_dir, "snapshot.json")
        os.replace(tmp, path)
        return path

    def restore_snapshot(self, snap_dir: str) -> int | None:
        """Load per-shard state from a snapshot directory. Returns the
        ``through_round`` it covers, or None when no complete snapshot
        exists (caller then falls back to full replay). Shard-count
        mismatches rehash rows into the current shards."""
        man_path = os.path.join(snap_dir, "snapshot.json")
        if not os.path.exists(man_path):
            return None
        with open(man_path) as f:
            man = json.load(f)
        import pyarrow.parquet as pq
        if man["num_shards"] == self.num_shards:
            pending = []
            for i in range(self.num_shards):
                t = pq.read_table(
                    os.path.join(snap_dir, f"shard={i}.parquet"))
                keys = b"".join(t.column("key").to_pylist())
                ts = t.column("ts").to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                pending.append(self.shards[i].load.remote(keys, ts))
            ray.get(pending)
        else:
            # re-shard: route every snapshot row through commit()
            for i in range(man["num_shards"]):
                t = pq.read_table(
                    os.path.join(snap_dir, f"shard={i}.parquet"))
                key_list = t.column("key").to_pylist()
                packed = b"".join(key_list)
                ts = t.column("ts").to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                h = np.frombuffer(packed, dtype=np.uint64)[::2]
                shard_of = (h % np.uint64(self.num_shards)).astype(np.int64)
                pending = []
                for s in range(self.num_shards):
                    idx = np.flatnonzero(shard_of == s)
                    if len(idx) == 0:
                        continue
                    sub = b"".join(key_list[j] for j in idx)
                    pending.append(self.shards[s].commit.remote(
                        sub, ts[idx]))
                ray.get(pending)
        return int(man["through_round"])
