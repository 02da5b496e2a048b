"""Sharded cross-round URL index: streaming keep-latest dedup state.

This is the one place the engine drops to raw Ray actors, exactly per
the design rule: the Dataset API cannot express a MUTABLE INDEX SHARED
ACROSS INDEPENDENT PIPELINES (each micro-batch poll round is its own
bounded Dataset job; keep-latest-per-url must survive between them).

Semantics — the log-compaction contract (Kafka-style):
  - ``offer``: a page row passes the filter iff its ``warc_ts`` is
    STRICTLY NEWER than anything the index has seen for its url
    (re-crawls with unchanged timestamps never reach extraction or
    disk); accepted rows update the index.
  - Because accepted newer versions APPEND (no retraction of rows
    already written in earlier rounds), the global latest-per-url view
    is ``read_stream_output(...)`` + the standard keyed keep-latest
    compaction (``stages/dedup.py:dedup_latest_by_ts``) — one bounded
    batch job, the same operator the batch path uses.
  - Races between concurrent map tasks are benign: each shard call is
    atomic, and an older version accepted before a newer one arrives
    is removed by compaction; the compacted view is identical either
    way.

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
    (A 10^12-url deployment would checkpoint shard dicts to parquet
    instead; ROADMAP.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class UrlIndexShard:
    """One hash-shard of the url -> latest-warc_ts map.

    ``num_cpus=0``: shards are memory homes that answer sub-millisecond
    dict probes — they must not reserve cores the data tasks need.
    """

    def __init__(self):
        self._latest: dict[bytes, int] = {}

    def offer(self, keys: bytes, ts: np.ndarray) -> np.ndarray:
        """keys: packed 16-byte md5 digests; ts: int64 epoch-us.
        Returns a bool mask — True where strictly newer than seen."""
        lat = self._latest
        out = np.empty(len(ts), dtype=bool)
        for i, t in enumerate(ts.tolist()):
            k = keys[16 * i:16 * i + 16]
            prev = lat.get(k)
            if prev is None or t > prev:
                lat[k] = t
                out[i] = True
            else:
                out[i] = False
        return out

    def size(self) -> int:
        return len(self._latest)


def _digests(urls: list[str]) -> tuple[bytes, np.ndarray]:
    """md5 digests packed back-to-back + a uint64 shard-hash per url."""
    digs = [hashlib.md5(u.encode("utf-8")).digest() for u in urls]
    packed = b"".join(digs)
    h = np.frombuffer(packed, dtype=np.uint64)[::2]  # first 8 bytes
    return packed, h


class StreamUrlDedup:
    """Callable batch filter backed by a pool of UrlIndexShard actors.

    Use as ``pages.map_batches(index.filter_batch, batch_format="pyarrow")``
    inside each micro-batch round; the SAME instance (same actor
    handles) must be reused across rounds — that is the point.
    """

    def __init__(self, num_shards: int = 8,
                 url_col: str = "url", ts_col: str = "warc_ts"):
        self.num_shards = num_shards
        self.url_col = url_col
        self.ts_col = ts_col
        self.shards = [UrlIndexShard.remote() for _ in range(num_shards)]

    def filter_batch(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        # local keep-latest first: <=1 offer per url per batch, and the
        # per-shard payload shrinks before any RPC
        import pyarrow.compute as pc

        order = pc.sort_indices(batch, sort_keys=[
            (self.url_col, "ascending"), (self.ts_col, "descending")])
        sorted_b = batch.take(order)
        uarr = sorted_b.column(self.url_col).combine_chunks()
        n = len(uarr)
        first_tail = pc.not_equal(uarr.slice(1), uarr.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False) if n > 1 else \
            np.empty(0, dtype=bool)
        first = np.concatenate(([True], first_tail))
        local = sorted_b.filter(pa.array(first))
        urls = local.column(self.url_col).to_pylist()

        ts = local.column(self.ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        packed, shard_hash = _digests(urls)
        shard_of = (shard_hash % np.uint64(self.num_shards)).astype(np.int64)

        keep = np.zeros(local.num_rows, dtype=bool)
        pending = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx) == 0:
                continue
            sub_keys = b"".join(packed[16 * i:16 * i + 16] for i in idx)
            pending.append((idx, self.shards[s].offer.remote(
                sub_keys, ts[idx])))
        for idx, ref in pending:
            keep[idx] = ray.get(ref)
        return local.filter(pa.array(keep))

    def rebuild_from(self, ds: "ray.data.Dataset") -> int:
        """Replay (url, ts) pairs from prior output into the index
        (restart recovery). Returns rows replayed."""
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
            self.filter_batch(t)
            n += t.num_rows
        return n

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])
