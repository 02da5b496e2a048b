"""Multi-record WARC segment ingestion (Common-Crawl-scale source).

``extractor.containers.warc_inner`` (S7) unwraps ONE record — the
router path for a single payload that happens to be a WARC capture. A
real crawl corpus is shaped differently: each ``.warc`` / ``.warc.gz``
SEGMENT carries tens of thousands of records (Common Crawl: ~1 GB
gzipped, ~50k records per segment file). This module turns segments
into pages-schema rows, Ray-Data-first:

    read_binary_files(segment paths)          # shards over segments
      -> map_batches(WarcToPages)             # one row PER RECORD
      -> extract_pages / dedup / sinks        # existing pipeline

Scale shape: path discovery is driver-side metadata only; segment
bytes go straight to read tasks (one task holds at most one segment);
record walking is a single linear scan driven by ``Content-Length``
(never a regex over the blob); the per-record rows flow into the
existing extract/dedup stages with no driver involvement. The unit of
parallelism is the segment — exactly how a 256-node cluster consumes
a 100 TB crawl (segments >> slots), and a failed task re-reads one
segment, not the corpus.

``.warc.gz`` handling: Common Crawl gzips PER RECORD and concatenates
the members; whole-file gzip also appears in the wild. zlib's
``decompressobj`` treats both identically (each member boundary starts
a fresh header), so ``gunzip_members`` inflates either, bounded by a
decompression-bomb guard sized to the standard ~1 GB-segment unit.

WARC format notes (ISO 28500, mirrored from the single-record walker
at ``extractor/containers.py:36-79``): records are
``WARC/1.x\\r\\n<headers>\\r\\n\\r\\n<block>\\r\\n\\r\\n``; content
records are ``response`` / ``resource`` / ``conversion``; an
``application/http; msgtype=response`` block carries an HTTP envelope
whose entity body is the page.
"""

from __future__ import annotations

import datetime
import os
import zlib

import pyarrow as pa

from .pages_gen import PAGES_SCHEMA

# Runaway guards: a record count far above any real segment (CC ~50k),
# and an inflate cap at 4x the standard 1 GB segment unit.
MAX_RECORDS_PER_SEGMENT = 1_000_000
MAX_INFLATED_BYTES = 4 << 30

_CONTENT_TYPES = (b"response", b"resource", b"conversion")


def gunzip_members(payload: bytes,
                   max_bytes: int = MAX_INFLATED_BYTES) -> bytes:
    """Inflate ALL concatenated gzip members (record-gzipped .warc.gz)
    or a single whole-file member — bounded by ``max_bytes`` (bomb
    guard). A truncated trailing member yields what inflated cleanly;
    a non-gzip payload returns b"" (callers fall back to raw bytes).
    """
    out: list[bytes] = []
    total = 0
    data = payload
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(data, max_bytes - total + 1)
        except Exception:
            break
        total += len(chunk)
        if total > max_bytes:
            raise ValueError("warc_gzip_too_large")
        out.append(chunk)
        if not d.eof:
            break   # truncated member: keep what we have
        data = d.unused_data
    return b"".join(out)


def _parse_warc_date(raw: bytes) -> datetime.datetime:
    """WARC-Date (ISO 8601 UTC, e.g. 2020-01-01T00:02:03Z) -> naive-UTC
    datetime (the engine's ``warc_ts`` convention). Epoch on parse
    failure — explicit sentinel, never a raise."""
    try:
        dt = datetime.datetime.fromisoformat(raw.decode("ascii"))
        if dt.tzinfo is not None:
            dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return dt
    except Exception:
        return datetime.datetime(1970, 1, 1)


def iter_warc_records(payload: bytes,
                      max_records: int = MAX_RECORDS_PER_SEGMENT,
                      with_digest: bool = False):
    """Yield (url, warc_ts, block) — or (url, warc_ts, block, digest)
    with ``with_digest=True`` — for every CONTENT record in a raw
    (already-inflated) WARC segment. ``digest`` is the raw
    ``WARC-Payload-Digest`` header string (e.g. ``sha1:BASE32...``) or
    None when the record carries none.

    warcinfo / request / metadata records are skipped by their
    ``Content-Length``; ``application/http; msgtype=response`` blocks
    are stripped to the HTTP entity body. Malformed tails degrade to
    stopping (everything parsed so far is kept) — the never-raise
    ingestion contract.
    """
    pos = 0
    n_total = len(payload)
    for _ in range(max_records):
        if pos >= n_total or not payload.startswith(b"WARC/", pos):
            return
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict[bytes, bytes] = {}
        for line in payload[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            n = int(headers.get(b"content-length", b""))
        except ValueError:
            return   # unskippable record: stop (no way to find the next)
        body_start = head_end + 4
        block = payload[body_start:body_start + n]
        if headers.get(b"warc-type", b"") in _CONTENT_TYPES:
            ctype = headers.get(b"content-type", b"")
            body = block
            if ctype.split(b";")[0].strip() == b"application/http":
                http_end = block.find(b"\r\n\r\n")
                body = block[http_end + 4:] if http_end >= 0 else b""
            url = headers.get(b"warc-target-uri", b"").decode(
                "utf-8", errors="replace")
            when = _parse_warc_date(headers.get(b"warc-date", b""))
            if with_digest:
                raw = headers.get(b"warc-payload-digest")
                digest = raw.decode("ascii", errors="replace") \
                    if raw else None
                yield url, when, body, digest
            else:
                yield url, when, body
        pos = body_start + n
        # record separator: \r\n\r\n per spec; tolerate a lone \r\n
        if payload.startswith(b"\r\n\r\n", pos):
            pos += 4
        elif payload.startswith(b"\r\n", pos):
            pos += 2


_GZ_MAGIC = b"\x1f\x8b"


_PROVENANCE_FIELDS = [("warc_file", pa.string()),
                      ("record_idx", pa.int64())]


class WarcToPages:
    """map_batches UDF: (path, bytes) segment rows -> pages-schema rows,
    one per content record. Gzip segments inflate member-wise first;
    the stateless walk is why this is a task pool, not actors.

    ``include_provenance=True`` appends CDX-style lineage columns
    ``warc_file`` (segment basename) and ``record_idx`` (0-based index
    of the content record within its segment) — enough to re-fetch any
    record by walking one segment, and the grain the per-segment
    manifest aggregates."""

    def __init__(self, max_inflated: int = MAX_INFLATED_BYTES,
                 include_provenance: bool = False,
                 include_digest: bool = False):
        self.max_inflated = max_inflated
        self.include_provenance = include_provenance
        self.include_digest = include_digest

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[datetime.datetime] = []
        blocks: list[bytes] = []
        files: list[str] = []
        idxs: list[int] = []
        digests: list[str | None] = []
        for path, payload in zip(batch.column("path").to_pylist(),
                                 batch.column("bytes").to_pylist()):
            if payload[:2] == _GZ_MAGIC:
                payload = gunzip_members(payload, self.max_inflated)
            base = os.path.basename(path)
            for i, rec in enumerate(
                    iter_warc_records(payload, with_digest=True)):
                url, when, body, digest = rec
                urls.append(url)
                ts.append(when)
                blocks.append(body)
                if self.include_digest:
                    digests.append(digest)
                if self.include_provenance:
                    files.append(base)
                    idxs.append(i)
        n = len(urls)
        arrays = [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("us")),
            pa.array(blocks, pa.binary()),
            pa.array([""] * n, pa.string()),
            pa.array([""] * n, pa.string()),
        ]
        fields: list = list(PAGES_SCHEMA)
        if self.include_provenance:
            fields += [pa.field(k, t) for k, t in _PROVENANCE_FIELDS]
            arrays += [pa.array(files, pa.string()),
                       pa.array(idxs, pa.int64())]
        if self.include_digest:
            # the crawler-recorded payload digest (WARC-Payload-Digest):
            # incremental rounds trust it instead of re-hashing payloads
            fields.append(pa.field("payload_digest", pa.string()))
            arrays.append(pa.array(digests, pa.string()))
        if len(fields) == len(PAGES_SCHEMA):
            return pa.Table.from_arrays(arrays, schema=PAGES_SCHEMA)
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def read_warc_dir(folder: str,
                  include_provenance: bool = False,
                  include_digest: bool = False) -> "ray.data.Dataset":
    """Folder of .warc / .warc.gz segments -> streaming pages Dataset.

    Paths sort lexicographically so two runs (and two cluster sizes)
    shard the identical segment list; an empty folder yields an empty
    Dataset with the exact pages schema (compose without special-casing).
    ``include_digest`` surfaces ``WARC-Payload-Digest`` as a
    ``payload_digest`` column (null where absent) — the hash an
    incremental round trusts instead of re-reading every payload.
    """
    import ray.data

    try:
        names = sorted(os.listdir(folder))
    except FileNotFoundError:
        names = []
    paths = [os.path.join(folder, n) for n in names
             if n.endswith(".warc") or n.endswith(".warc.gz")]
    if not paths:
        fields: list = list(PAGES_SCHEMA)
        if include_provenance:
            fields += [pa.field(k, t) for k, t in _PROVENANCE_FIELDS]
        if include_digest:
            fields.append(pa.field("payload_digest", pa.string()))
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        WarcToPages(include_provenance=include_provenance,
                    include_digest=include_digest),
        batch_format="pyarrow", zero_copy_batch=True)


def warc_segment_manifest(warc_dir: str) -> "ray.data.Dataset":
    """Per-segment ingest accounting: (warc_file, n_records, n_bytes,
    min_ts, max_ts) — the record-level lineage a restarting 100 TB run
    diffs against finished partitions (same role as the extraction
    pipeline's per-partition manifests, at the segment grain). One
    map-side collapse per segment; the groupby moves one row per
    (segment, batch)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    pages = read_warc_dir(warc_dir, include_provenance=True)

    def collapse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "warc_file": batch.column("warc_file"),
            "n_bytes": pc.binary_length(
                batch.column("html")).cast(pa.int64()),
            "warc_ts": batch.column("warc_ts"),
        })

    return (pages.map_batches(collapse, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("warc_file")
            .aggregate(Count(alias_name="n_records"),
                       Sum("n_bytes", alias_name="n_bytes"),
                       Min("warc_ts", alias_name="min_ts"),
                       Max("warc_ts", alias_name="max_ts")))


def build_cdx_index(warc_dir: str) -> "ray.data.Dataset":
    """CDX-style capture index over a folder of WARC segments: one row
    per content record, keyed by the SURT-transformed URL and sorted by
    (url_key, warc_ts) — the web-archive lookup layout (all captures of
    a URL are adjacent, newest last; binary-searchable once written as
    partitioned parquet).

    Columns: ``url_key`` (SURT, ``stages/urlnorm.surt_keys``), ``url``
    (original), ``warc_ts``, ``warc_file`` / ``record_idx`` (re-fetch
    pointer), ``n_bytes``, ``digest`` (md5 hex of the record body —
    DuckDB ``md5()``-comparable).

    Scale shape: per-batch Arrow projection + ONE range-partitioned
    sort (a CDX build IS a global sort job); everything upstream
    streams from the segment walk.
    """
    import pyarrow.compute as pc

    from ..stages.hashing import md5_hex
    from ..stages.urlnorm import surt_keys

    pages = read_warc_dir(warc_dir, include_provenance=True)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url_key": surt_keys(batch.column("url")),
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "warc_file": batch.column("warc_file"),
            "record_idx": batch.column("record_idx"),
            "n_bytes": pc.binary_length(
                batch.column("html")).cast(pa.int64()),
            "digest": md5_hex(batch.column("html")),
        })

    return (pages.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)
            .sort(["url_key", "warc_ts"]))


def write_wet_segments(extracted: "ray.data.Dataset", out_dir: str,
                       num_shards: int = 64,
                       gzip_members: bool = True) -> dict:
    """WET-style sink: extracted text back out as WARC ``conversion``
    records (Common Crawl's extracted-text distribution format), one
    ``.warc[.gz]`` segment per md5-url shard.

    Resumable-output rules: shard membership is the engine hash of the
    url (``stages/hashing.hash64`` — version-independent) — stable
    under repartitioning and retries; rows sort by url inside the shard, so a
    shard file's bytes are deterministic (gzip mtime=0); writes go
    tmp → atomic rename, so a crashed run never leaves a torn segment
    and a re-run reproduces the identical file set. Round-trips through
    ``read_warc_dir`` (conversion records are content records).

    Returns {'segments': n, 'records': m}. One bucketed groupby is the
    only shuffle; text crosses it once.
    """
    from ..stages.hashing import hash64

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = hash64(batch.column("url")) % num_shards
        return batch.append_column(
            "__shard", pa.array(shard.astype("int64"), pa.int64()))

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g.column("__shard")[0].as_py())
        urls = g.column("url").to_pylist()
        order = sorted(range(len(urls)), key=urls.__getitem__)
        ts = g.column("warc_ts").to_pylist()
        texts = g.column("extracted_text").to_pylist()
        recs = [(urls[i], ts[i], (texts[i] or "").encode("utf-8"))
                for i in order]
        payload = build_warc_segment(recs, gzip_members=gzip_members,
                                     warc_type=b"conversion",
                                     content_type=b"text/plain")
        name = f"wet-{shard:05d}.warc" + (".gz" if gzip_members else "")
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "records": pa.array([len(recs)], pa.int64())})

    stats = (extracted.select_columns(["url", "warc_ts", "extracted_text"])
             .map_batches(add_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("__shard")
             .map_groups(write_shard, batch_format="pyarrow")
             .to_pandas())
    return {"segments": int(len(stats)),
            "records": int(stats["records"].sum()) if len(stats) else 0}


# ---------------------------------------------------------------------------
# Deterministic segment builder — fixture machinery and the WET sink's
# record writer: tests and the oracle query synthesize segments from
# the documents table, round-trip them through the reader, and compare
# against SQL recomputed straight from the table.
# ---------------------------------------------------------------------------

def build_warc_segment(records, gzip_members: bool = False,
                       http_envelope_every: int = 0,
                       warcinfo: bool = True,
                       warc_type: bytes = b"resource",
                       content_type: bytes = b"text/html",
                       payload_digest: bool = False) -> bytes:
    """records: iterable of (url: str, ts: datetime, body: bytes) ->
    one WARC segment. ``http_envelope_every=k`` wraps every k-th record
    as an ``application/http; msgtype=response`` block (0 = none) so
    round-trip tests exercise the envelope strip; ``gzip_members``
    gzips per record, Common-Crawl style; ``warc_type``/``content_type``
    select the plain-record flavor (``conversion`` + ``text/plain`` for
    WET output)."""
    import gzip as _gzip

    def finish(rec: bytes) -> bytes:
        # mtime=0: byte-deterministic fixtures (gzip headers embed time)
        return _gzip.compress(rec, 6, mtime=0) if gzip_members else rec

    parts: list[bytes] = []
    if warcinfo:
        info = b"software: graft-fixture\r\n"
        parts.append(finish(
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: " + str(len(info)).encode() + b"\r\n\r\n"
            + info + b"\r\n\r\n"))
    for i, (url, ts, body) in enumerate(records):
        if http_envelope_every and i % http_envelope_every == 0:
            block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                     + body)
            ctype = b"application/http; msgtype=response"
            wtype = b"response"
        else:
            block = body
            ctype = content_type
            wtype = warc_type
        digest_line = b""
        if payload_digest:
            # spec shape: sha1 of the PAYLOAD (entity body, not the
            # HTTP envelope), base32 — what Common Crawl records
            import base64 as _b64
            import hashlib as _hl
            d = _b64.b32encode(_hl.sha1(body).digest())
            digest_line = b"WARC-Payload-Digest: sha1:" + d + b"\r\n"
        parts.append(finish(
            b"WARC/1.0\r\n"
            b"WARC-Type: " + wtype + b"\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: "
            + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
            + digest_line +
            b"Content-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
            + block + b"\r\n\r\n"))
    return b"".join(parts)
