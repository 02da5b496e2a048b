"""Real-file folder ingestion (S1 folder discovery + S2 file reader).

The reference walks ONE directory with per-extension globs, orders files
by a processing-priority table (PowerPoint first), reads each file's
bytes, converts, and writes ``<stem>.md`` per input into an output
subfolder (default ``markdown``) — see
``/root/reference/src/processors/folder_processor.py:35-50,88`` and the
priority / format tables at ``/root/reference/config.py:37-92``.

Ray-Data-native shape: discovery is a driver-side metadata operation
(cheap — paths only, never bytes); the bytes stream through
``ray.data.read_binary_files`` (which shards over files and pipelines
with downstream stages), and a small ``map_batches`` projects each file
into the engine's canonical pages schema
(``sources.pages_gen.PAGES_SCHEMA``: url, warc_ts, html, text, lang) so
the whole existing extraction pipeline — sniffer, format router,
extractor registry, dedup, sinks — applies unchanged to on-disk corpora.

The markdown sink is a distributed side-effect ``map_batches`` stage:
each task writes its rows' ``.md`` files and emits a per-row
``written`` flag, so a re-run with ``overwrite=False`` skips files that
already exist — the resumable-output rule applied to a file-tree sink.
"""

from __future__ import annotations

import datetime
import os
import re

import pyarrow as pa

from .pages_gen import PAGES_SCHEMA

# Reference parity: extension -> processing priority (lower runs first);
# unknown extensions sort last (folder_processor.py:102-114 uses 999).
PROCESSING_PRIORITIES = {
    "pptx": 1, "ppt": 1,
    "docx": 2, "doc": 2,
    "pdf": 3,
    "xlsx": 4, "xls": 4,
    "html": 5, "htm": 5,
    "csv": 6, "json": 6, "xml": 6,
    "zip": 7,
}

# Reference parity: the union of FILE_FORMATS extensions
# (/root/reference/config.py:37-59) plus the web-corpus container kinds
# this engine routes natively (warc, gz, txt).
SUPPORTED_EXTENSIONS = (
    "pptx", "ppt", "docx", "doc", "pdf", "epub", "xlsx", "xls",
    "html", "htm", "csv", "json", "xml", "zip", "warc", "gz", "txt",
)


def file_priority(path: str) -> int:
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    return PROCESSING_PRIORITIES.get(ext, 999)


def discover_files(folder: str,
                   extensions: tuple[str, ...] | None = None,
                   recursive: bool = False) -> list[str]:
    """Deterministic, priority-ordered file discovery.

    Non-recursive single-folder scan by default (the reference's glob
    loop, folder_processor.py:44-46); ``recursive=True`` extends to the
    whole tree for corpus-style layouts. Returns absolute paths sorted
    by (priority, relative path) so two runs — and two cluster sizes —
    see the identical file list in the identical order.
    """
    exts = {e.lower().lstrip(".") for e in (extensions or SUPPORTED_EXTENSIONS)}
    out: list[str] = []
    if recursive:
        for root, _dirs, names in os.walk(folder):
            for n in names:
                if n.rsplit(".", 1)[-1].lower() in exts and "." in n:
                    out.append(os.path.abspath(os.path.join(root, n)))
    else:
        try:
            names = os.listdir(folder)
        except FileNotFoundError:
            return []
        for n in names:
            p = os.path.join(folder, n)
            if os.path.isfile(p) and "." in n and n.rsplit(".", 1)[-1].lower() in exts:
                out.append(os.path.abspath(p))
    out.sort(key=lambda p: (file_priority(p), p))
    return out


class _ToPages:
    """Project read_binary_files batches into the pages schema.

    mtime becomes ``warc_ts`` (the crawl-timestamp analog for on-disk
    corpora): stable across runs, and it makes the existing
    first/latest-by-ts dedup meaningful for re-exported folders.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        urls, ts = [], []
        for p in paths:
            ap = os.path.abspath(p)
            urls.append("file://" + ap)
            try:
                mt = os.stat(ap).st_mtime
                ts.append(datetime.datetime.utcfromtimestamp(int(mt)))
            except OSError:
                ts.append(datetime.datetime(1970, 1, 1))
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(ts, pa.timestamp("us")),
                batch.column("bytes").cast(pa.binary()),
                pa.array([""] * n, pa.string()),
                pa.array([""] * n, pa.string()),
            ],
            schema=PAGES_SCHEMA,
        )


def read_folder(folder: str,
                extensions: tuple[str, ...] | None = None,
                recursive: bool = False) -> "ray.data.Dataset":
    """Folder of documents -> streaming pages-schema Dataset.

    Bytes never touch the driver: ``read_binary_files`` shards the
    (priority-ordered) path list over read tasks, and the projection is
    a cheap per-batch rename — the downstream extract stage does the
    real work. An empty folder yields an empty Dataset with the exact
    pages schema, so pipelines compose without special-casing.
    """
    import ray.data

    paths = discover_files(folder, extensions=extensions, recursive=recursive)
    if not paths:
        return ray.data.from_arrow(PAGES_SCHEMA.empty_table())
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_ToPages(), batch_format="pyarrow",
                          zero_copy_batch=True)


_UNSAFE = re.compile(r"[^A-Za-z0-9._-]+")


def markdown_name(url: str) -> str:
    """Output filename for one extracted document.

    ``file://`` urls keep the reference's ``<stem>.md`` naming
    (folder_processor.py:88); web urls get a filesystem-safe slug of
    host+path so a crawl corpus can use the same sink.
    """
    if url.startswith("file://"):
        stem = os.path.splitext(os.path.basename(url[len("file://"):]))[0]
        return (stem or "document") + ".md"
    slug = _UNSAFE.sub("_", url.split("://", 1)[-1]).strip("_")
    return (slug[:120] or "document") + ".md"


class _MarkdownWriter:
    def __init__(self, out_dir: str, overwrite: bool):
        self.out_dir = out_dir
        self.overwrite = overwrite
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        written = []
        for url, text in zip(urls, texts):
            path = os.path.join(self.out_dir, markdown_name(url))
            if not self.overwrite and os.path.exists(path):
                written.append(0)
                continue
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(text or "")
            os.replace(tmp, path)  # atomic: a crash never leaves a torn .md
            written.append(1)
        return pa.Table.from_arrays(
            [pa.array(urls, pa.string()), pa.array(written, pa.int64())],
            names=["url", "written"],
        )


def write_markdown_tree(extracted: "ray.data.Dataset", out_dir: str,
                        overwrite: bool = False) -> dict:
    """One ``.md`` per document (S5 sink), distributed and resumable.

    Returns {'files_written': n, 'files_skipped': m}. Skipping existing
    outputs makes a re-run after a partial failure cheap — only the
    missing files are produced (write-then-rename keeps partials out).
    """
    from ray.data.aggregate import Count, Sum

    flags = extracted.map_batches(_MarkdownWriter(out_dir, overwrite),
                                  batch_format="pyarrow")
    # one aggregate = one pipeline execution (count()+sum() would run twice)
    res = flags.aggregate(Count(), Sum("written")) or {}
    total = int(res.get("count()", 0))
    done = int(res.get("sum(written)", 0) or 0)
    return {"files_written": done, "files_skipped": total - done}


def folder_pipeline(folder: str,
                    out_dir: str | None = None,
                    recursive: bool = False,
                    overwrite: bool = False):
    """The reference's folder workflow, Ray-Data-native.

    discover -> read bytes -> sniff/route/extract -> one .md per input
    in ``out_dir`` (default ``<folder>/markdown``, matching
    DEFAULT_MARKDOWN_SUBFOLDER at /root/reference/config.py:17).
    Returns the sink stats dict; pass ``out_dir=''`` to skip the sink
    and get the lazy extracted Dataset instead (single-execution either
    way — the pipeline is consumed exactly once).
    """
    from ..pipelines.extract_pipeline import extract_pages

    extracted = extract_pages(read_folder(folder, recursive=recursive))
    if out_dir == "":
        return extracted
    if out_dir is None:
        out_dir = os.path.join(folder, "markdown")
    return write_markdown_tree(extracted, out_dir, overwrite=overwrite)
