"""Flagship pipeline: pages -> extract -> dedup -> (write | return).

Engine lifecycle (SURVEY.md §3.4):

    read_parquet (column-pruned)
      -> [synthesize pages from documents, streaming, when no pages table]
      -> map_batches(ExtractBatch, actor pool, pyarrow, zero-copy)
      -> dedup_latest_by_ts (local combine + one groupby shuffle)
      -> write_parquet (partitioned) / Dataset back to caller

No stage materializes the full dataset; the streaming executor pipelines
read → synth → extract → shuffle with backpressure.
"""

from __future__ import annotations

import os

import ray.data

from ..config import DEFAULT_CONFIG, DEFAULT_PIPELINE_CONFIG, ExtractConfig, PipelineConfig
from ..sources.pages_gen import PageGenBatch
from ..stages.dedup import dedup_latest_by_ts
from ..stages.extract import ExtractBatch


def pages_dataset_from_documents(sf_dir: str, seed: int = 42,
                                 pcfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG,
                                 replicate: int = 1,
                                 ) -> "ray.data.Dataset":
    """Streaming synthetic pages over the driver's documents table.

    Column-pruned read (only the four columns the generator needs) — the
    'prune at the read' rule; generation is a stateless per-row pure
    function, so a plain-function map_batches stage (cheap elastic tasks).
    """
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    return docs.map_batches(PageGenBatch(seed, replicate),
                            batch_format="pyarrow",
                            batch_size=pcfg.doc_batch_size,
                            zero_copy_batch=True)


def _pool_size(pcfg: PipelineConfig) -> tuple[int, int]:
    """Actor-pool bounds: autoscale (1, cluster_cpus - 2).

    Leaving >=2 CPUs free keeps the read and shuffle stages schedulable —
    a pool reserving every CPU deadlocks the streaming executor (the read
    task gets backpressured behind pending actors forever).
    """
    if pcfg.concurrency is not None:
        return (1, pcfg.concurrency)
    import ray
    try:
        total = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        total = 8
    cap = max(1, total - 2)
    # FIXED pool at cap: the autoscaler is too conservative (observed
    # plateau at ~half the cap on a 220k-page run), and autoscaling from a
    # low floor pays actor-startup latency serially. cap = cpus-2 keeps the
    # read/shuffle stages schedulable (full-width pool deadlocks the read).
    return (cap, cap)


def extract_pages(pages: "ray.data.Dataset",
                  cfg: ExtractConfig = DEFAULT_CONFIG,
                  pcfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG
                  ) -> "ray.data.Dataset":
    """Extraction stage: Arrow zero-copy, html column dropped.

    Default is a TASK pool: extractor state is module-level compiled
    regexes, paid once per worker process at import under either mode,
    and tasks reuse Ray's prestarted workers — the actor pool's 5-14 s
    per-execution spawn (measured, 30 actors at 32 cpus) buys nothing
    here. ``pcfg.use_actor_pool`` keeps the A1 actor shape available for
    variants with genuinely expensive per-actor state (model loads).
    """
    if pcfg.use_actor_pool:
        return pages.map_batches(
            ExtractBatch,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=pcfg.batch_size,
            concurrency=_pool_size(pcfg),
            num_cpus=pcfg.num_cpus_per_actor,
        )
    return pages.map_batches(
        ExtractBatch(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=pcfg.batch_size,
    )


def extraction_pipeline(sf_dir: str,
                        dedup: bool = True,
                        out_dir: str | None = None,
                        cfg: ExtractConfig = DEFAULT_CONFIG,
                        pcfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG
                        ) -> "ray.data.Dataset":
    """documents.parquet -> pages -> extracted (optionally deduped/written)."""
    pages = pages_dataset_from_documents(sf_dir, pcfg=pcfg)
    extracted = extract_pages(pages, cfg=cfg, pcfg=pcfg)
    if dedup:
        extracted = dedup_latest_by_ts(extracted)
    if out_dir:
        extracted.write_parquet(out_dir)
    return extracted


def warc_extraction_pipeline(warc_dir: str,
                             dedup: bool = True,
                             out_dir: str | None = None,
                             cfg: ExtractConfig = DEFAULT_CONFIG,
                             pcfg: PipelineConfig = DEFAULT_PIPELINE_CONFIG
                             ) -> "ray.data.Dataset":
    """Raw crawl segments -> corpus: the Common-Crawl front-end of the
    flagship pipeline.

    .warc/.warc.gz segments -> one pages-schema row per content record
    (``sources/warc.py``: segment-sharded reads, Content-Length record
    walk, member gunzip, HTTP-envelope strip) -> the SAME extract /
    url-dedup / write stages as the parquet path. Streaming end to end;
    the unit of parallelism and of retry is the segment file.
    """
    from ..sources.warc import read_warc_dir

    extracted = extract_pages(read_warc_dir(warc_dir), cfg=cfg, pcfg=pcfg)
    if dedup:
        extracted = dedup_latest_by_ts(extracted)
    if out_dir:
        extracted.write_parquet(out_dir)
    return extracted
