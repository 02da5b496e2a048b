"""Crawl-layer operators at scale: snapshot diff / host degree /
anchor agg / politeness waves over synthetic multi-million-row inputs.

Usage: python scripts/crawl_bench.py [n_urls] [num_cpus]
Prints one JSON line per stage. OWNS its Ray session (like bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NH = 10_007  # host cardinality at this scale


def main() -> None:
    import ray
    import ray.data

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from full_text_extractor_v6_ray.stages.crawl import (
        anchor_target_agg,
        frontier_waves,
        host_degree,
        snapshot_diff,
    )
    from full_text_extractor_v6_ray.stages.hashing import md5_hex

    base = ray.data.range(N, override_num_blocks=max(CPUS * 4, 64))

    def urls_a(batch: pa.Table) -> pa.Table:
        p = batch.column("id").to_numpy(zero_copy_only=False)
        urls = pa.array([f"https://host{h}.example.com/p{x}"
                         for h, x in zip(p % NH, p)], pa.string())
        return pa.table({"url": urls, "hash_a": md5_hex(urls)})

    def urls_b(batch: pa.Table) -> pa.Table:
        p = batch.column("id").to_numpy(zero_copy_only=False)
        keep = p % 10 != 0
        kp = p[keep]
        urls = pa.array([f"https://host{h}.example.com/p{x}"
                         for h, x in zip(kp % NH, kp)], pa.string())
        # 10% changed: hash of url+suffix
        suffix = pa.array(np.where(kp % 10 == 1, "v2", ""), pa.string())
        import pyarrow.compute as pc
        h = md5_hex(pc.binary_join_element_wise(urls, suffix, ""))
        return pa.table({"url": urls, "hash_b": h})

    results = {}

    t = time.perf_counter()
    a = base.map_batches(urls_a, batch_format="pyarrow", zero_copy_batch=True)
    b = base.map_batches(urls_b, batch_format="pyarrow", zero_copy_batch=True)
    n_diff = snapshot_diff(a, b).count()
    results["snapshot_diff_sec"] = round(time.perf_counter() - t, 2)
    results["snapshot_diff_rows"] = n_diff

    def edges(batch: pa.Table) -> pa.Table:
        p = batch.column("id").to_numpy(zero_copy_only=False)
        parts = []
        for j in range(3):
            tgt = (p * 31 + j * 17 + 7) % N
            parts.append(pa.table({
                "src_host": pa.array(p % NH),
                "dst_host": pa.array(tgt % NH),
                "target_page": pa.array(tgt),
                "anchor": pa.array((p + j) % 13),
            }))
        return pa.concat_tables(parts)

    e = base.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)
    t = time.perf_counter()
    results["host_degree_rows"] = host_degree(e).count()
    results["host_degree_sec"] = round(time.perf_counter() - t, 2)

    import pyarrow.compute as pc

    def with_anchor(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("anchor"), "anchor",
            pc.cast(batch.column("anchor"), pa.string()))

    ea = e.map_batches(with_anchor, batch_format="pyarrow",
                       zero_copy_batch=True)
    t = time.perf_counter()
    results["anchor_agg_rows"] = anchor_target_agg(ea).count()
    results["anchor_agg_sec"] = round(time.perf_counter() - t, 2)

    def frontier(batch: pa.Table) -> pa.Table:
        p = batch.column("id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(p),
                         "host": pa.array(p % NH),
                         "priority": pa.array((p * 7919) % 1000)})

    f = base.map_batches(frontier, batch_format="pyarrow",
                         zero_copy_batch=True)
    t = time.perf_counter()
    results["frontier_waves_rows"] = frontier_waves(
        f, "host", "priority", "doc_id").count()
    results["frontier_waves_sec"] = round(time.perf_counter() - t, 2)

    # composed crawl round (pipelines/crawl_round.py): robots parse +
    # apply, sitemap discovery, politeness schedule and the CDC
    # extraction round end-to-end over an on-disk WARC snapshot
    # (snapshot synthesis is excluded from the timed window)
    import datetime
    import shutil

    from full_text_extractor_v6_ray.pipelines.crawl_round import crawl_round
    from full_text_extractor_v6_ray.sources.warc import build_warc_segment

    np_pages = min(N, 200_000)
    nhc = 1_009
    root = "/tmp/crawl_bench_round"
    snap, state = os.path.join(root, "warc"), os.path.join(root, "state")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(snap, exist_ok=True)
    epoch = datetime.datetime(2024, 3, 1)

    meta = []
    for h in range(nhc):
        if h % 3 == 0:
            meta.append((f"https://h{h}.ex/robots.txt", epoch,
                         (f"User-agent: *\nDisallow: /p{h % 7}\n"
                          f"Crawl-delay: {h % 4 + 1}\n").encode()))
        if h % 2 == 0:
            meta.append((f"https://h{h}.ex/sitemap.xml", epoch,
                         ('<?xml version="1.0"?><urlset>'
                          f"<url><loc>https://h{h}.ex/s1</loc>"
                          "<priority>0.9</priority></url>"
                          f"<url><loc>https://h{h}.ex/s2</loc>"
                          "<priority>0.2</priority></url>"
                          "</urlset>").encode()))
    with open(os.path.join(snap, "seg-meta.warc"), "wb") as fh:
        fh.write(build_warc_segment(meta, payload_digest=True))

    cbase = ray.data.range(np_pages,
                           override_num_blocks=max(CPUS * 2, 32))

    def add_seg(batch: pa.Table) -> pa.Table:
        p = batch.column("id").to_numpy(zero_copy_only=False)
        return batch.append_column("seg", pa.array(p // 1000, pa.int64()))

    def write_segment(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("id").to_numpy(zero_copy_only=False))
        recs = [(f"https://h{int(p) % nhc}.ex/p{int(p)}", epoch,
                 (f"<html><body><h1>Page {int(p)}</h1><p>Body text for "
                  f"page {int(p)} with some words.</p></body></html>"
                  ).encode()) for p in ids]
        seg = int(ids[0] // 1000)
        with open(os.path.join(snap, f"seg-{seg:06d}.warc"), "wb") as fh:
            fh.write(build_warc_segment(recs, payload_digest=True))
        return pa.table({"seg": pa.array([seg], pa.int64())})

    (cbase.map_batches(add_seg, batch_format="pyarrow",
                       zero_copy_batch=True)
          .groupby("seg").map_groups(write_segment,
                                     batch_format="pyarrow").count())

    t = time.perf_counter()
    out = crawl_round(snap, state)
    results["crawl_round_schedule_rows"] = out["schedule"].count()
    results["crawl_round_sec"] = round(time.perf_counter() - t, 2)
    results["crawl_round_pages"] = np_pages
    results["crawl_round_extracted"] = out["summary"]["extracted_rows"]
    shutil.rmtree(root, ignore_errors=True)

    results.update({"n_urls": N, "n_edges": 3 * N, "num_cpus": CPUS,
                    "n_hosts": NH})
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
