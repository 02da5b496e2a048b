"""Single-core extractor throughput: the host-noise-immune metric.

The 32-cpu wall-clock swings ~2x with the shared host's windows; the
single-core library loop does not (recorded band round 3: 3.9-4.3k
pages/s). Run this FIRST when a parallel number looks off — if
pages/s is inside the band, the engine didn't regress, the window did.

Usage: python scripts/single_core_bench.py [sf_dir] [n_pages]
Prints one JSON line {"pages_per_sec": ..., "n_pages": ..., "synth_sec":
..., "extract_sec": ...}. Pure library loop — no Ray.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from full_text_extractor_v6_ray.sources.pages_gen import PageGenBatch  # noqa: E402
from full_text_extractor_v6_ray.stages.extract import ExtractBatch  # noqa: E402


def main() -> dict:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang", "source"])
    # replicate rows until we have enough pages (PageGenBatch is ~1:1+)
    gen = PageGenBatch(42)
    t0 = time.perf_counter()
    pages = []
    made = 0
    while made < n_pages:
        out = gen(docs)
        pages.append(out)
        made += out.num_rows
    synth_sec = time.perf_counter() - t0

    ex = ExtractBatch()
    n = 0
    t0 = time.perf_counter()
    for p in pages:
        out = ex(p)
        n += out.num_rows
        if n >= n_pages:
            break
    extract_sec = time.perf_counter() - t0
    return {"pages_per_sec": round(n / extract_sec, 1), "n_pages": n,
            "synth_sec": round(synth_sec, 3),
            "extract_sec": round(extract_sec, 3), "sf_dir": sf_dir}


if __name__ == "__main__":
    print(json.dumps(main()))
