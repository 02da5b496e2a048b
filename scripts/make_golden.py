"""Regenerate the frozen golden extraction fixtures (tests/golden/).

Run ONLY when extraction semantics intentionally change; goldens are the
byte-identity contract (`python -m pytest -x -q` verifies against them).

Usage: python scripts/make_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from full_text_extractor_v6_ray.sources.pages_gen import pages_table_from_documents
from full_text_extractor_v6_ray.stages.extract import ExtractBatch

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "golden_sf0001.parquet")


def main():
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    pages = pages_table_from_documents(docs)
    extracted = ExtractBatch()(pages)
    golden = extracted.select(
        ["url", "warc_ts", "extracted_text", "spans", "method", "error"])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(golden, OUT)
    print(f"wrote {golden.num_rows} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
