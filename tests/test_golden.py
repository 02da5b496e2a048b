"""Golden byte-identity: the load-bearing correctness layer (SURVEY.md §5.2).

Re-extracts the deterministic sf0.001-derived page corpus and asserts the
extracted_text is byte-identical per (url, warc_ts) to the frozen fixture,
and spans match exactly.
"""

import os

import pyarrow.parquet as pq
import pytest

from full_text_extractor_v6_ray.sources.pages_gen import pages_table_from_documents
from full_text_extractor_v6_ray.stages.extract import ExtractBatch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_sf0001.parquet")
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fresh_and_golden():
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    pages = pages_table_from_documents(docs)
    fresh = ExtractBatch()(pages)
    golden = pq.read_table(GOLDEN)
    return fresh, golden


def _key(tbl):
    return list(zip(tbl["url"].to_pylist(),
                    [t.isoformat() for t in tbl["warc_ts"].to_pylist()]))


def test_same_rows(fresh_and_golden):
    fresh, golden = fresh_and_golden
    assert fresh.num_rows == golden.num_rows
    assert _key(fresh) == _key(golden)


def test_extracted_text_byte_identical(fresh_and_golden):
    fresh, golden = fresh_and_golden
    ft = fresh["extracted_text"].to_pylist()
    gt = golden["extracted_text"].to_pylist()
    mismatches = [i for i, (a, b) in enumerate(zip(ft, gt))
                  if a.encode("utf-8") != b.encode("utf-8")]
    assert mismatches == [], f"{len(mismatches)} rows differ, first at {mismatches[:3]}"


def test_spans_identical(fresh_and_golden):
    fresh, golden = fresh_and_golden
    assert fresh["spans"].to_pylist() == golden["spans"].to_pylist()


def test_methods_and_errors_identical(fresh_and_golden):
    fresh, golden = fresh_and_golden
    assert fresh["method"].to_pylist() == golden["method"].to_pylist()
    assert fresh["error"].to_pylist() == golden["error"].to_pylist()


def test_span_offsets_are_valid_utf8_slices(fresh_and_golden):
    fresh, _ = fresh_and_golden
    for text, spans in zip(fresh["extracted_text"].to_pylist()[:100],
                           fresh["spans"].to_pylist()[:100]):
        raw = text.encode("utf-8")
        for s in spans or []:
            sl = raw[s["start"]:s["end"]]
            sl.decode("utf-8")  # must be a valid utf-8 boundary slice
            assert len(sl) == s["end"] - s["start"] > 0
