"""End-to-end Ray Data pipeline tests on /root/testdata/sf0.001."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def extracted_df(ray_session):
    from full_text_extractor_v6_ray.pipelines import extraction_pipeline

    ds = extraction_pipeline(SF_DIR, dedup=False)
    return ds.to_pandas()


def test_row_count_matches_generator(extracted_df):
    docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    dups = sum(1 for d in range(docs) if d % 17 == 0)
    assert len(extracted_df) == docs + 2 * dups


def test_html_column_dropped(extracted_df):
    assert "html" not in extracted_df.columns


def test_no_errors_on_synthetic_corpus(extracted_df):
    assert (extracted_df["method"] != "error").all()
    assert (extracted_df["extracted_text"].str.len() > 0).all()


def test_pipeline_matches_driver_side_extraction(extracted_df):
    """Distributed result == single-process pure-library result, byte-for-byte."""
    from full_text_extractor_v6_ray.sources.pages_gen import pages_table_from_documents
    from full_text_extractor_v6_ray.stages.extract import ExtractBatch

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    local = ExtractBatch()(pages_table_from_documents(docs)).to_pandas()

    left = extracted_df.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    right = local.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert list(left["extracted_text"]) == list(right["extracted_text"])


def test_dedup_keeps_latest(ray_session):
    from full_text_extractor_v6_ray.pipelines import extraction_pipeline

    ds = extraction_pipeline(SF_DIR, dedup=True)
    df = ds.to_pandas()
    docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    assert len(df) == docs                      # one row per unique url
    assert df["url"].is_unique

    # duplicated urls must keep the LATEST warc_ts version
    nodedup = extraction_pipeline(SF_DIR, dedup=False).to_pandas()
    expect = (nodedup.sort_values("warc_ts").groupby("url", as_index=False)
              .last()[["url", "warc_ts"]])
    got = df[["url", "warc_ts"]].sort_values("url").reset_index(drop=True)
    expect = expect.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect)


def test_write_parquet_roundtrip(ray_session, tmp_path):
    from full_text_extractor_v6_ray.pipelines import extraction_pipeline

    out = str(tmp_path / "out")
    extraction_pipeline(SF_DIR, dedup=True, out_dir=out)
    back = pq.read_table(out)
    assert back.num_rows == pq.read_metadata(
        os.path.join(SF_DIR, "documents.parquet")).num_rows
    assert "extracted_text" in back.column_names
