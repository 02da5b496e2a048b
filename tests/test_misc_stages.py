"""Remaining stage coverage: salted aggregate, links CSV sink,
generation invariance to batch splits."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_salted_equals_plain_groupby(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.salted import salted_count_sum

    df = pd.DataFrame({
        "k": ["hot"] * 500 + ["a"] * 20 + ["b"] * 3,
        "v": range(523),
    })
    got = salted_count_sum(ray.data.from_pandas(df), "k", sum_col="v",
                           n_salts=8).to_pandas()
    exp = df.groupby("k").agg(n_rows=("v", "count"),
                              total=("v", "sum")).reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "n_rows", "total"]].astype({"n_rows": "int64"}),
        exp.astype({"n_rows": "int64"}), check_dtype=False)


def test_write_links_csv(ray_session, tmp_path):
    import ray.data
    from full_text_extractor_v6_ray.stages.links import write_links_csv

    links = ray.data.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "link_text": pa.array(["a", "b"], pa.string()),
        "link_url": pa.array(["https://x", "https://y"], pa.string()),
    }))
    out = str(tmp_path / "links_csv")
    write_links_csv(links, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    back = pd.concat([pd.read_csv(os.path.join(out, f)) for f in files])
    assert sorted(back["url"]) == ["u1", "u2"]


def test_page_generation_invariant_to_batch_split():
    """Per-row purity: generating doc-by-doc equals generating all at once
    — the property that makes synthesis safe to parallelize arbitrarily."""
    from full_text_extractor_v6_ray.sources.pages_gen import PageGenBatch

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"]
                         ).slice(0, 40)
    whole = PageGenBatch(42)(docs)
    parts = [PageGenBatch(42)(docs.slice(i, 1)) for i in range(40)]
    joined = pa.concat_tables(parts)
    assert whole.equals(joined)
