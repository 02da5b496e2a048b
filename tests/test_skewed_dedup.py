"""Planted-key-skew dedup: the north rule's 'skewed hosts' case.

A hot url (50% of all rows — one host's page re-crawled relentlessly)
must neither break correctness nor concentrate the shuffle: the
map-side combine in keyed_keep_one collapses each batch's duplicates
to ONE row per url BEFORE the bucket shuffle, so the hot key crosses
the wire O(n_batches) times, not O(n_rows).
"""

import numpy as np
import pandas as pd


def _skewed(n=20_000, hot_frac=0.5, seed=3):
    rng = np.random.RandomState(seed)
    hot = int(n * hot_frac)
    urls = np.array(
        ["https://hot.example/page"] * hot
        + [f"https://site{i % 97}.example/p{i}" for i in range(n - hot)])
    rng.shuffle(urls)
    return pd.DataFrame({
        "url": urls,
        "warc_ts": (pd.Timestamp("2024-01-01")
                    + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s")),
        "payload": rng.randint(0, 1 << 30, n),
    })


def test_skewed_url_dedup_correct(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.dedup import dedup_latest_by_ts

    df = _skewed()
    ds = ray.data.from_pandas(df).repartition(16)
    got = (dedup_latest_by_ts(ds, tie_break=("payload", "descending"))
           .to_pandas().sort_values("url").reset_index(drop=True))

    exp = (df.sort_values(["url", "warc_ts", "payload"],
                          ascending=[True, False, False], kind="mergesort")
           .drop_duplicates("url").sort_values("url")
           .reset_index(drop=True))
    assert len(got) == df["url"].nunique()
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["warc_ts"].tolist() == exp["warc_ts"].tolist()
    assert got["payload"].tolist() == exp["payload"].tolist()


def test_skew_combine_bounds_shuffle_rows(ray_session):
    """The hot key's post-combine row count is bounded by the number of
    map batches, never by its raw multiplicity."""
    import pyarrow as pa
    import ray.data
    from full_text_extractor_v6_ray.stages.dedup import _keep_first_of_runs

    df = _skewed(n=8_000)
    # simulate the map side: one combine per batch of 1000
    total_hot_after = 0
    for start in range(0, len(df), 1000):
        chunk = pa.Table.from_pandas(df.iloc[start:start + 1000],
                                     preserve_index=False)
        combined = _keep_first_of_runs(
            chunk, "url",
            [("warc_ts", "descending"), ("payload", "descending")])
        urls = combined["url"].to_pylist()
        assert len(urls) == len(set(urls))  # <=1 row per url per batch
        total_hot_after += urls.count("https://hot.example/page")
    assert total_hot_after == 8  # one per batch — 4000 raw rows collapsed
