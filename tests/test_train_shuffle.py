"""Deterministic training-order shuffle: DuckDB-oracle equality plus
the property the operator exists for — the (shard, pos) assignment is
a pure function of (key, seed), so repartitioning cannot change it."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    p = os.path.join(SF_DIR, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{p}')")
    out = con.sql(sql).df()
    con.close()
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", ["docs_train_order",
                                  "docs_shard_manifest"])
def test_matches_duckdb(ray_session, name):
    import ray.data
    from full_text_extractor_v6_ray import driver_queries as dq

    got = dq.QUERIES[name](SF_DIR)
    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    exp = _oracle(dq.ORACLES[name])
    a, b = _canon(got.copy()), _canon(exp.copy())
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_shuffle_stable_under_repartitioning(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.sampling import (
        deterministic_shuffle,
    )

    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"])
    a = deterministic_shuffle(ds, "doc_id", seed=7,
                              num_shards=16).to_pandas()
    b = deterministic_shuffle(ds.repartition(13), "doc_id", seed=7,
                              num_shards=16).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # every shard's positions are exactly 0..len-1
    for _, g in a.groupby("shard"):
        assert np.array_equal(np.sort(g["pos"].to_numpy()),
                              np.arange(len(g)))


def test_shuffle_seed_changes_order(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.sampling import (
        deterministic_shuffle,
    )

    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"])
    a = deterministic_shuffle(ds, "doc_id", seed=1,
                              num_shards=16).to_pandas()
    b = deterministic_shuffle(ds, "doc_id", seed=2,
                              num_shards=16).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert not a[["shard", "pos"]].equals(b[["shard", "pos"]])


def test_shuffle_default_shards(ray_session):
    # the signature default must be a value its own validation accepts
    import ray.data
    from full_text_extractor_v6_ray.stages.sampling import (
        deterministic_shuffle,
    )

    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"])
    out = deterministic_shuffle(ds, "doc_id").to_pandas()
    assert len(out) == ds.count() and out["shard"].nunique() <= 16
