"""Partitioned hash join, as-of join, HLL sketch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_bucket_hash_join_matches_pandas(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.joins import bucket_hash_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": rng.randint(0, 50, 300),
                         "lv": np.arange(300)})
    right = pd.DataFrame({"rk": np.arange(50), "rv": np.arange(50) * 10})
    got = bucket_hash_join(ray.data.from_pandas(left),
                           ray.data.from_pandas(right),
                           "k", "rk", num_buckets=8).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    exp = exp[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.joins import asof_join

    rng = np.random.RandomState(5)
    left = pd.DataFrame({
        "k": rng.randint(0, 10, 200),
        "lts": pd.to_datetime("2025-01-01")
               + pd.to_timedelta(rng.randint(0, 10_000, 200), unit="m"),
        "lv": np.arange(200),
    })
    right = pd.DataFrame({
        "rk": rng.randint(0, 10, 80),
        "rts": pd.to_datetime("2025-01-01")
               + pd.to_timedelta(rng.randint(0, 10_000, 80), unit="m"),
        "rv": np.arange(80) * 3,
    })
    # dedupe right per (rk, rts) so the as-of match is unambiguous
    right = (right.sort_values("rv").groupby(["rk", "rts"], as_index=False)
             .last())

    got = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    "k", "rk", "lts", "rts", num_buckets=4).to_pandas()

    exp = pd.merge_asof(left.sort_values(["lts", "k"], kind="mergesort"),
                        right.sort_values(["rts", "rk"], kind="mergesort"),
                        left_on="lts", right_on="rts",
                        left_by="k", right_by="rk",
                        direction="backward").drop(columns=["rts"])
    key = ["k", "lts", "lv"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert list(got["lv"]) == list(exp["lv"])
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), exp["rv"].astype("float64"),
        check_names=False)


def test_hll_accuracy(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.sketches import approx_distinct

    n_distinct = 5000
    vals = np.arange(n_distinct).repeat(3)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    est = approx_distinct(ds, "v")
    assert abs(est - n_distinct) / n_distinct < 0.05


def test_hll_merge_order_invariant():
    from full_text_extractor_v6_ray.stages.sketches import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    a = hll_partial(list(range(0, 1000)))
    b = hll_partial(list(range(500, 1500)))
    ab = hll_estimate(hll_merge([a, b]))
    ba = hll_estimate(hll_merge([b, a]))
    assert ab == ba
    assert abs(ab - 1500) / 1500 < 0.08
