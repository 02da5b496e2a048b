"""TPC-H breadth batch (Q5/Q7/Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q22
analogs): every query checked against its own DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate runs
(row count + column names + order-insensitive values)."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = con.sql(sql).df()
    con.close()
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


NAMES = ["q5_local_supplier_volume", "q7_volume_shipping",
         "q13_customer_distribution", "q14_promo_revenue",
         "q15_top_supplier", "q16_parts_supplier_count",
         "q17_small_qty_revenue", "q18_large_volume_customers",
         "q19_discounted_revenue", "q22_sales_opportunity",
         "q8_market_share", "q9_product_profit", "q11_important_parts",
         "q12_shipping_priority_classes", "q20_heavy_part_suppliers",
         "q21_waiting_suppliers"]


@pytest.mark.parametrize("name", NAMES)
def test_tpch_query_matches_duckdb(ray_session, name):
    import pyarrow as pa

    import ray.data
    from full_text_extractor_v6_ray import driver_queries_tpch as t

    got = t.QUERIES[name](SF_DIR)
    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    exp = _oracle(t.ORACLES[name])
    a, b = _canon(got.copy()), _canon(exp.copy())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_sorted_lookup_empty_keys():
    # a dimension filter matching zero rows must mean "every probe
    # misses", not an IndexError inside worker tasks
    import numpy as np

    from full_text_extractor_v6_ray.driver_queries_tpch import (
        _SortedLookup,
    )

    lk = _SortedLookup(np.array([], np.int64), np.array([], np.int64),
                       np.asarray([], dtype=object))
    found, (ints, objs) = lk.get(np.array([1, 2, 3]))
    assert not found.any()
    assert ints.dtype == np.int64 and objs.dtype == object
