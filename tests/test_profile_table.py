"""profile_table: null/distinct/min-max semantics pinned on a
hand-built table (nulls excluded from distinct and min/max, exactly
like SQL COUNT(DISTINCT)/MIN/MAX), plus the sf0.001 DuckDB oracle."""

import os

import duckdb
import pandas as pd
import pyarrow as pa


def test_semantics_with_nulls(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.stats import profile_table

    t = pa.table({
        "i": pa.array([1, 2, 2, None, 3], pa.int64()),
        "f": pa.array([1.5, None, 1.5, 2.5, None], pa.float64()),
        "s": pa.array(["a", "b", None, "a", "b"], pa.string())})
    out = profile_table(ray.data.from_arrow(t)).to_pandas() \
        .set_index("col_name")
    assert out.loc["i", "n_rows"] == 5 and out.loc["i", "n_null"] == 1
    assert out.loc["i", "n_distinct"] == 3
    assert out.loc["i", "min_val"] == 1.0 and out.loc["i", "max_val"] == 3.0
    assert out.loc["f", "n_distinct"] == 2 and out.loc["f", "n_null"] == 2
    assert out.loc["f", "sum_val"] == 5.5
    assert out.loc["s", "n_distinct"] == 2
    assert pd.isna(out.loc["s", "min_val"])


def test_matches_duckdb_sf0001(ray_session):
    from full_text_extractor_v6_ray import driver_queries as dq

    got = dq.QUERIES["lineitem_profile"](SF := "/root/testdata/sf0.001")
    got = got.to_pandas().sort_values("col_name").reset_index(drop=True)
    con = duckdb.connect()
    p = os.path.join(SF, "lineitem.parquet")
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
    exp = con.sql(dq.ORACLES["lineitem_profile"]).df() \
        .sort_values("col_name").reset_index(drop=True)
    con.close()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
