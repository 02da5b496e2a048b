"""ROLLUP aggregation and fixed-width histograms."""

import numpy as np
import pandas as pd


def test_rollup_agg_matches_pandas(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.cube import rollup_agg

    rng = np.random.RandomState(17)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 300),
                       "b": rng.choice(["p", "q", "r"], 300),
                       "v": rng.randint(1, 10, 300).astype(float)})
    got = rollup_agg(ray.data.from_pandas(df), ["a", "b"], "v",
                     sum_alias="s", count_alias="n").to_pandas()

    finest = df.groupby(["a", "b"]).agg(s=("v", "sum"), n=("v", "count"))
    lvl1 = df.groupby("a").agg(s=("v", "sum"), n=("v", "count"))
    total = (float(df["v"].sum()), len(df))

    assert len(got) == len(finest) + len(lvl1) + 1
    for (a, b), row in finest.iterrows():
        m = got[(got["a"] == a) & (got["b"] == b)]
        assert m["s"].iloc[0] == row["s"] and m["n"].iloc[0] == row["n"]
    for a, row in lvl1.iterrows():
        m = got[(got["a"] == a) & (got["b"] == "ALL")]
        assert m["s"].iloc[0] == row["s"] and m["n"].iloc[0] == row["n"]
    m = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    assert m["s"].iloc[0] == total[0] and m["n"].iloc[0] == total[1]


def test_fixed_width_histogram_matches_pandas(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.cube import fixed_width_histogram

    rng = np.random.RandomState(23)
    df = pd.DataFrame({"v": rng.rand(1000) * 100})
    got = (fixed_width_histogram(ray.data.from_pandas(df), "v", 10.0,
                                 sum_alias="s", count_alias="n")
           .to_pandas().sort_values("bin").reset_index(drop=True))
    exp = (df.assign(bin=np.floor(df["v"] / 10.0).astype(np.int64))
           .groupby("bin")["v"].agg(["sum", "count"]).reset_index())
    assert list(got["bin"]) == list(exp["bin"])
    assert list(got["n"]) == list(exp["count"])
    np.testing.assert_allclose(got["s"], exp["sum"], rtol=1e-12)


def test_cube_and_rollup_null_keys_match_duckdb(ray_session):
    """Null key values merge into the ALL label (COALESCE semantics) —
    they must NOT be silently dropped from coarser levels (pandas'
    default dropna=True would do exactly that)."""
    import duckdb
    import ray.data
    from full_text_extractor_v6_ray.stages.cube import cube_agg, rollup_agg

    df = pd.DataFrame({
        "a": ["x", "x", None, "y", None],
        "b": ["p", None, "p", "q", None],
        "v": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    con = duckdb.connect()
    con.register("t", df)

    for fn, sql_group in (
            (cube_agg, "CUBE(a, b)"),
            (rollup_agg, "ROLLUP(a, b)")):
        got = (fn(ray.data.from_pandas(df), ["a", "b"], "v",
                  sum_alias="s", count_alias="n")
               .to_pandas().sort_values(["a", "b", "s"])
               .reset_index(drop=True))
        exp = con.execute(f"""
            WITH c AS (SELECT COALESCE(a, 'ALL') AS a,
                              COALESCE(b, 'ALL') AS b, v FROM t)
            SELECT COALESCE(a, 'ALL') AS a, COALESCE(b, 'ALL') AS b,
                   SUM(v) AS s, CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY {sql_group}
            ORDER BY a, b, s
        """).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["a", "b", "s", "n"]], exp, check_dtype=False)


def test_gapfill_hourly_empty_input(ray_session):
    import pyarrow as pa
    import ray.data
    from full_text_extractor_v6_ray.stages.cube import gapfill_hourly

    empty = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    }))
    got = gapfill_hourly(empty, "ts", "k")
    assert got.num_rows == 0
    assert set(got.schema.names) == {"k", "hour", "n"}
