"""co_occurrence_edges + triangle_count: DuckDB-oracle equality over
the co-supplier graph, plus a hand-built graph where the count is
known."""

import os

import duckdb
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_known_graph(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.pagerank import triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 more)
    edges = pd.DataFrame({
        "s1": [1, 1, 1, 2, 2, 3, 4],
        "s2": [2, 3, 4, 3, 4, 4, 5]})
    assert triangle_count(ray.data.from_pandas(edges)) == 4


def test_cosupplier_matches_duckdb(ray_session):
    from full_text_extractor_v6_ray import driver_queries as dq

    got = dq.QUERIES["cosupplier_triangles"](SF_DIR)
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    p = os.path.join(SF_DIR, "lineitem.parquet")
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
    exp = con.sql(dq.ORACLES["cosupplier_triangles"]).df()
    con.close()
    assert got["n_edges"].iloc[0] == exp["n_edges"].iloc[0]
    assert got["n_triangles"].iloc[0] == exp["n_triangles"].iloc[0]
    assert got["n_triangles"].iloc[0] > 0  # non-trivial at sf0.001
