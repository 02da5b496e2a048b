"""union_by_name: missing columns become typed nulls, numeric types
widen permissively, incompatible pairs fail at plan time."""

import pandas as pd
import pyarrow as pa
import pytest


def test_union_fills_nulls_and_widens(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.schema_evo import union_by_name

    a = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int32()),
        "v": pa.array([1.0, 2.0], pa.float64())}))
    b = ray.data.from_arrow(pa.table({
        "id": pa.array([3, 4], pa.int64()),
        "tag": pa.array(["x", "y"], pa.string())}))
    out = union_by_name([a, b])
    t = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")),
        promote_options="permissive")
    assert t.schema.field("id").type == pa.int64()  # widened
    df = t.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2, 3, 4]
    assert pd.isna(df.loc[2, "v"]) and pd.isna(df.loc[0, "tag"])
    assert df.loc[3, "tag"] == "y"


def test_incompatible_types_fail_at_plan_time(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.schema_evo import union_by_name

    a = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    b = ray.data.from_arrow(pa.table({"k": pa.array(["s"], pa.string())}))
    with pytest.raises(Exception):
        union_by_name([a, b])
