"""Schema-evolution union: combine shards whose schemas drifted.

Evolving corpora are the norm at crawl scale — a new pipeline round
adds a quality column, an old shard lacks it, a type widened from
int32 to int64. ``union_by_name`` aligns every input to the UNIFIED
schema (pyarrow's permissive promotion: missing columns fill with
nulls, numeric types widen) and unions them — SQL's
``UNION ALL BY NAME``. Pure per-batch casts, zero shuffles; the union
is a metadata concatenation of block lists.
"""

from __future__ import annotations

import pyarrow as pa


def unified_schema(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of fields by name, first-seen order, permissive numeric
    promotion (int32|int64 -> int64, int|float -> float64)."""
    return pa.unify_schemas(schemas, promote_options="permissive")


def union_by_name(datasets: list) -> "ray.data.Dataset":
    """UNION ALL BY NAME over Ray Datasets with drifted schemas.

    Missing columns appear as typed nulls; conflicting-but-promotable
    types widen; a genuinely incompatible pair (string vs int) raises
    at plan time, not mid-stream.
    """
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    schemas = [ds.schema().base_schema for ds in datasets]
    target = unified_schema(schemas)
    names = list(target.names)

    def align(schema_has):
        def fn(batch: pa.Table) -> pa.Table:
            cols = []
            for name in names:
                typ = target.field(name).type
                if name in schema_has:
                    cols.append(batch.column(name).cast(typ))
                else:
                    cols.append(pa.nulls(batch.num_rows, typ))
            return pa.table(dict(zip(names, cols)))
        return fn

    aligned = [
        ds.map_batches(align(frozenset(s.names)), batch_format="pyarrow",
                       zero_copy_batch=True)
        for ds, s in zip(datasets, schemas)]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
