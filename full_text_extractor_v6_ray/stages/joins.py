"""Join operators Ray Data lacks natively: partitioned hash join, as-of join.

Patterns per the Ray guide ("Joins and lookups"):

  - ``bucket_hash_join``: the explicit partitioned hash join — add
    ``bucket = hash(key) % B`` to BOTH sides, tag the side, pad each side
    with the other's columns as TYPED nulls (schemas must match for
    union), union, groupby the bucket, and join the two sides pairwise
    inside each bucket group (pandas merge). ONE shuffle total; B bounds
    per-task memory; raise B to dilute hot keys.

  - ``asof_join``: same bucketing; inside each bucket sort both sides by
    (key, ts) and ``pd.merge_asof`` — each left row matched to the latest
    right row with ``right_ts <= left_ts`` for the same key.

Partitioning assumption (documented per the briefing): equal keys land in
equal buckets — guaranteed by the shared stable hash (pandas hash_array,
fixed key) on both sides.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .dedup import _stable_bucket

_SIDE = "__side"
_BUCKET = "__jbucket"


def _fields(schema) -> list[tuple[str, pa.DataType]]:
    """(name, arrow type) pairs from an arrow Schema OR PandasBlockSchema."""
    if isinstance(schema, pa.Schema):
        return [(n, schema.field(n).type) for n in schema.names]
    out = []
    for n, t in zip(schema.names, schema.types):
        if isinstance(t, pa.DataType):
            out.append((n, t))
        else:
            try:
                out.append((n, pa.from_numpy_dtype(t)))
            except Exception:
                out.append((n, pa.string()))
    return out


def _prep_side(ds: "ray.data.Dataset", key: str, side: int,
               num_buckets: int, own, other) -> "ray.data.Dataset":
    """Tag + bucket + pad to the union schema (own cols then other-only)."""
    own_names = list(own.names)
    other_only = [(n, t) for n, t in _fields(other) if n not in own_names]
    ordered = own_names + [n for n, _ in other_only]

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name, typ in other_only:
            batch = batch.append_column(name, pa.nulls(n, typ))
        batch = batch.select(ordered)
        batch = batch.append_column(_SIDE, pa.array([side] * n, pa.int8()))
        return batch.append_column(_BUCKET,
                                   _stable_bucket(batch.column(key),
                                                  num_buckets))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _split_sides(g: pd.DataFrame, lcols: list[str], rcols: list[str]):
    lg = g.loc[g[_SIDE] == 0, lcols].copy()
    rg = g.loc[g[_SIDE] == 1, rcols].copy()
    # int columns picked up nulls from the other side's padding -> pandas
    # floats; restore integer dtype where values are integral
    for df in (lg, rg):
        for c in df.columns:
            if df[c].dtype == "float64" and df[c].notna().all():
                as_int = df[c].astype("int64")
                if (as_int == df[c]).all():
                    df[c] = as_int
    return lg, rg


def bucket_hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                     left_key: str, right_key: str,
                     num_buckets: int = 32,
                     how: str = "inner") -> "ray.data.Dataset":
    """Partitioned hash join on an equality key (non-key names must differ).

    Output = left columns + right columns minus the right key.
    """
    ls, rs = left.schema().base_schema, right.schema().base_schema
    lcols, rcols = list(ls.names), list(rs.names)
    lt = _prep_side(left, left_key, 0, num_buckets, ls, rs)
    rt = _prep_side(right, right_key, 1, num_buckets, rs, ls)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg, rg = _split_sides(g, lcols, rcols)
        if lg.empty or (rg.empty and how == "inner"):
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in []})
        merged = lg.merge(rg, left_on=left_key, right_on=right_key, how=how)
        if right_key != left_key and right_key in merged.columns:
            merged = merged.drop(columns=[right_key])
        return merged

    return lt.union(rt).groupby(_BUCKET).map_groups(join_bucket,
                                                    batch_format="pandas")


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key_left: str, key_right: str,
              ts_left: str, ts_right: str,
              num_buckets: int = 32) -> "ray.data.Dataset":
    """As-of join: latest right row with ts_right <= ts_left per key.

    Left rows with no earlier right row keep nulls in right columns.
    """
    ls, rs = left.schema().base_schema, right.schema().base_schema
    lcols, rcols = list(ls.names), list(rs.names)
    rvals = [c for c in rcols if c not in (key_right, ts_right)]
    lt = _prep_side(left, key_left, 0, num_buckets, ls, rs)
    rt = _prep_side(right, key_right, 1, num_buckets, rs, ls)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg, rg = _split_sides(g, lcols, rcols)
        if lg.empty:
            return pd.DataFrame()
        lg = lg.sort_values([ts_left, key_left], kind="mergesort")
        if rg.empty:
            for c in rvals:
                lg[c] = pd.NA
            return lg
        rg = rg.sort_values([ts_right, key_right], kind="mergesort")
        merged = pd.merge_asof(
            lg, rg, left_on=ts_left, right_on=ts_right,
            left_by=key_left, right_by=key_right, direction="backward")
        if ts_right in merged.columns and ts_right != ts_left:
            merged = merged.drop(columns=[ts_right])
        if key_right in merged.columns and key_right != key_left:
            merged = merged.drop(columns=[key_right])
        return merged

    return lt.union(rt).groupby(_BUCKET).map_groups(join_bucket,
                                                    batch_format="pandas")
