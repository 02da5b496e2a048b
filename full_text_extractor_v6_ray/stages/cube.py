"""Hierarchical (ROLLUP) aggregation and binned histograms.

Beyond the reference's flat category statistics
(folder_processor.py:164-206 — one grouping level at a time), a
corpus-scale engine wants the SQL ROLLUP shape ("per (flag, status),
per flag, grand total" in one query) and fixed-width histograms.

Scale shapes:

- ``rollup_agg``: ONE shuffle at the finest granularity (map-side
  partials optional via Ray's groupby); every coarser level is derived
  from the finest result, which is small by construction (|key
  combinations| rows) — never a second pass over the raw rows. Level
  placeholders use an explicit ``all_label`` (never NULL) so the
  output is engine-portable.
- ``fixed_width_histogram``: per-batch vectorized floor-divide +
  bincount partials, then a tiny groupby-sum over bin ids. Bin edges
  are exact in doubles when ``width`` is a power-of-two-free constant
  shared with the oracle (division is IEEE-deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum


def _coalesce_null_keys(finest: pd.DataFrame, keys: list[str],
                        aggs: list[str], all_label: str) -> pd.DataFrame:
    """Null key values are merged into ``all_label`` BEFORE deriving
    subtotal levels — the semantics of grouping over
    ``COALESCE(k, all_label)``, which is what the DuckDB oracles do.
    (Without this, pandas' default dropna=True would silently drop
    null-key rows from every coarser level.) Re-aggregates only when a
    null actually occurs, so the non-null common case is untouched."""
    if not finest[keys].isna().any().any():
        return finest
    filled = finest.copy()
    filled[keys] = filled[keys].fillna(all_label)
    return filled.groupby(keys, dropna=False)[aggs].sum().reset_index()


def rollup_agg(ds: "ray.data.Dataset", keys: list[str], value_col: str,
               sum_alias: str = "sum_v", count_alias: str = "n",
               all_label: str = "ALL") -> pa.Table:
    """ROLLUP(keys): SUM(value_col) + COUNT(*) at every prefix level.

    Returns a (small) pyarrow Table: |finest combos| + coarser rows.
    Coarser levels re-aggregate the finest table (exact for integral
    sums; float error ~1 ulp per level, below any round-6 contract).
    Null key values merge into ``all_label`` (COALESCE semantics — see
    ``_coalesce_null_keys``); a real key value equal to ``all_label``
    is indistinguishable from the placeholder, so pick a label outside
    the key domain."""
    finest = (ds.select_columns(keys + [value_col])
              .groupby(keys)
              .aggregate(Sum(value_col, alias_name=sum_alias),
                         Count(alias_name=count_alias))
              .to_pandas())
    finest = _coalesce_null_keys(finest, keys, [sum_alias, count_alias],
                                 all_label)

    frames = [finest.copy()]
    for level in range(len(keys) - 1, -1, -1):
        kept = keys[:level]
        g = (finest.groupby(kept, dropna=False)[[sum_alias, count_alias]]
             .sum().reset_index() if kept else
             pd.DataFrame([finest[[sum_alias, count_alias]].sum()]))
        for k in keys[level:]:
            g[k] = all_label
        frames.append(g[keys + [sum_alias, count_alias]])
    out = pd.concat(frames, ignore_index=True)
    out[count_alias] = out[count_alias].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def cube_agg(ds: "ray.data.Dataset", keys: list[str], value_col: str,
             sum_alias: str = "sum_v", count_alias: str = "n",
             all_label: str = "ALL") -> pa.Table:
    """GROUP BY CUBE(keys): SUM + COUNT at every SUBSET of the keys.

    Same one-finest-shuffle shape as ``rollup_agg`` — the raw rows are
    grouped once at full granularity; all 2^|keys| subset levels are
    re-aggregations of that small finest table. Null key values merge
    into ``all_label`` (COALESCE semantics — see
    ``_coalesce_null_keys``)."""
    finest = (ds.select_columns(keys + [value_col])
              .groupby(keys)
              .aggregate(Sum(value_col, alias_name=sum_alias),
                         Count(alias_name=count_alias))
              .to_pandas())
    finest = _coalesce_null_keys(finest, keys, [sum_alias, count_alias],
                                 all_label)

    frames = []
    for mask in range(1 << len(keys)):
        kept = [k for i, k in enumerate(keys) if mask & (1 << i)]
        if len(kept) == len(keys):
            frames.append(finest.copy())
            continue
        g = (finest.groupby(kept, dropna=False)[[sum_alias, count_alias]]
             .sum().reset_index() if kept else
             pd.DataFrame([finest[[sum_alias, count_alias]].sum()]))
        for k in keys:
            if k not in kept:
                g[k] = all_label
        frames.append(g[keys + [sum_alias, count_alias]])
    out = pd.concat(frames, ignore_index=True)
    out[count_alias] = out[count_alias].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def gapfill_hourly(ds: "ray.data.Dataset", ts_col: str, key: str,
                   count_alias: str = "n") -> pa.Table:
    """Dense hourly time series per key: count of rows per (key, hour)
    with MISSING HOURS FILLED WITH ZERO over the global [min, max] hour
    span (time-series densification — downstream window/anomaly jobs
    need the zeros).

    Scale shape: the raw rows collapse in ONE hour-truncated groupby
    (map-side partials); densification runs on that result, which is
    small by construction (|keys| x |hours| rows), vectorized via a
    cross-index reindex — never a second pass over the raw rows."""
    import pyarrow.compute as pc

    def to_hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch[key],
            "hour": pc.floor_temporal(batch[ts_col], unit="hour"),
        })

    sparse = (ds.select_columns([key, ts_col])
              .map_batches(to_hour, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby([key, "hour"])
              .aggregate(Count(alias_name=count_alias))
              .to_pandas())

    if len(sparse) == 0:
        # empty input: pd.date_range(NaT, NaT) would raise — return an
        # empty table with the output schema instead
        return pa.table({
            key: pa.array([], pa.string()),
            "hour": pa.array([], pa.timestamp("us")),
            count_alias: pa.array([], pa.int64()),
        })

    hours = pd.date_range(sparse["hour"].min(), sparse["hour"].max(),
                          freq="h")
    full = pd.MultiIndex.from_product(
        [sorted(sparse[key].unique()), hours], names=[key, "hour"])
    dense = (sparse.set_index([key, "hour"])[count_alias]
             .reindex(full, fill_value=0).reset_index())
    dense[count_alias] = dense[count_alias].astype("int64")
    return pa.Table.from_pandas(dense, preserve_index=False)


def fixed_width_histogram(ds: "ray.data.Dataset", value_col: str,
                          width: float,
                          sum_alias: str = "sum_v",
                          count_alias: str = "n") -> "ray.data.Dataset":
    """Fixed-width histogram of ``value_col``: one row per occupied
    bin (``bin = floor(value / width)``) with count and sum."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        bins = np.floor(v / width).astype(np.int64)
        df = pd.DataFrame({"bin": bins, "v": v})
        g = df.groupby("bin")["v"]
        out = pd.DataFrame({"__s": g.sum(), "__n": g.count()})
        return pa.Table.from_pandas(out.reset_index(),
                                    preserve_index=False)

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("__s", alias_name=sum_alias),
                       Sum("__n", alias_name=count_alias)))
