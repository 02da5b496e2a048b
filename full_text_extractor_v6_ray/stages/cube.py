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


def hopping_window_agg(ds: "ray.data.Dataset", ts_col: str,
                       window_s: int, slide_s: int,
                       value_col: str | None = None,
                       count_alias: str = "n",
                       sum_alias: str = "sum_v") -> "ray.data.Dataset":
    """Hopping (overlapping sliding) event-time window aggregate: count
    (and optional sum of ``value_col``) of events per window
    ``[ws, ws + window_s)``, window starts aligned to ``slide_s``.
    An event at time t belongs to exactly ``k = window_s // slide_s``
    windows. Streaming-analytics shape the reference's flat category
    stats (folder_processor.py:164-206) can't express.

    Scale shape: the k-fold expansion is NEVER materialized row-wise.
    Each batch first collapses to per-slide-slot partials (one row per
    occupied slide slot — vectorized np.unique + np.add.at), and only
    those partials are replicated k times (slot - i for i in 0..k-1),
    so the shuffle carries O(k x occupied-slots-per-batch) rows, not
    O(k x rows). One tiny groupby-sum over window starts finishes it.

    Windows with zero events are absent from the output (densify with
    ``gapfill_hourly``-style reindex downstream if needed).
    """
    import pyarrow.compute as pc

    if window_s % slide_s != 0:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s
    slide_us = slide_s * 1_000_000
    cols = [ts_col] + ([value_col] if value_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        # null timestamps carry no event time — drop explicitly (a null
        # would otherwise surface as NaN after the numpy conversion and
        # poison the slot arithmetic)
        batch = batch.filter(pc.is_valid(batch.column(ts_col)))
        if batch.num_rows == 0:
            out = {"__ws_slot": pa.array([], pa.int64()),
                   "__n": pa.array([], pa.int64())}
            if value_col:
                out["__s"] = pa.array([], pa.float64())
            return pa.table(out)
        # normalize to us first: parquet carries timestamp[us] but
        # pandas-born datasets carry timestamp[ns] — the int cast must
        # mean the same epoch unit everywhere
        ts_us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        # epoch values are positive; numpy // floors like the DuckDB
        # BIGINT // the oracle uses
        slots = ts_us // slide_us
        uniq, inv = np.unique(slots, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        if value_col:
            v = batch.column(value_col).to_numpy(zero_copy_only=False)
            s = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(s, inv, v)
        # each occupied slot s contributes to windows starting at
        # slot s-i, i in 0..k-1 (all satisfy ws <= t < ws + window)
        offs = np.arange(k, dtype=np.int64)
        ws = (uniq[:, None] - offs[None, :]).ravel()
        out = {"__ws_slot": pa.array(ws, pa.int64()),
               "__n": pa.array(np.repeat(n, k), pa.int64())}
        if value_col:
            out["__s"] = pa.array(np.repeat(s, k), pa.float64())
        return pa.table(out)

    aggs = [Sum("__n", alias_name=count_alias)]
    if value_col:
        aggs.append(Sum("__s", alias_name=sum_alias))
    agg = (ds.select_columns(cols)
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("__ws_slot")
           .aggregate(*aggs))

    def finish(batch: pa.Table) -> pa.Table:
        ws = pc.cast(pc.multiply(batch.column("__ws_slot"),
                                 pa.scalar(slide_us, pa.int64())),
                     pa.timestamp("us"))
        out = {"ws": ws, count_alias: batch.column(count_alias)}
        if value_col:
            out[sum_alias] = pc.round(batch.column(sum_alias), ndigits=2)
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True).sort("ws")


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


def grouping_sets_agg(ds: "ray.data.Dataset", keys: list[str],
                      sets: list[list[str]], value_col: str,
                      sum_alias: str = "sum_v", count_alias: str = "n",
                      all_label: str = "ALL") -> pa.Table:
    """GROUP BY GROUPING SETS(sets): SUM + COUNT at each requested
    subset of ``keys`` — the general form of which ROLLUP (prefixes)
    and CUBE (all subsets) are special cases.

    Same one-finest-shuffle shape as ``cube_agg``: the raw rows are
    grouped ONCE at the union granularity of all requested sets; every
    set is then a re-aggregation of that dimension-sized finest table
    (driver-side pandas on |finest combos| rows — never the raw data).
    Columns absent from a set are emitted as ``all_label`` (the
    COALESCE(k, 'ALL') presentation the oracles use); null key values
    merge into ``all_label`` first (see ``_coalesce_null_keys``)."""
    for s in sets:
        unknown = [k for k in s if k not in keys]
        if unknown:
            raise ValueError(f"grouping set {s} not within keys: {unknown}")
    finest = (ds.select_columns(keys + [value_col])
              .groupby(keys)
              .aggregate(Sum(value_col, alias_name=sum_alias),
                         Count(alias_name=count_alias))
              .to_pandas())
    finest = _coalesce_null_keys(finest, keys, [sum_alias, count_alias],
                                 all_label)

    frames = []
    for s in sets:
        kept = [k for k in keys if k in s]
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
