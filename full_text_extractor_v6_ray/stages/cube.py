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


def rollup_agg(ds: "ray.data.Dataset", keys: list[str], value_col: str,
               sum_alias: str = "sum_v", count_alias: str = "n",
               all_label: str = "ALL") -> pa.Table:
    """ROLLUP(keys): SUM(value_col) + COUNT(*) at every prefix level.

    Returns a (small) pyarrow Table: |finest combos| + coarser rows.
    Coarser levels re-aggregate the finest table (exact for integral
    sums; float error ~1 ulp per level, below any round-6 contract).
    """
    finest = (ds.select_columns(keys + [value_col])
              .groupby(keys)
              .aggregate(Sum(value_col, alias_name=sum_alias),
                         Count(alias_name=count_alias))
              .to_pandas())

    frames = [finest.copy()]
    for level in range(len(keys) - 1, -1, -1):
        kept = keys[:level]
        g = (finest.groupby(kept)[[sum_alias, count_alias]].sum()
             .reset_index() if kept else
             pd.DataFrame([finest[[sum_alias, count_alias]].sum()]))
        for k in keys[level:]:
            g[k] = all_label
        frames.append(g[keys + [sum_alias, count_alias]])
    out = pd.concat(frames, ignore_index=True)
    out[count_alias] = out[count_alias].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


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
