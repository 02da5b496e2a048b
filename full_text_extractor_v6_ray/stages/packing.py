"""Sequence-packing primitives for LLM training-data preparation.

``ordered_prefix_sum``: distributed running sum over a global order —
the classic two-phase parallel scan. Rows are partitioned into
ORDER-CONTIGUOUS ranges of the (integer) order key; phase 1 ships one
(range, Σv) partial per (batch, range) through a metadata-sized
aggregate whose cumulative offsets are computed on the driver
(O(num_ranges) rows — bounded and chosen, never data-scale); phase 2
is ONE bucketed shuffle on the range id, inside which each range sorts
locally and adds its broadcast offset. No global sort, no driver-side
data pass.

``chunk_assignment``: GPT-style concat-and-chunk packing — documents
are concatenated in ``order_col`` order into one virtual token stream
that is cut into fixed ``ctx``-token context windows; each document
learns its global token offset, its first window id, and how many
windows it spans. This is the deterministic packing used by most LM
pretraining data loaders (contrast first-fit bin packing, which is
order-dependent and not SQL-expressible; this one oracles exactly via
``SUM(...) OVER (ORDER BY ...)``).

Partitioning assumption (documented per the briefing): the order key is
integer and roughly uniform over its [min, max] span, so fixed-width
ranges balance; raise ``num_ranges`` to dilute skewed id spaces. A
single range's rows must fit in one task — num_ranges scales with the
cluster (default 4×CPUs via ``default_num_buckets``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import default_num_buckets

_RANGE = "__psrange"


def ordered_prefix_sum(ds: "ray.data.Dataset", order_col: str,
                       value_col: str, out_col: str = "running",
                       exclusive: bool = False,
                       num_ranges: int | None = None
                       ) -> "ray.data.Dataset":
    """Running sum of ``value_col`` in global ``order_col`` order:
    SQL ``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` (or
    ``... AND 1 PRECEDING`` when ``exclusive=True``, with 0 for the
    first row instead of NULL).

    ``order_col`` must be unique (it defines the order) and integral.
    Three narrow passes over (order, value): min/max bounds, range
    partials, and the decorated output — project before calling so
    only those two columns scan.
    """
    import ray as _ray
    from ray.data.aggregate import Max, Min

    if num_ranges is None:
        num_ranges = default_num_buckets(32)

    bounds = ds.aggregate(Min(order_col, alias_name="lo"),
                          Max(order_col, alias_name="hi"))
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:  # empty input
        return ds.map_batches(
            lambda b: b.append_column(out_col,
                                      pa.array([], pa.float64())),
            batch_format="pyarrow", zero_copy_batch=True)
    width = max(1, -(-(int(hi) - int(lo) + 1) // num_ranges))

    def rng_of(col: pa.ChunkedArray) -> pa.Array:
        k = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array((k - int(lo)) // width, pa.int64())

    def range_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            _RANGE: rng_of(batch.column(order_col)),
            "_v": pc.cast(batch.column(value_col), pa.float64()),
        })
        g = t.group_by(_RANGE).aggregate([("_v", "sum")])
        return g.rename_columns([_RANGE, "_v"])

    from ray.data.aggregate import Sum

    # O(num_ranges) rows — a chosen constant, never data-scale
    totals = (ds.map_batches(range_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(_RANGE).aggregate(Sum("_v", alias_name="_v"))
              .to_pandas().sort_values(_RANGE))
    offsets = np.zeros(num_ranges + 1, dtype=np.float64)
    np.add.at(offsets, totals[_RANGE].to_numpy() + 1,
              totals["_v"].to_numpy())
    offsets = np.cumsum(offsets)
    off_ref = _ray.put(offsets)

    def add_range(batch: pa.Table) -> pa.Table:
        return batch.append_column(_RANGE,
                                   rng_of(batch.column(order_col)))

    def decorate(g: pd.DataFrame) -> pd.DataFrame:
        off = _ray.get(off_ref)
        g = g.sort_values(order_col, kind="mergesort")
        v = g[value_col].to_numpy(dtype=np.float64)
        run = np.cumsum(v) + off[int(g[_RANGE].iloc[0])]
        if exclusive:
            run = run - v
        return g.drop(columns=[_RANGE]).assign(**{out_col: run})

    return (ds.map_batches(add_range, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(_RANGE)
            .map_groups(decorate, batch_format="pandas"))


def chunk_assignment(docs: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text", ctx: int = 2048,
                     num_ranges: int | None = None
                     ) -> "ray.data.Dataset":
    """Concat-and-chunk context-window assignment: documents are laid
    end-to-end in ``id_col`` order as one token stream; window ``i``
    covers tokens [i·ctx, (i+1)·ctx). Output per doc: token count,
    exclusive global ``start_tok``, first window ``chunk_id``, and
    ``n_chunks`` windows spanned (0 for empty docs).

    Tokens are non-whitespace runs (``\\S+``), counted vectorized by
    ``pc.count_substring_regex`` — the raw text never leaves the map
    stage; the prefix sum runs over the docs-scale (id, n_tok) table.
    """

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.cast(batch.column(text_col), pa.string()), pattern=r"\S+")
        return pa.table({
            id_col: batch.column(id_col),
            "n_tok": pc.cast(n, pa.int64()),
        })

    counts = docs.select_columns([id_col, text_col]).map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True)
    started = ordered_prefix_sum(counts, id_col, "n_tok",
                                 out_col="_start", exclusive=True,
                                 num_ranges=num_ranges)

    def finish(batch: pa.Table) -> pa.Table:
        start = batch.column("_start").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = batch.column("n_tok").to_numpy(zero_copy_only=False)
        first = start // ctx
        last = np.where(n > 0, (start + n - 1) // ctx, first)
        n_chunks = np.where(n > 0, last - first + 1, 0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tok": batch.column("n_tok"),
            "start_tok": pa.array(start, pa.int64()),
            "chunk_id": pa.array(first, pa.int64()),
            "n_chunks": pa.array(n_chunks.astype(np.int64), pa.int64()),
        })

    return started.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)
