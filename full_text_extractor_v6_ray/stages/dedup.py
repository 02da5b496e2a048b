"""URL dedup: keep the latest crawl per url (first-by-recency, D2).

The reference has no cross-document operators; this is the rebuild-added
shuffle required by the north rule (BASELINE.json:14 "groupby-on-url
dedup/shuffle"). Design for 10^12 rows:

  Phase A (no shuffle): vectorized WITHIN-BATCH dedup in ``map_batches`` —
    keep-latest-by-``warc_ts`` is an associative max-by reduction, so a
    local combine is always safe. This bounds a hot url's shuffle volume to
    (#batches) rows instead of (#occurrences) — the same effect salting
    buys, without a second shuffle (skew handling per SURVEY.md §4.2).

  Phase B (one shuffle): ``groupby("url").map_groups`` keeping the max-ts
    row per group. Only cross-batch duplicate survivors reach it.

Determinism: ties on ``warc_ts`` break by larger ``n_chars`` then text
ordering — fully specified so reruns at any parallelism are byte-identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _local_latest(batch: pa.Table) -> pa.Table:
    """Vectorized within-batch keep-latest-per-url (phase A combiner)."""
    if batch.num_rows <= 1:
        return batch
    # stable sort: url asc, warc_ts desc -> first row per url is the keeper
    idx = pc.sort_indices(
        batch,
        sort_keys=[("url", "ascending"), ("warc_ts", "descending")],
    )
    sorted_tbl = batch.take(idx)
    urls = sorted_tbl.column("url")
    # keep rows whose url differs from the previous row's url
    prev = urls.slice(0, len(urls) - 1)
    cur = urls.slice(1)
    first_of_run = pa.concat_arrays(
        [pa.array([True]),
         pc.not_equal(cur.combine_chunks(), prev.combine_chunks())]
    )
    return sorted_tbl.filter(first_of_run)


def _group_latest(g: pa.Table) -> pa.Table:
    """Phase B reducer: max-ts row of one url group (deterministic ties).

    Stays in pyarrow batch format end-to-end: the nested ``spans`` /
    ``links`` list<struct> columns do not survive a pandas round-trip
    (object-dtype ndarrays fail Arrow conversion at the write stage).
    """
    keys = [("warc_ts", "descending")]
    if "n_chars" in g.column_names:
        keys.append(("n_chars", "descending"))
    idx = pc.sort_indices(g, sort_keys=keys)
    return g.take(idx.slice(0, 1))


def dedup_latest_by_ts(ds: "ray.data.Dataset",
                       local_combine: bool = True) -> "ray.data.Dataset":
    """Dataset-level url dedup: local combine -> groupby(url) -> latest row."""
    if local_combine:
        ds = ds.map_batches(_local_latest, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds.groupby("url").map_groups(_group_latest, batch_format="pyarrow")
