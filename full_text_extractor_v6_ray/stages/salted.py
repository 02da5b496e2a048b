"""Salted two-phase aggregation for skewed keys (north-rule skew handling).

A bare ``groupby(key)`` sends every row of a hot key to ONE reduce task.
The salted pattern splits each key into ``n_salts`` sub-keys, aggregates
the (key, salt) pairs in the shuffle, then combines the tiny per-key
partials — a hot key's work spreads over ``n_salts`` reducers.

Works for any commutative-associative aggregate; implemented here for
count/sum. (The url-dedup pipeline instead neutralizes skew with its
vectorized in-batch combine — see stages/dedup.py — but the explicit
salted shuffle is the right tool when no local combine is possible, e.g.
when each row must reach the reducer.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_SALT = "__salt"


def salted_count_sum(ds: "ray.data.Dataset", key: str,
                     sum_col: str | None = None,
                     n_salts: int = 8) -> "ray.data.Dataset":
    """groupby(key) -> (n_rows[, total]) with salt-diluted shuffle.

    Phase 1: groupby((key, salt)) partial aggregate (the only full shuffle,
    each key diluted over n_salts reducers).
    Phase 2: groupby(key) over the tiny partials.
    """
    from ray.data.aggregate import Count, Sum

    counter = {"i": 0}

    def add_salt(batch: pa.Table) -> pa.Table:
        # round-robin salt: deterministic result (aggregation is
        # salt-assignment-invariant), no RNG needed
        n = batch.num_rows
        start = counter["i"]
        counter["i"] += n
        salts = (np.arange(start, start + n) % n_salts).astype(np.int32)
        return batch.append_column(_SALT, pa.array(salts))

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True)
    aggs1 = [Count(alias_name="__n")]
    if sum_col:
        aggs1.append(Sum(sum_col, alias_name="__s"))
    partial = salted.groupby([key, _SALT]).aggregate(*aggs1)

    aggs2 = [Sum("__n", alias_name="n_rows")]
    if sum_col:
        aggs2.append(Sum("__s", alias_name="total"))
    return partial.groupby(key).aggregate(*aggs2)
