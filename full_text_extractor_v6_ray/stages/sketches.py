"""Mergeable sketches: HyperLogLog approximate distinct count.

The guide's sketch pattern: emit ONE serialized sketch per batch from
``map_batches`` (no shuffle of raw values), merge the handful of partials
at the end — sketches are designed to be mergeable, so the merge order
never matters and the result is deterministic for a given input set.

HLL with p=12 (4096 registers, ~1.6% standard error). Hashing is pinned
to the pure-numpy implementation in ``stages/hashing.py`` — register
merges require every worker to hash identically, so the hash must not
depend on a library version (advisor finding, round 2; and never
Python's salted ``hash()``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from .hashing import hash64 as _hash64

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (x > 0)."""
    n = np.zeros(len(x), dtype=np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        x[m] = x[m] << np.uint64(s)
    return n


def hll_partial(values) -> np.ndarray:
    """(M,) uint8 register array for one batch of values. Fully
    vectorized: hash -> register index / rank via clz -> maximum.at."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    # low P bits forced to 1 -> rest is never 0, rank <= 64-P+1
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)
    rank = (_clz64(rest) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for p_ in parts:
        np.maximum(out, p_, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * math.log(M / zeros)   # linear counting small-range fix
    return est


def approx_distinct(ds: "ray.data.Dataset", col: str) -> float:
    """Distributed approximate distinct count of one column."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch.column(col))
        return pa.table({"sketch": pa.array([regs.tobytes()],
                                            pa.binary(M))})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = hll_merge([np.frombuffer(p["sketch"], dtype=np.uint8)
                        for p in parts])
    return hll_estimate(merged)
