"""Composed training-corpus preparation: the pipelines a 100 TB
pretraining-data job chains, as ONE Dataset -> Dataset function.

    raw docs
      -> exact dedup        (md5 key, in-batch combine, one bucket shuffle)
      -> language ID        (actor-pool heuristic scorer)
      -> quality scoring    (Gopher/C4-style heuristics)
      -> filter             (lang confident + quality floor, vectorized)
      -> near-dup removal   (MinHash-LSH pairs -> connected components ->
                             size-dispatched drop: broadcast np.isin when
                             the drop set is small, bucketed ANTI JOIN
                             when it is not)

Scale notes: the exact-dedup shuffle moves each surviving text body
exactly once (in-batch combine collapses batch-local dups first, so a
hot duplicated text crosses the wire O(batches) times, not O(copies));
survivors are materialized once with a lineage cut because they feed
BOTH the near-dup pair mining and the final filter (the round-2 lesson:
without the cut every consumer re-runs the scorer pools); near-dup
removal goes through ``remove_neardup_members`` — the drop set is
COUNTED first, broadcast only under ``max_broadcast_drop`` keys, and
otherwise removed with one distributed bucket_anti_join shuffle (CC
near-dup fractions run 20-40% of the corpus: the drop set must never
be assumed driver-sized).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import keyed_keep_one, materialize_rebased
from ..stages.fuzzy_dedup import (
    dup_components_ds,
    minhash_dup_pairs,
    remove_neardup_members,
)
from ..stages.text_ops import LangIdBatch, QualityScoreBatch


def _add_md5(batch: pa.Table) -> pa.Table:
    col = batch["text"].combine_chunks().cast(pa.large_binary())
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64,
                         count=len(col) + 1, offset=col.offset * 8)
    data = memoryview(col.buffers()[2])
    hashes = [hashlib.md5(data[offs[i]:offs[i + 1]]).hexdigest()
              for i in range(len(col))]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def corpus_prep(docs: "ray.data.Dataset",
                quality_min: float = 0.35,
                lang_conf_min: float = 0.05,
                neardup_threshold: float = 0.7,
                num_blocks: int = 32,
                max_broadcast_drop: int = 1_000_000,
                scorer_concurrency: tuple[int, int] = (1, 4),
                pair_mode: str = "all") -> "ray.data.Dataset":
    """docs (doc_id, text, ...) -> cleaned corpus with score columns.

    Output columns: doc_id, text, text_hash, lang_pred, lang_conf,
    n_tokens, quality (plus any passthrough input columns).
    ``max_broadcast_drop`` caps how many near-dup drop keys may take the
    broadcast fast path; larger drop sets are removed with a
    distributed anti-join (see ``remove_neardup_members``).
    ``pair_mode="star"`` mines O(k) hub edges per LSH run instead of
    O(k^2) pairs (see ``minhash_dup_pairs``) — the corpus-scale setting
    when template farms make near-dup cliques large; components (and so
    the surviving corpus) match all-pairs mode whenever hub edges pass
    signature verification.
    """
    hashed = docs.map_batches(_add_md5, batch_format="pyarrow",
                              zero_copy_batch=True)
    # exact dedup: keep the smallest doc_id per distinct text
    uniq = keyed_keep_one(hashed, "text_hash", [("doc_id", "ascending")])

    scored = (uniq
              .map_batches(LangIdBatch, batch_format="pyarrow",
                           batch_size=512,
                           concurrency=scorer_concurrency)
              .map_batches(QualityScoreBatch, batch_format="pyarrow",
                           batch_size=512,
                           concurrency=scorer_concurrency))

    def keep_quality(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch["quality"], quality_min),
                       pc.greater_equal(batch["lang_conf"], lang_conf_min))
        # negative lang_conf_min = "no language gate" (bench/synthetic
        # corpora whose text is word-soup score und across the board)
        if lang_conf_min >= 0:
            keep = pc.and_(keep, pc.not_equal(batch["lang_pred"], "und"))
        batch = batch.filter(keep)
        drop = [c for c in ("mean_token_len", "stop_ratio", "punct_ratio",
                            "digit_ratio", "max_repeat_ratio")
                if c in batch.column_names]
        return batch.drop_columns(drop)

    survivors = materialize_rebased(
        scored.map_batches(keep_quality, batch_format="pyarrow",
                           zero_copy_batch=True),
        num_blocks=num_blocks)

    # near-dup removal over the survivors (capstone shape:
    # driver_queries.q_docs_neardup_dedup): size-dispatched — broadcast
    # only when the drop set is provably small, distributed anti-join
    # otherwise; nothing corpus-scale ever lands on the driver
    pairs = minhash_dup_pairs(survivors, threshold=neardup_threshold,
                              pair_mode=pair_mode)
    comp = dup_components_ds(pairs)
    return remove_neardup_members(survivors, comp, key="doc_id",
                                  max_broadcast=max_broadcast_drop)
