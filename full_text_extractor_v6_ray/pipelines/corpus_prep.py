"""Composed training-corpus preparation: the pipelines a 100 TB
pretraining-data job chains, as ONE Dataset -> Dataset function.

    raw docs
      -> exact dedup        (md5 key, in-batch combine, one bucket shuffle)
      -> language ID        (actor-pool heuristic scorer)
      -> quality scoring    (Gopher/C4-style heuristics)
      -> filter             (lang confident + quality floor, vectorized)
      -> near-dup removal   (MinHash-LSH pairs -> connected components ->
                             broadcast tiny drop set, vectorized filter)

Scale notes: the exact-dedup shuffle moves each surviving text body
exactly once (in-batch combine collapses batch-local dups first, so a
hot duplicated text crosses the wire O(batches) times, not O(copies));
survivors are materialized once with a lineage cut because they feed
BOTH the near-dup pair mining and the final filter (the round-2 lesson:
without the cut every consumer re-runs the scorer pools); the near-dup
drop set covers only near-dup nodes — tiny vs the corpus — so it
broadcasts via ray.put and the removal stays a vectorized np.isin.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import keyed_keep_one, materialize_rebased
from ..stages.fuzzy_dedup import dup_components_ds, minhash_dup_pairs
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
                num_blocks: int = 32) -> "ray.data.Dataset":
    """docs (doc_id, text, ...) -> cleaned corpus with score columns.

    Output columns: doc_id, text, text_hash, lang_pred, lang_conf,
    n_tokens, quality (plus any passthrough input columns).
    """
    import ray

    hashed = docs.map_batches(_add_md5, batch_format="pyarrow",
                              zero_copy_batch=True)
    # exact dedup: keep the smallest doc_id per distinct text
    uniq = keyed_keep_one(hashed, "text_hash", [("doc_id", "ascending")])

    scored = (uniq
              .map_batches(LangIdBatch, batch_format="pyarrow",
                           batch_size=512, concurrency=(1, 4))
              .map_batches(QualityScoreBatch, batch_format="pyarrow",
                           batch_size=512, concurrency=(1, 4)))

    def keep_quality(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(batch["quality"], quality_min),
                    pc.greater_equal(batch["lang_conf"], lang_conf_min)),
            pc.not_equal(batch["lang_pred"], "und"))
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
    # driver_queries.q_docs_neardup_dedup)
    pairs = minhash_dup_pairs(survivors, threshold=neardup_threshold)
    comp = dup_components_ds(pairs).to_pandas()
    if "doc_id" in comp.columns:   # empty Dataset.to_pandas loses columns
        d = comp["doc_id"].to_numpy(dtype=np.int64)
        c = comp["component"].to_numpy(dtype=np.int64)
        drop = np.sort(d[d != c])
    else:
        drop = np.empty(0, dtype=np.int64)
    drop_ref = ray.put(drop)

    class DropNearDups:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(~np.isin(ids, self.drop)))

    return survivors.map_batches(DropNearDups, batch_format="pyarrow",
                                 batch_size=1024, concurrency=(1, 2))
