"""Bench-scale documents corpus synthesis.

``DocVariantsBatch(replicate=R)`` expands each (doc_id, text) row into
R variants with a REALISTIC duplication mix for exercising the
corpus-prep pipeline at scale (the frozen correctness corpus stays
R=1; this is bench-only, mirroring ``PageGenBatch``'s replicate knob):

- variant 0           : the original text (cluster root)
- variants v%10 == 1  : EXACT copies of variant 0 (≈10% exact-dup rate
                        — collapsed by the md5 exact-dedup stage)
- variants v%10 == 2  : NEAR duplicates — original + a 2-word salt
                        suffix (changes O(1) of the L−4 word-5
                        shingles, so 5-gram Jaccard ≈ (L−6)/L stays
                        above any reasonable LSH threshold for typical
                        document lengths — caught by MinHash-LSH)
- all other variants  : UNIQUE — a variant-unique token inserted after
                        every 3rd word, so EVERY 5-word shingle
                        contains an inserted token and Jaccard vs any
                        other variant is ~0 (survives both dedups)

Deterministic (no RNG), so repeated bench runs see the identical
corpus. Variant doc_ids use the same disjoint-id stride as
``PageGenBatch``.
"""

from __future__ import annotations

import pyarrow as pa

_VARIANT_STRIDE = 10_000_019


def _unique_variant(words: list[str], v: int) -> str:
    # INSERT a variant-unique token after every 3rd word (instead of
    # mutating words): every 5-word shingle then contains at least one
    # inserted token, so Jaccard vs any other variant is ~0, while 3/4
    # of the tokens stay original — language-ID and quality signals
    # survive, so unique variants flow through the full pipeline
    # instead of dying at the quality floor. Tokens vary per position
    # (no repeated-token quality penalty).
    out: list[str] = []
    for i, w in enumerate(words):
        out.append(w)
        if i % 3 == 2:
            out.append(f"v{v}w{i}")
    return " ".join(out)


class DocVariantsBatch:
    """map_batches UDF: (doc_id, text) batch -> R-variant batch."""

    def __init__(self, replicate: int = 1):
        self.replicate = max(1, int(replicate))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        texts_out: list[str] = []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            d = int(d)
            t = t or ""
            words = t.split()
            for v in range(self.replicate):
                ids_out.append(d + v * _VARIANT_STRIDE)
                if v == 0 or v % 10 == 1:
                    texts_out.append(t)
                elif v % 10 == 2:
                    texts_out.append(t + f" salt{v} note{v}")
                else:
                    texts_out.append(_unique_variant(words, v))
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "text": pa.array(texts_out, pa.string())})
