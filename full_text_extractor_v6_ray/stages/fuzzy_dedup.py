"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (guide: "Aggregation at scale" / MinHash-LSH pattern):

  MinHash+LSH:  per-batch shingle->minhash signatures (numpy, vectorized)
                -> flat explode to (band_id, band_hash, doc_id) rows
                -> groupby band bucket (the ONLY shuffle; bucket rows are
                   tiny fixed-width ints, never the text)
                -> candidate pairs inside each bucket
                -> verify by minhash-signature agreement (est. Jaccard)
  SimHash:      64-bit signature per doc; 4x16-bit band buckets -> pairs
                with Hamming distance <= max_hamming.
  n-gram Jaccard: exact verification kernel used on candidate pairs.

Signatures travel as fixed-width binary/int columns; connected components
are NOT computed here (pairs are the output — at 10^12 scale components
need iterative min-label propagation, see ``dup_components``).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .text_ops import shingle_hashes

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 minhash signature of a shingle-hash set."""
    if len(sh) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (num_perm, n_shingles) universal hashing mod Mersenne prime
    x = (np.outer(a, sh) + b[:, None]) % _MERSENNE
    return x.min(axis=1)


class MinHashBatch:
    """documents batch -> + minhash signature column (fixed binary).

    num_perm=128, bands 16 x rows 8 (LSH threshold ~ (1/b)^(1/r) ≈ 0.71).
    Permutation params generated once per actor from the seed.
    """

    def __init__(self, text_col: str = "text", num_perm: int = 128,
                 shingle_k: int = 3, seed: int = 42):
        self.text_col = text_col
        self.num_perm = num_perm
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch.column(self.text_col).to_pylist():
            sig = minhash_signature(shingle_hashes(t or "", self.k),
                                    self.a, self.b)
            sigs.append(sig.tobytes())
        return batch.append_column(
            "minhash", pa.array(sigs, pa.binary(self.num_perm * 8)))


def explode_bands(batch: pa.Table, num_perm: int = 128,
                  bands: int = 16) -> pa.Table:
    """(doc_id, minhash) -> one row per band: (band_id, band_hash, doc_id)."""
    rows_per_band = num_perm // bands
    doc_ids, band_ids, band_hashes, sigs = [], [], [], []
    for doc_id, sig in zip(batch["doc_id"].to_pylist(),
                           batch["minhash"].to_pylist()):
        arr = np.frombuffer(sig, dtype=np.uint64)
        for bi in range(bands):
            seg = arr[bi * rows_per_band:(bi + 1) * rows_per_band]
            bh = hashlib.md5(seg.tobytes()).digest()[:8]
            doc_ids.append(doc_id)
            band_ids.append(bi)
            band_hashes.append(int.from_bytes(bh, "little"))
            sigs.append(sig)
    return pa.table({
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hashes, pa.uint64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
        "minhash": pa.array(sigs, pa.binary(len(batch["minhash"][0].as_py()))),
    })


def _bucket_pairs(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Candidate pairs within one (band_id, band_hash) bucket, verified by
    minhash-signature agreement (unbiased Jaccard estimate)."""
    docs = sorted(set(zip(g["doc_id"], g["minhash"])))
    out_a, out_b, est = [], [], []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a_id, a_sig = docs[i]
            b_id, b_sig = docs[j]
            sa = np.frombuffer(a_sig, dtype=np.uint64)
            sb = np.frombuffer(b_sig, dtype=np.uint64)
            jac = float((sa == sb).mean())
            if jac >= threshold:
                out_a.append(min(a_id, b_id))
                out_b.append(max(a_id, b_id))
                est.append(round(jac, 6))
    return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                         "doc_b": pd.Series(out_b, dtype="int64"),
                         "est_jaccard": pd.Series(est, dtype="float64")})


def minhash_dup_pairs(docs: "ray.data.Dataset", text_col: str = "text",
                      threshold: float = 0.8, num_perm: int = 128,
                      bands: int = 16, seed: int = 42) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dup pipeline -> distinct (doc_a, doc_b, est_jaccard)."""
    sigs = docs.map_batches(
        MinHashBatch, fn_constructor_kwargs={
            "text_col": text_col, "num_perm": num_perm, "seed": seed},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
    banded = sigs.map_batches(
        lambda b: explode_bands(b, num_perm, bands), batch_format="pyarrow")
    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, threshold), batch_format="pandas")
    # a pair found in multiple bands appears multiple times -> distinct
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashBatch:
    """64-bit SimHash per document over token hashes (unweighted)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> int:
        from .text_ops import token_hashes

        toks = (text or "").lower().split()
        if not toks:
            return 0
        th = token_hashes(toks)
        # (n_tokens, 64) bit matrix -> column sums -> sign
        bitmat = ((th[:, None] & self.bits[None, :]) != 0)
        votes = bitmat.sum(axis=0) * 2 - len(th)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= self.bits[i]
        return int(sig)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in
                batch.column(self.text_col).to_pylist()]
        return batch.append_column("simhash", pa.array(sigs, pa.uint64()))


def simhash_dup_pairs(docs: "ray.data.Dataset", text_col: str = "text",
                      max_hamming: int = 3) -> "ray.data.Dataset":
    """SimHash near-dup pairs via 4x16-bit band bucketing.

    Two signatures within Hamming distance <= 3 agree exactly on at least
    one of 4 disjoint 16-bit bands (pigeonhole) -> bucket by each band,
    verify distance inside buckets.
    """
    sigs = docs.map_batches(SimHashBatch,
                            fn_constructor_kwargs={"text_col": text_col},
                            batch_format="pyarrow", batch_size=256,
                            concurrency=(1, 4))

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, keys, sims = [], [], [], []
        for d, s in zip(batch["doc_id"].to_pylist(),
                        batch["simhash"].to_pylist()):
            s = int(s)
            for bi in range(4):
                doc_ids.append(d)
                band_ids.append(bi)
                keys.append((s >> (16 * bi)) & 0xFFFF)
                sims.append(s)
        return pa.table({"band_id": pa.array(band_ids, pa.int32()),
                         "band_key": pa.array(keys, pa.int32()),
                         "doc_id": pa.array(doc_ids, pa.int64()),
                         "simhash": pa.array(sims, pa.uint64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        docs_ = sorted(set(zip(g["doc_id"], g["simhash"])))
        a_out, b_out, dist = [], [], []
        for i in range(len(docs_)):
            for j in range(i + 1, len(docs_)):
                d = bin(int(docs_[i][1]) ^ int(docs_[j][1])).count("1")
                if d <= max_hamming:
                    a_out.append(min(docs_[i][0], docs_[j][0]))
                    b_out.append(max(docs_[i][0], docs_[j][0]))
                    dist.append(d)
        return pd.DataFrame({"doc_a": pd.Series(a_out, dtype="int64"),
                             "doc_b": pd.Series(b_out, dtype="int64"),
                             "hamming": pd.Series(dist, dtype="int64")})

    banded = sigs.map_batches(explode, batch_format="pyarrow")
    pairs = banded.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification kernel; also usable standalone)
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact k-word-shingle Jaccard similarity."""
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def dup_components(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over a (small, already-filtered) pair list ->
    (doc_id, component) — driver-side; at scale replace with iterative
    min-label propagation (groupby rounds)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs_df["doc_a"]) | set(pairs_df["doc_b"]))
    return pd.DataFrame({"doc_id": pd.Series(nodes, dtype="int64"),
                         "component": pd.Series([find(int(n)) for n in nodes],
                                                dtype="int64")})
