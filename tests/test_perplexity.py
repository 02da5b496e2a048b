"""Unigram-LM perplexity bucketing (CCNet head/middle/tail)."""

import math

import numpy as np
import pandas as pd


def test_perplexity_scores_closed_form(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.text_ops import (
        perplexity_buckets)

    # corpus: 6 tokens total — "a" x3, "b" x2, "c" x1
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a", "b b", "c"],
    })
    got = (perplexity_buckets(ray.data.from_pandas(docs), "doc_id",
                              "text", n_buckets=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    lp = {t: math.log(c / 6) for t, c in (("a", 3), ("b", 2), ("c", 1))}
    exp = [round(lp["a"], 6), round(lp["b"], 6), round(lp["c"], 6)]
    assert np.allclose(got["avg_logprob"], exp)
    assert got["n_tokens"].tolist() == [3, 2, 1]
    # common tokens -> high logprob -> bucket 1 (head); rare -> 3 (tail)
    assert got["bucket"].tolist() == [1, 2, 3]


def test_perplexity_buckets_roughly_equal_population(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.text_ops import (
        perplexity_buckets)

    rng = np.random.RandomState(41)
    vocab = [f"w{i}" for i in range(50)]
    # zipf-ish token draws so docs genuinely differ in mean logprob
    p = 1.0 / np.arange(1, 51)
    p /= p.sum()
    docs = pd.DataFrame({
        "doc_id": np.arange(90, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=30, p=p))
                 for _ in range(90)],
    })
    got = (perplexity_buckets(ray.data.from_pandas(docs), "doc_id",
                              "text", n_buckets=3).to_pandas())
    sizes = got.groupby("bucket").size()
    assert set(sizes.index) == {1, 2, 3}
    # disc cutoffs on 90 docs: each tier within a few of 30 (ties move
    # a handful across the boundary, never a whole tier)
    assert sizes.min() >= 20 and sizes.max() <= 40
