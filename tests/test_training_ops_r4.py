"""Round-4 training-data operators: dataset-scale k-means,
decontamination, duplicate n-gram spans, stratified/mixture sampling."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# k-means over a Dataset
# ---------------------------------------------------------------------------

def _blob_table(n_per=40, d=8, seed=7):
    """3 well-separated gaussian blobs; returns (table, true_label)."""
    rng = np.random.RandomState(seed)
    centers = np.array([[10.0] * d, [-10.0] * d,
                        [10.0] * (d // 2) + [-10.0] * (d - d // 2)])
    vecs, labels = [], []
    for c in range(3):
        vecs.append(centers[c] + rng.randn(n_per, d) * 0.5)
        labels += [c] * n_per
    M = np.vstack(vecs).astype(np.float32)
    ids = np.arange(len(M), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
    })
    return tbl, np.array(labels)


def test_kmeans_recovers_planted_blobs(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.embed import (kmeans_assign,
                                                         kmeans_fit_ds)

    tbl, truth = _blob_table()
    ds = ray.data.from_arrow(tbl)
    cent = kmeans_fit_ds(ds, k=3, n_iter=25)
    assert cent.shape == (3, 8)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    # cluster ids are arbitrary — check the PARTITION matches the blobs
    for c in range(3):
        members = got[truth == c]
        assert (members == members[0]).all()
    assert len(set(got[truth == 0]) | set(got[truth == 1])
               | set(got[truth == 2])) == 3


def test_kmeans_deterministic_across_runs(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.embed import kmeans_fit_ds

    tbl, _ = _blob_table(seed=11)
    ds = ray.data.from_arrow(tbl)
    c1 = kmeans_fit_ds(ds, k=3, n_iter=10)
    c2 = kmeans_fit_ds(ds, k=3, n_iter=10)
    assert np.array_equal(c1, c2)


def test_kmeans_k_larger_than_batch_and_empty_cluster(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.embed import (kmeans_assign,
                                                         kmeans_fit_ds)

    # two tight blobs, k=4: two clusters must go (and stay) empty
    # without NaNs — empty clusters keep their seed centroid.
    tbl, _ = _blob_table(n_per=5, d=4, seed=3)
    ds = ray.data.from_arrow(tbl)
    cent = kmeans_fit_ds(ds, k=4, n_iter=5)
    assert np.isfinite(cent).all()
    out = kmeans_assign(ds, cent).to_pandas()
    assert len(out) == 15


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_drops_needle_docs(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.text_ops import decontaminate

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "completely unrelated content here",
            "prefix then the quick brown fox tail",   # contains needle
            None,                                      # null text survives
            "the quick brown",                         # partial — survives
        ]),
    })
    ds = ray.data.from_arrow(docs)
    out = decontaminate(ds, ["the quick brown fox"]).to_pandas()
    assert sorted(out["doc_id"]) == [2, 4, 5]


def test_decontaminate_ignores_empty_needles(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.text_ops import decontaminate

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["aa", "bb"])})
    out = decontaminate(ray.data.from_arrow(docs), ["", "zz"]).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


# ---------------------------------------------------------------------------
# duplicate n-gram spans
# ---------------------------------------------------------------------------

def test_dup_ngram_counts_planted(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.fuzzy_dedup import dup_ngram_counts

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"           # exactly one 8-gram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c " + shared + " x y z",          # shares 1 gram w/ doc 2
            shared,                                 # shares 1 gram w/ doc 1
            "p q r s t u v w unique tail here ok",  # no shared grams
            "too short",                            # < 8 tokens -> no grams
        ]),
    })
    out = dup_ngram_counts(ray.data.from_arrow(docs), n=8).to_pandas()
    got = dict(zip(out["doc_id"], out["n_dup_ngrams"]))
    assert got == {1: 1, 2: 1}


def test_dup_ngram_distinct_within_doc(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.fuzzy_dedup import dup_ngram_counts

    # the same 8-gram repeated twice INSIDE one doc does not make it a
    # cross-doc duplicate (per-doc distinct grams)
    g = "a b c d e f g h"
    docs = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([g + " " + g]),
    })
    out = dup_ngram_counts(ray.data.from_arrow(docs), n=8).to_pandas()
    # doc 1 has internal repeats only — grams spanning the junction are
    # unique, and the repeated gram has just one distinct doc
    assert out.empty or 1 not in set(out["doc_id"])


# ---------------------------------------------------------------------------
# stratified / mixture sampling
# ---------------------------------------------------------------------------

def _md5p(v):
    return hashlib.md5(str(v).encode()).hexdigest()[:8]


def test_stratified_hash_sample_exact_membership(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.sampling import (
        floor_threshold, stratified_hash_sample)

    n = 400
    ids = np.arange(n, dtype=np.int64)
    strata = np.array(["a", "b", "c", "d"])[ids % 4]
    tbl = pa.table({"k": pa.array(ids), "s": pa.array(strata)})
    rates = {"a": 0.5, "b": 1.0, "c": 0.0, "d": 0.125}
    out = stratified_hash_sample(ray.data.from_arrow(tbl), "k", "s",
                                 rates).to_pandas()
    got = set(out["k"])
    expect = set()
    for i, s in zip(ids, strata):
        if s == "b":
            expect.add(i)
        elif s in ("a", "d") and _md5p(i) < floor_threshold(rates[s]):
            expect.add(i)
    assert got == expect
    assert not any(out["s"] == "c")
    # stratum missing from rates drops entirely
    out2 = stratified_hash_sample(
        ray.data.from_arrow(tbl), "k", "s", {"a": 1.0}).to_pandas()
    assert set(out2["s"]) == {"a"}


def test_floor_threshold_matches_duckdb_hex():
    import duckdb
    from full_text_extractor_v6_ray.stages.sampling import floor_threshold

    con = duckdb.connect()
    for r in (0.0625, 0.125, 0.3, 1 / 3, 0.7, 123 / 997):
        sql = con.sql(
            "SELECT lower(lpad(to_hex(CAST(floor(? * 4294967296.0) "
            "AS BIGINT)), 8, '0'))", params=[r]).fetchone()[0]
        assert sql == floor_threshold(r), r


def test_uniform_mixture_rates():
    from full_text_extractor_v6_ray.stages.sampling import (
        uniform_mixture_rates)

    rates = uniform_mixture_rates({"en": 300, "de": 100, "fr": 100})
    # target = 500/3 ≈ 166.7: en downsampled, de/fr kept whole
    assert rates["de"] == 1.0 and rates["fr"] == 1.0
    assert abs(rates["en"] - (500 / 3) / 300) < 1e-12
    assert uniform_mixture_rates({}) == {}


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_cms_exact_at_low_cardinality_and_merge_order():
    from full_text_extractor_v6_ray.stages.sketches import (
        cms_merge, cms_partial, cms_query)

    rng = np.random.RandomState(5)
    keys = np.array(["a", "b", "c", "d", "e"])
    data = keys[rng.randint(0, 5, size=5000)]
    true = {k: int((data == k).sum()) for k in keys}
    chunks = np.array_split(data, 7)
    parts = [cms_partial(pa.array(list(c))) for c in chunks]
    g1 = cms_merge(parts)
    g2 = cms_merge(parts[::-1])
    assert np.array_equal(g1, g2)  # merge order free
    est = cms_query(g1, pa.array(list(keys)))
    assert {k: int(e) for k, e in zip(keys, est)} == true


def test_cms_never_undercounts_and_bounded_overcount():
    from full_text_extractor_v6_ray.stages.sketches import (
        cms_partial, cms_query)

    rng = np.random.RandomState(9)
    n = 20000
    data = rng.zipf(1.5, size=n) % 5000          # many keys, skewed
    vals = pa.array([f"k{v}" for v in data])
    grid = cms_partial(vals, width=256, depth=4)
    probe = [f"k{v}" for v in range(50)]
    true = np.array([(data == v).sum() for v in range(50)])
    est = cms_query(grid, pa.array(probe))
    assert (est >= true).all()                    # never undercounts
    # standard bound: overcount <= 2N/width whp
    assert (est - true <= 2 * n / 256 * 4).all()


def test_cms_counts_dataset_matches_exact(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.sketches import cms_counts

    rng = np.random.RandomState(3)
    keys = ["x", "y", "z"]
    col = [keys[i] for i in rng.randint(0, 3, size=3000)]
    tbl = pa.table({"t": pa.array(col)})
    out = cms_counts(ray.data.from_arrow(tbl), "t", keys).to_pandas()
    got = dict(zip(out["t"], out["est_count"]))
    assert got == {k: col.count(k) for k in keys}


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def _ev(user, ts, typ):
    return {"user_id": user, "ts": np.datetime64(ts, "us"), "event_type": typ}


def test_funnel_strict_ordering(ray_session):
    import pandas as pd
    import ray.data
    from full_text_extractor_v6_ray.stages.window import funnel_counts

    rows = [
        # u1: full funnel in order
        _ev(1, "2024-01-01T00:00", "view"),
        _ev(1, "2024-01-01T01:00", "click"),
        _ev(1, "2024-01-01T02:00", "purchase"),
        # u2: click BEFORE view -> stops at step1
        _ev(2, "2024-01-01T01:00", "click"),
        _ev(2, "2024-01-01T02:00", "view"),
        # u3: click at the SAME ts as view -> strict '>' rejects it
        _ev(3, "2024-01-01T00:00", "view"),
        _ev(3, "2024-01-01T00:00", "click"),
        # u4: view+click, purchase before click -> step2 only
        _ev(4, "2024-01-01T00:00", "purchase"),
        _ev(4, "2024-01-01T01:00", "view"),
        _ev(4, "2024-01-01T02:00", "click"),
        # u5: no view at all -> never enters
        _ev(5, "2024-01-01T00:00", "click"),
        _ev(5, "2024-01-01T01:00", "purchase"),
        # noise type is prefiltered
        _ev(1, "2024-01-01T03:00", "error"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = funnel_counts(ds, "user_id", "ts", "event_type",
                        ["view", "click", "purchase"]).to_pandas()
    assert out.iloc[0].to_dict() == {"n_step1": 4, "n_step2": 2,
                                     "n_step3": 1}


def test_funnel_empty_and_single_step(ray_session):
    import pandas as pd
    import ray.data
    from full_text_extractor_v6_ray.stages.window import funnel_counts

    ds = ray.data.from_pandas(pd.DataFrame(
        [_ev(1, "2024-01-01T00:00", "view")]))
    out = funnel_counts(ds, "user_id", "ts", "event_type",
                        ["signup", "purchase"]).to_pandas()
    assert out.iloc[0].to_dict() == {"n_step1": 0, "n_step2": 0}
