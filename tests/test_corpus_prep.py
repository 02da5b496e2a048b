"""Composed corpus-prep capstone: planted exact dup, near dup, garbage."""

import pandas as pd
import pyarrow as pa

GOOD_1 = ("the quick brown fox jumps over the lazy dog while the sun "
          "sets behind the hills and the river flows quietly through "
          "the green valley where children play in the warm afternoon")
NEAR_1 = GOOD_1.replace("quietly", "slowly")  # one token changed
GOOD_2 = ("a completely different story about the old ship that sailed "
          "across the northern sea with a crew of twelve and a cat that "
          "slept on the warm deck during the long summer voyage home")
GARBAGE = "@#$% ^^ !! 123 456 789 000 @@@ ### $$$ %%% ^^^ &&& ***"


def _docs():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [GOOD_1, GOOD_1, NEAR_1, GARBAGE, GOOD_2],
    })


def test_corpus_prep_planted(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.pipelines.corpus_prep import corpus_prep

    out = (corpus_prep(ray.data.from_pandas(_docs()),
                       neardup_threshold=0.6)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 2 = exact dup of 1 (dropped, min id kept); doc 3 = near dup of 1
    # (dropped); doc 4 = garbage (quality floor); docs 1 and 5 survive
    assert out["doc_id"].tolist() == [1, 5]
    assert (out["lang_pred"] == "en").all()
    assert (out["quality"] >= 0.35).all()
    assert set(out.columns) >= {"doc_id", "text", "text_hash",
                                "lang_pred", "lang_conf", "n_tokens",
                                "quality"}


def test_corpus_prep_idempotent(ray_session):
    """Running prep on an already-prepped corpus changes nothing."""
    import ray.data
    from full_text_extractor_v6_ray.pipelines.corpus_prep import corpus_prep

    once = (corpus_prep(ray.data.from_pandas(_docs()),
                        neardup_threshold=0.6)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    again = (corpus_prep(
        ray.data.from_pandas(once[["doc_id", "text"]]),
        neardup_threshold=0.6)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert once["doc_id"].tolist() == again["doc_id"].tolist()
    assert once["text_hash"].tolist() == again["text_hash"].tolist()


def test_corpus_prep_antijoin_path_same_result(ray_session):
    """Forcing the distributed anti-join path (max_broadcast_drop=0)
    yields the identical cleaned corpus — no driver-side drop array."""
    import ray.data
    from full_text_extractor_v6_ray.pipelines.corpus_prep import corpus_prep

    out = (corpus_prep(ray.data.from_pandas(_docs()),
                       neardup_threshold=0.6, max_broadcast_drop=0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 5]


def test_remove_neardup_members_dispatch_and_equality(ray_session,
                                                      monkeypatch):
    """50% dup fraction: broadcast and anti-join paths agree exactly,
    and the size dispatch picks the right one (anti-join above the
    cap — the drop set never materializes on the driver there)."""
    import numpy as np
    import ray.data
    from full_text_extractor_v6_ray.stages import fuzzy_dedup as fd
    from full_text_extractor_v6_ray.stages import joins

    n = 1000
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "lang": ["en"] * n})
    # every odd id is a near-dup member of the preceding even id
    comp = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "component": (np.arange(n, dtype=np.int64) // 2) * 2,
    })

    calls = {"anti": 0}
    real_anti = joins.bucket_anti_join

    def spy(*a, **k):
        calls["anti"] += 1
        return real_anti(*a, **k)

    monkeypatch.setattr(joins, "bucket_anti_join", spy)

    def run(max_broadcast):
        return (fd.remove_neardup_members(
            ray.data.from_pandas(docs), ray.data.from_pandas(comp),
            key="doc_id", max_broadcast=max_broadcast)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))

    via_broadcast = run(max_broadcast=10**9)
    assert calls["anti"] == 0            # small path: no shuffle join
    via_anti = run(max_broadcast=10)     # 500 drop keys > 10 -> anti-join
    assert calls["anti"] == 1
    pd.testing.assert_frame_equal(via_broadcast, via_anti)
    assert via_anti["doc_id"].tolist() == list(range(0, n, 2))
    # empty drop set short-circuits to the input dataset
    no_dups = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                            "component": pd.array([], dtype="int64")})
    out = fd.remove_neardup_members(
        ray.data.from_pandas(docs), ray.data.from_pandas(no_dups),
        key="doc_id", max_broadcast=0).to_pandas()
    assert len(out) == n and calls["anti"] == 1
