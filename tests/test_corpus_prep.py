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
