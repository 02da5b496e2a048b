"""symspell_match_pairs: banded-DP unit pins, planted-pair recovery,
and the distance-2 variant."""

import pandas as pd

from full_text_extractor_v6_ray.stages.fuzzy_dedup import (
    _deletion_variants,
    _levenshtein_leq,
)


def test_banded_levenshtein():
    assert _levenshtein_leq("", "", 1)
    assert _levenshtein_leq("a", "", 1)
    assert not _levenshtein_leq("ab", "", 1)
    assert _levenshtein_leq("kitten", "sitting", 3)
    assert not _levenshtein_leq("kitten", "sitting", 2)
    assert _levenshtein_leq("abcdef", "abcdef", 0)
    assert not _levenshtein_leq("abcdef", "abcdeg", 0)


def test_deletion_variants():
    v = _deletion_variants("abc", 1)
    assert v == {"abc", "bc", "ac", "ab"}
    assert "a" in _deletion_variants("abc", 2)


def test_planted_pairs_exact_recovery(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.fuzzy_dedup import (
        symspell_match_pairs,
    )

    names = ["alpha", "alpho", "alphaa", "beta", "betaa", "gamma",
             "gamm", "delta"]
    df = pd.DataFrame({"id": range(len(names)), "s": names})
    got = symspell_match_pairs(ray.data.from_pandas(df), "id", "s",
                               max_dist=1).to_pandas()
    got = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    # brute-force truth
    exp = {(i, j) for i in range(len(names)) for j in range(i + 1,
                                                            len(names))
           if _levenshtein_leq(names[i], names[j], 1)}
    assert got == exp and (0, 1) in got and (5, 6) in got


def test_distance_two(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.fuzzy_dedup import (
        symspell_match_pairs,
    )

    names = ["spark", "sprk", "spk", "stone"]
    df = pd.DataFrame({"id": range(len(names)), "s": names})
    got = symspell_match_pairs(ray.data.from_pandas(df), "id", "s",
                               max_dist=2).to_pandas()
    got = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    exp = {(i, j) for i in range(4) for j in range(i + 1, 4)
           if _levenshtein_leq(names[i], names[j], 2)}
    assert got == exp and (0, 2) in got  # spark -> spk is distance 2


def test_no_matches_keeps_schema(ray_session):
    # the normal clean-data outcome must yield a TYPED empty result,
    # not a schemaless dataset (downstream joins/filters need the
    # Dataset-level schema; note ray 2.49 to_pandas drops columns on
    # ANY empty dataset, so schema() is the contract to pin)
    import ray.data
    from full_text_extractor_v6_ray.stages.fuzzy_dedup import (
        symspell_match_pairs,
    )

    df = pd.DataFrame({"id": [1, 2], "s": ["alpha", "zzzzzz"]})
    out = symspell_match_pairs(ray.data.from_pandas(df), "id", "s",
                               max_dist=1)
    assert out.schema() is not None
    assert out.schema().names == ["id_a", "id_b"]
    assert out.count() == 0
