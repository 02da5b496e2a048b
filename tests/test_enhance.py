"""Enhancement actor pool: registry, config validation, graceful
degradation, response-shape sniffing (A2-A4 contract analog)."""

import pyarrow as pa
import pytest


def test_registry_and_config_validation():
    from full_text_extractor_v6_ray.stages.enhance import (
        EnhanceConfig,
        get_transform,
        register_transform,
    )

    assert get_transform("identity")("x") == "x"
    with pytest.raises(ValueError, match="unknown enhancement transform"):
        EnhanceConfig(transform="nope").validate()
    with pytest.raises(ValueError, match="pool_size"):
        EnhanceConfig(pool_size=0).validate()
    with pytest.raises(ValueError, match="pool_size"):
        EnhanceConfig(pool_size=999).validate()
    with pytest.raises(ValueError, match="batch_size"):
        EnhanceConfig(batch_size=0).validate()

    @register_transform("___test_tmp")
    def tmp(t):
        return t + "!"

    assert get_transform("___test_tmp")("a") == "a!"


def test_per_row_fallback_never_crashes():
    from full_text_extractor_v6_ray.stages.enhance import (
        EnhanceBatch,
        EnhanceConfig,
    )

    batch = pa.table({
        "doc_id": [1, 2, 3],
        # len 3 -> 3 % 7 == 3 -> simulated failure; others enhance
        "text": ["abc", "hello world", None],
    })
    out = EnhanceBatch(EnhanceConfig(transform="flaky_prefix"))(batch)
    assert out["text"].to_pylist() == [
        "abc", "ENHANCED: hello world", "ENHANCED: "]
    assert out["fell_back"].to_pylist() == [True, False, False]
    assert out["enhance_error"].to_pylist() == ["ValueError", "", ""]


def test_response_shape_sniffing():
    from full_text_extractor_v6_ray.stages.enhance import (
        EnhanceBatch,
        EnhanceConfig,
        register_transform,
    )

    shapes = {
        "s1": {"text": "from-dict"},
        "s2": {"content": [{"text": "a"}, {"type": "x"}, {"text": "b"}]},
        "s3": 42,                      # unusable -> fallback
        "s4": {"content": "oops"},     # unusable -> fallback
    }

    @register_transform("___shapes")
    def shaped(t):
        return shapes[t]

    out = EnhanceBatch(EnhanceConfig(transform="___shapes"))(
        pa.table({"text": ["s1", "s2", "s3", "s4"]}))
    assert out["text"].to_pylist() == ["from-dict", "ab", "s3", "s4"]
    assert out["fell_back"].to_pylist() == [False, False, True, True]
    assert out["enhance_error"].to_pylist() == [
        "", "", "bad_response_shape", "bad_response_shape"]


def test_markdown_tidy():
    from full_text_extractor_v6_ray.stages.enhance import get_transform

    tidy = get_transform("markdown_tidy")
    assert tidy("a  \nb\n\n\n\nc") == "a\nb\n\nc"


def test_enhance_dataset_pool(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.enhance import (
        EnhanceConfig,
        enhance_dataset,
    )

    ds = ray.data.from_items(
        [{"doc_id": i, "text": "x" * i} for i in range(1, 30)])
    out = (enhance_dataset(ds, EnhanceConfig(transform="flaky_prefix",
                                             pool_size=2, batch_size=8))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    fell = out["fell_back"].tolist()
    assert fell == [(i % 7 == 3) for i in range(1, 30)]
    ok = out.loc[~out["fell_back"], "text"]
    assert ok.str.startswith("ENHANCED: ").all()
