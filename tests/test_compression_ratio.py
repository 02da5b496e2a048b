"""CompressionRatioBatch: known-redundancy texts pin the signal's
direction; exact values pin determinism (zlib level fixed)."""

import pyarrow as pa

from full_text_extractor_v6_ray.stages.text_ops import (
    CompressionRatioBatch,
)


def _ratios(texts):
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = CompressionRatioBatch(text_col="text")(batch)
    return out.column("compression_ratio").to_pylist()


def test_repetitive_compresses_more_than_prose():
    rep = "spam ham " * 200
    prose = ("The quick brown fox jumps over the lazy dog while a "
             "barge drifts slowly past the harbor wall at dusk. ") * 20
    r_rep, r_prose = _ratios([rep, prose])
    assert r_rep > r_prose > 1.0


def test_random_noise_barely_compresses():
    import random

    rng = random.Random(42)
    noise = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(4000))
    (r,) = _ratios([noise])
    # printable ASCII carries ~6.55 bits/char: the floor is ~8/6.55
    assert r < 1.3


def test_empty_and_null_are_neutral():
    batch = pa.table({"doc_id": [1, 2], "text": pa.array(["", None],
                                                         pa.string())})
    out = CompressionRatioBatch()(batch)
    assert out.column("compression_ratio").to_pylist() == [1.0, 1.0]


def test_deterministic():
    texts = ["hello world " * 50, "abc", "x" * 1000]
    assert _ratios(texts) == _ratios(texts)
