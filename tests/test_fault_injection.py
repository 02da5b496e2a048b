"""Fault injection: Ray-level retry semantics the 100-TB deployment
relies on.

A 256-node run WILL lose workers mid-stage; the pipeline contract is
that a killed worker's task is retried and the job's output is
byte-identical to an undisturbed run. These tests kill a real worker
process mid-`map_batches` (os._exit — no Python-level cleanup, the
closest sandbox analog to a node loss) and assert exact recovery.
"""

import os

import pandas as pd
import pytest


def _docs(n=60):
    return pd.DataFrame({
        "doc_id": range(n),
        "text": [f"tok{i} alpha beta gamma delta epsilon tok{i} zeta"
                 for i in range(n)],
    })


def test_task_survives_worker_kill(ray_session, tmp_path):
    """Kill the worker on the FIRST task execution (flag-file latch);
    Ray's task retry must re-run it on a fresh worker and the final
    result must equal the undisturbed run."""
    import pyarrow as pa
    import ray.data

    flag = str(tmp_path / "killed_once")

    def maybe_die(batch: pa.Table) -> pa.Table:
        # latch BEFORE dying so exactly one execution is lost
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("x")
            os._exit(1)  # simulated node loss: no exception, no cleanup
        return batch

    ds = ray.data.from_pandas(_docs()).repartition(4)
    got = (ds.map_batches(maybe_die, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert os.path.exists(flag)  # the kill really happened
    want = _docs().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_shuffle_stage_survives_worker_kill(ray_session, tmp_path):
    """Same latch, but the kill lands UPSTREAM of a bucketed groupby —
    the recovery path must reproduce the exact aggregate, proving lost
    map output is recomputed (not silently dropped from the shuffle)."""
    import pyarrow as pa
    import ray.data

    from full_text_extractor_v6_ray.stages.fuzzy_dedup import (
        contamination_counts,
    )

    flag = str(tmp_path / "killed_once_shuffle")

    def maybe_die(batch: pa.Table) -> pa.Table:
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("x")
            os._exit(1)
        return batch

    df = _docs()
    train = (ray.data.from_pandas(df).repartition(4)
             .map_batches(maybe_die, batch_format="pyarrow"))
    ev = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["alpha beta gamma delta epsilon"]}))
    got = contamination_counts(train, ev, n=5, num_buckets=4).to_pandas()
    assert os.path.exists(flag)
    # every doc contains that 5-gram exactly once
    assert sorted(got["doc_id"]) == list(range(len(df)))
    assert set(got["n_contaminated"]) == {1}


def test_hot_gram_skew_semi_join_path(ray_session):
    """Planted worst-case skew for the bucketed semi-join dispatch: ONE
    gram shared by EVERY doc (all its rows land in one bucket). The
    per-bucket vectorized isin must stay correct — and the per-doc
    distinct in ngram_doc_rows bounds the hot bucket at one row per doc,
    so the skew is O(docs), never O(occurrences)."""
    import ray.data

    from full_text_extractor_v6_ray.stages.fuzzy_dedup import (
        contamination_counts,
    )

    n = 400
    hot = "one two three four five"
    df = pd.DataFrame({
        "doc_id": range(n),
        # the hot gram occurs TWICE per doc (occurrence-skew too)
        "text": [f"{hot} filler{i} {hot}" for i in range(n)],
    })
    ev = pd.DataFrame({"doc_id": [0], "text": [hot]})
    got = contamination_counts(
        ray.data.from_pandas(df), ray.data.from_pandas(ev),
        n=5, max_broadcast=0, num_buckets=8).to_pandas()
    assert sorted(got["doc_id"]) == list(range(n))
    assert set(got["n_contaminated"]) == {1}
