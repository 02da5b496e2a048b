"""Resume-from-manifest equivalence (SURVEY.md §5.2 item 3):
kill after partition k, rerun, result must equal a single-shot run."""

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _read_all(out_dir):
    from full_text_extractor_v6_ray.pipelines.checkpoint import (
        read_checkpointed_output,
    )

    df = read_checkpointed_output(out_dir).to_pandas()
    return df.sort_values(["url", "warc_ts"]).reset_index(drop=True)


def test_singleshot_and_resumed_runs_identical(ray_session, tmp_path):
    from full_text_extractor_v6_ray.pipelines.checkpoint import (
        completed_partitions,
        run_checkpointed_extraction,
    )

    single = str(tmp_path / "single")
    summary = run_checkpointed_extraction(SF_DIR, single, n_partitions=4)
    assert summary["newly_written"] == 4 and summary["skipped"] == 0

    # crashy run: fail after 2 partitions, then resume
    crashy = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed_extraction(SF_DIR, crashy, n_partitions=4,
                                    fail_after_partition=2)
    assert len(completed_partitions(crashy)) == 2

    summary2 = run_checkpointed_extraction(SF_DIR, crashy, n_partitions=4)
    assert summary2["skipped"] == 2 and summary2["newly_written"] == 2

    a, b = _read_all(single), _read_all(crashy)
    assert list(a["extracted_text"]) == list(b["extracted_text"])
    assert list(a["url"]) == list(b["url"])


def test_manifest_contents(ray_session, tmp_path):
    import json

    from full_text_extractor_v6_ray.pipelines.checkpoint import (
        run_checkpointed_extraction,
    )

    out = str(tmp_path / "m")
    run_checkpointed_extraction(SF_DIR, out, n_partitions=2)
    docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows

    manifests = []
    for f in sorted(os.listdir(os.path.join(out, "manifest"))):
        if f.startswith("_"):   # run-level plan manifest
            continue
        with open(os.path.join(out, "manifest", f)) as fh:
            manifests.append(json.load(fh))
    assert len(manifests) == 2
    assert sum(m["rows_in"] for m in manifests) == docs
    for m in manifests:
        assert m["rows_out"] >= m["rows_in"]          # dup urls expand rows
        assert m["total_chars"] > 0
        assert "html" in " ".join(m["methods"]) or m["methods"]
        assert 0 <= m["avg_quality"] <= 1


def test_resume_with_changed_plan_fails_loudly(ray_session, tmp_path):
    """ADVICE item: resuming with a different n_partitions (or input row
    count / seed) must refuse, not silently remap manifest ids onto
    different row ranges."""
    from full_text_extractor_v6_ray.pipelines.checkpoint import (
        run_checkpointed_extraction,
    )

    out = str(tmp_path / "plan")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed_extraction(SF_DIR, out, n_partitions=4,
                                    fail_after_partition=1)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_checkpointed_extraction(SF_DIR, out, n_partitions=8)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_checkpointed_extraction(SF_DIR, out, n_partitions=4, seed=7)
    # same plan resumes fine
    done = run_checkpointed_extraction(SF_DIR, out, n_partitions=4)
    assert done["newly_written"] == 3 and done["skipped"] == 1


def test_rerun_skips_everything(ray_session, tmp_path):
    from full_text_extractor_v6_ray.pipelines.checkpoint import (
        run_checkpointed_extraction,
    )

    out = str(tmp_path / "s")
    run_checkpointed_extraction(SF_DIR, out, n_partitions=3)
    again = run_checkpointed_extraction(SF_DIR, out, n_partitions=3)
    assert again["newly_written"] == 0 and again["skipped"] == 3
