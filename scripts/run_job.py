"""Production job entry point — the `ray job submit` target (north rule).

    ray job submit -- python scripts/run_job.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/extract_out \
        --partitions 16 [--no-dedup] [--resume]

Runs the checkpointed extraction pipeline: per-partition atomic parquet +
manifest (resume skips completed partitions), then an optional global url
dedup pass over the checkpointed output. Owns its Ray session (guarded —
under `ray job submit` the cluster already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from full_text_extractor_v6_ray.pipelines.checkpoint import (
        read_checkpointed_output,
        run_checkpointed_extraction,
    )
    from full_text_extractor_v6_ray.stages.dedup import dedup_latest_by_ts

    t0 = time.perf_counter()
    summary = run_checkpointed_extraction(args.sf_dir, args.out,
                                          n_partitions=args.partitions)
    summary["extract_sec"] = round(time.perf_counter() - t0, 2)

    if not args.no_dedup:
        t1 = time.perf_counter()
        deduped_dir = os.path.join(args.out, "deduped")
        ds = dedup_latest_by_ts(read_checkpointed_output(args.out))
        ds.write_parquet(deduped_dir)
        summary["dedup_sec"] = round(time.perf_counter() - t1, 2)
        summary["deduped_dir"] = deduped_dir

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
