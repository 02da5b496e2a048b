"""Ray Data stages: batch UDFs (plain fns) and actor-pool classes."""

from .extract import ExtractBatch, SPANS_TYPE, EXTRACTED_SCHEMA
from .dedup import dedup_latest_by_ts

__all__ = ["ExtractBatch", "SPANS_TYPE", "EXTRACTED_SCHEMA", "dedup_latest_by_ts"]
