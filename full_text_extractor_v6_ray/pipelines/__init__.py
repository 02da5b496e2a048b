"""End-to-end Dataset -> Dataset pipeline compositions."""

from .extract_pipeline import (
    pages_dataset_from_documents,
    extract_pages,
    extraction_pipeline,
    warc_extraction_pipeline,
)

__all__ = [
    "pages_dataset_from_documents",
    "extract_pages",
    "extraction_pipeline",
    "warc_extraction_pipeline",
]
