"""Sources: parquet readers + the deterministic synthetic pages generator."""

from .pages_gen import build_page_row, pages_table_from_documents, PageGenBatch

__all__ = ["build_page_row", "pages_table_from_documents", "PageGenBatch"]
