"""Vectorized column functions shared by stages and driver queries."""

from .text_stats import add_text_stats, token_count_arrays

__all__ = ["add_text_stats", "token_count_arrays"]
