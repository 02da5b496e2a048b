"""Broadcast state helpers."""

from .broadcast import Broadcast, broadcast_small_table

__all__ = ["Broadcast", "broadcast_small_table"]
