"""Broadcast-small-side pattern: ``ray.put`` once, read per actor.

The rule (SURVEY.md §2.4 / ray guide "Joins and lookups"): a dimension
table, blocklist, vocab or query matrix is put into the object store ONCE
on the driver; every actor ``ray.get``s it in ``__init__`` (one fetch per
actor process, zero-copy for numpy/arrow) — never re-shipped per batch,
never captured by-value in the UDF closure (which would serialize it into
every task spec).
"""

from __future__ import annotations

import ray


class Broadcast:
    """Typed wrapper around an object-store broadcast.

    >>> bc = Broadcast(lookup_dict)
    >>> class Stage:
    ...     def __init__(self, bc):
    ...         self.lookup = bc.get()      # once per actor
    ...     def __call__(self, batch): ...
    >>> ds.map_batches(Stage, fn_constructor_kwargs={"bc": bc}, ...)
    """

    def __init__(self, value):
        self._ref = ray.put(value)

    def get(self):
        return ray.get(self._ref)

    @property
    def ref(self):
        return self._ref


def broadcast_small_table(path: str, columns: list[str] | None = None,
                          key: str | None = None) -> Broadcast:
    """Read a small parquet (dimension) table and broadcast it.

    With ``key``: broadcasts a dict keyed by that column (row dicts as
    values) for O(1) in-UDF lookups; without: broadcasts the arrow table.
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=columns)
    if key is None:
        return Broadcast(tbl)
    names = [n for n in tbl.column_names if n != key]
    keys = tbl.column(key).to_pylist()
    rows = {k: {n: tbl.column(n)[i].as_py() for n in names}
            for i, k in enumerate(keys)}
    return Broadcast(rows)
