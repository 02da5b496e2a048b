"""Hyperlink side-outputs (M21/M23/S6/G4 analogs).

The reference re-parses its own markdown with a regex to build the
hyperlink table (``extract_hyperlinks_from_markdown``,
/root/reference/app_v5.py:172-218) because of its 2-phase UI flow. The
engine emits links directly from the extractor (preferred, SURVEY.md M21),
but the reparser exists too — both for parity and as a consistency check:
``links_from_markdown(extracted) == links column`` row-for-row.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

# the reference's link regex, app_v5.py:205: \[([^\]]+)\]\(([^)]+)\)
_MD_LINK = re.compile(r"\[([^\]]+)\]\(([^)]+)\)")
_MD_IMAGE = re.compile(r"!\[([^\]]*)\]\(([^)]+)\)")


def reparse_links_batch(batch: pa.Table) -> pa.Table:
    """(url, extracted_text) -> one row per markdown link (images skipped,
    mirroring app_v5.py:208-210)."""
    urls, texts_out, hrefs = [], [], []
    for url, text in zip(batch["url"].to_pylist(),
                         batch["extracted_text"].to_pylist()):
        cleaned = _MD_IMAGE.sub("", text or "")
        for m in _MD_LINK.finditer(cleaned):
            urls.append(url)
            texts_out.append(m.group(1))
            hrefs.append(m.group(2))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "link_text": pa.array(texts_out, pa.string()),
                     "link_url": pa.array(hrefs, pa.string())})


def links_from_markdown(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    """M21: regex re-parse of extracted_text -> links table."""
    return extracted.map_batches(reparse_links_batch, batch_format="pyarrow",
                                 zero_copy_batch=True)


def explode_links_column(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    """Preferred single-pass path: explode the extractor's links column.

    Arrow-native: ``list_parent_indices`` + ``flatten`` — no Python loop
    over rows or links.
    """
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        links = batch.column("links").combine_chunks()
        parents = pc.list_parent_indices(links)
        flat = links.flatten()
        return pa.table({
            "url": pc.take(batch.column("url"), parents),
            "link_text": flat.field("text"),
            "link_url": flat.field("href"),
        })

    return extracted.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True)


def dedupe_links_keep_longest(links: "ray.data.Dataset") -> "ray.data.Dataset":
    """G4: per (url, link_url) keep the longest link text.

    Reference semantics: hyperlink_extractor.py:172-195 — first-wins per
    key, replaced when a later text is longer (tested at
    tests/test_hyperlink_extractor.py:94-111). Longest-wins is the fixpoint
    of that rule and is order-independent (required for distributed runs);
    ties break lexicographically for determinism.
    """
    from .dedup import keyed_keep_one
    import pyarrow.compute as pc

    def add_len_and_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(batch["url"], batch["link_url"],
                                          " ")
        batch = batch.append_column("__key", key)
        return batch.append_column(
            "__len", pc.cast(pc.utf8_length(batch["link_text"]), pa.int64()))

    keyed = links.map_batches(add_len_and_key, batch_format="pyarrow",
                              zero_copy_batch=True)
    best = keyed_keep_one(keyed, "__key",
                          [("__len", "descending"),
                           ("link_text", "ascending")])
    return best.drop_columns(["__key", "__len"])


def write_links_csv(links: "ray.data.Dataset", out_dir: str) -> None:
    """S6: hyperlink CSV side output (directory of part csvs)."""
    links.write_csv(out_dir)
