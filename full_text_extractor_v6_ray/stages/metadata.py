"""Page metadata extraction + completeness scoring (G6 / M12 analogs).

Separate stage from the main extractor so the golden byte-contract of
``extracted_text`` is untouched:

  - ``PageMetadataBatch``: per-page structural metadata (title present,
    h1 present, lang attr, meta description, counts) + completeness score —
    the analog of the reference's metadata completeness
    (/root/reference/src/processors/powerpoint/metadata_extractor.py:601-658:
    % of {title, author, slide_count} present + issue list).

  - ``DataIslandBatch``: structured data islands
    (``<script type="application/json">`` / ``application/ld+json``) —
    the nearest web analog of the chart extractor (M12,
    content_extractor.py:368-421): typed series data embedded in the page,
    surfaced as summarized rows instead of rendered text.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_H1 = re.compile(r"<h1[^>]*>", re.IGNORECASE)
_LANG = re.compile(r"<html[^>]*\blang=['\"]?([a-zA-Z-]+)", re.IGNORECASE)
_META_DESC = re.compile(
    r"<meta[^>]*name=['\"]description['\"][^>]*>", re.IGNORECASE)
_ISLAND = re.compile(
    r"<script[^>]*type=['\"]application/(?:ld\+)?json['\"][^>]*>(.*?)</script>",
    re.IGNORECASE | re.DOTALL)


class PageMetadataBatch:
    """(url, html) -> structural metadata + completeness (0..1)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        has_title, has_h1, lang_attr, has_desc, completeness = [], [], [], [], []
        for payload in batch.column("html").to_pylist():
            try:
                text = (payload or b"").decode("utf-8", errors="replace")
            except Exception:
                text = ""
            t = bool(_TITLE.search(text))
            h = bool(_H1.search(text))
            lm = _LANG.search(text)
            d = bool(_META_DESC.search(text))
            has_title.append(t)
            has_h1.append(h)
            lang_attr.append(lm.group(1) if lm else "")
            has_desc.append(d)
            completeness.append(round(
                (int(t) + int(h) + int(bool(lm)) + int(d)) / 4.0, 6))
        return pa.table({
            "url": urls,
            "has_title": pa.array(has_title),
            "has_h1": pa.array(has_h1),
            "lang_attr": pa.array(lang_attr, pa.string()),
            "has_meta_description": pa.array(has_desc),
            "completeness": pa.array(completeness, pa.float64()),
        })


class DataIslandBatch:
    """(url, html) -> one row per parseable JSON data island."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, idxs, kinds, keys, sizes = [], [], [], [], []
        for url, payload in zip(batch.column("url").to_pylist(),
                                batch.column("html").to_pylist()):
            try:
                text = (payload or b"").decode("utf-8", errors="replace")
            except Exception:
                continue
            for i, m in enumerate(_ISLAND.finditer(text)):
                raw = m.group(1).strip()
                try:
                    obj = json.loads(raw)
                except Exception:
                    continue
                urls.append(url)
                idxs.append(i)
                if isinstance(obj, dict):
                    kinds.append("object")
                    keys.append(",".join(sorted(obj.keys())[:8]))
                    sizes.append(len(obj))
                elif isinstance(obj, list):
                    kinds.append("array")
                    keys.append("")
                    sizes.append(len(obj))
                else:
                    kinds.append(type(obj).__name__)
                    keys.append("")
                    sizes.append(1)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "island_idx": pa.array(idxs, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "top_keys": pa.array(keys, pa.string()),
            "n_items": pa.array(sizes, pa.int32()),
        })
