"""Hyperlink side-output operators (M21/G4)."""

import pyarrow as pa

from full_text_extractor_v6_ray.stages.links import reparse_links_batch


def test_reparse_matches_markdown_links():
    batch = pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "extracted_text": pa.array([
            "# T\n\nsee [here](https://a.com) and [there](https://b.com)",
            "no links at all",
        ], pa.string()),
    })
    out = reparse_links_batch(batch)
    assert out["url"].to_pylist() == ["u1", "u1"]
    assert out["link_text"].to_pylist() == ["here", "there"]
    assert out["link_url"].to_pylist() == ["https://a.com", "https://b.com"]


def test_reparse_skips_images():
    batch = pa.table({
        "url": pa.array(["u"], pa.string()),
        "extracted_text": pa.array(
            ["![alt text](image) then [real](https://x.com)"], pa.string()),
    })
    out = reparse_links_batch(batch)
    assert out["link_text"].to_pylist() == ["real"]


def test_reparser_agrees_with_links_column(ray_session):
    """M21 consistency: regex reparse == the extractor's direct links."""
    from full_text_extractor_v6_ray.pipelines import extraction_pipeline
    from full_text_extractor_v6_ray.stages.links import (
        explode_links_column,
        links_from_markdown,
    )

    extracted = extraction_pipeline("/root/testdata/sf0.001", dedup=False)
    # PDF annotation links live only in the links column (no markdown
    # anchor to re-parse) — the parity claim is for the html branch
    html_only = extracted.filter(lambda r: r["method"] == "html")
    direct = explode_links_column(html_only).to_pandas()
    reparsed = links_from_markdown(html_only).to_pandas()

    key = ["url", "link_text", "link_url"]
    a = direct.sort_values(key).reset_index(drop=True)
    b = reparsed.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])


def test_dedupe_links_keep_longest(ray_session):
    import ray.data
    from full_text_extractor_v6_ray.stages.links import dedupe_links_keep_longest

    links = ray.data.from_arrow(pa.table({
        "url": pa.array(["p", "p", "p", "q"], pa.string()),
        "link_text": pa.array(["short", "much longer text", "short", "x"],
                              pa.string()),
        "link_url": pa.array(["https://t.com"] * 3 + ["https://y.com"],
                             pa.string()),
    }))
    out = dedupe_links_keep_longest(links).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "link_text"] == "much longer text"
