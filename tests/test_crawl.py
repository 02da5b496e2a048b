"""Unit tests for the crawl-layer operators (stages/crawl.py)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from full_text_extractor_v6_ray.stages.crawl import (
    anchor_target_agg,
    apply_robots_rules,
    frontier_waves,
    host_degree,
    reciprocity_stats,
    snapshot_diff,
)


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def test_snapshot_diff_all_statuses(ray_session):
    prev = _ds({"url": ["u1", "u2", "u3"],
                "hash_a": ["h1", "h2", "h3"]})
    cur = _ds({"url": ["u2", "u3", "u4"],
               "hash_b": ["h2", "hX", "h4"]})
    got = snapshot_diff(prev, cur).to_pandas().set_index("url")["status"]
    assert got["u1"] == "gone"
    assert got["u2"] == "unchanged"
    assert got["u3"] == "changed"
    assert got["u4"] == "new"
    assert len(got) == 4


def test_host_degree_known_graph(ray_session):
    edges = _ds({"src_host": [1, 1, 2, 3, 3, 3],
                 "dst_host": [2, 3, 1, 1, 1, 2]})
    got = (host_degree(edges).to_pandas()
           .set_index("host").sort_index())
    assert got.loc[1, "n_out"] == 2 and got.loc[1, "n_in"] == 3
    assert got.loc[2, "n_out"] == 1 and got.loc[2, "n_in"] == 2
    assert got.loc[3, "n_out"] == 3 and got.loc[3, "n_in"] == 1


def test_reciprocity_counts_and_ignores_self_loops(ray_session):
    # 1<->2 reciprocal; 1->3 one-way; 4->4 self-loop ignored;
    # duplicate 1->2 edges collapse to one directed pair
    edges = _ds({"src_host": [1, 1, 2, 1, 4],
                 "dst_host": [2, 2, 1, 3, 4]})
    got = reciprocity_stats(edges).to_pandas()
    assert got["n_pairs"].iloc[0] == 2
    assert got["n_reciprocal"].iloc[0] == 1


def test_anchor_target_agg_values(ray_session):
    links = _ds({
        "target_page": [10, 10, 10, 20],
        "anchor": ["zeta", "alpha", "alpha", "solo"],
        "src_host": [1, 1, 2, 9],
    })
    got = (anchor_target_agg(links).to_pandas()
           .set_index("target_page").sort_index())
    assert got.loc[10, "n_links"] == 3
    assert got.loc[10, "n_src_hosts"] == 2
    assert got.loc[10, "top_anchor"] == "alpha"
    assert got.loc[20, "n_links"] == 1
    assert got.loc[20, "n_src_hosts"] == 1


def test_frontier_waves_politeness(ray_session):
    # host 1 has three urls -> waves 1..3 by priority desc, id tiebreak
    front = _ds({"doc_id": [1, 2, 3, 4],
                 "host": [1, 1, 1, 2],
                 "priority": [5, 9, 9, 1]})
    got = (frontier_waves(front, "host", "priority", "doc_id")
           .to_pandas().set_index("doc_id"))
    assert got.loc[2, "wave"] == 1   # pri 9, lower id wins the tie
    assert got.loc[3, "wave"] == 2
    assert got.loc[1, "wave"] == 3
    assert got.loc[4, "wave"] == 1


def test_robots_filter_prefix_semantics(ray_session):
    pages = _ds({"host": [1, 1, 1, 2],
                 "path": ["/private/x", "/privy", "/pub", "/private/x"]})
    rules = pa.table({"host": pa.array([1], pa.int64()),
                      "prefix": pa.array(["/priv"], pa.string())})
    got = apply_robots_rules(pages, rules).to_pandas()
    kept = set(zip(got["host"], got["path"]))
    # both /private/x and /privy on host 1 match the prefix; host 2
    # has no rule so its identical path survives
    assert kept == {(1, "/pub"), (2, "/private/x")}


def test_robots_filter_empty_rules_passthrough(ray_session):
    pages = _ds({"host": [1, 2], "path": ["/a", "/b"]})
    rules = pa.table({"host": pa.array([], pa.int64()),
                      "prefix": pa.array([], pa.string())})
    got = apply_robots_rules(pages, rules).to_pandas()
    assert len(got) == 2
