"""Extraction engine configuration.

The knob surface (analog of the reference's ``config.py:19-92``), as a frozen
dataclass so every stage sees identical, hashable settings — determinism of
the extracted bytes depends on it.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractConfig:
    """Knobs for the HTML/PDF main-content extractor.

    Defaults are the frozen-golden-fixture settings: changing any value
    changes extracted bytes and therefore requires regenerating goldens.
    """

    # --- boilerplate strip (block scoring, Readability/jusText-style) ---
    # A text block whose link-char density exceeds this AND whose word count
    # is below `min_words_linky` is considered navigation chrome and dropped.
    # (analog of reference meaningless-shape filter, content_extractor.py:255-300)
    max_link_density: float = 0.5
    min_words_linky: int = 15
    # Containers whose subtree is dropped outright.
    kill_tags: frozenset = frozenset(
        {"script", "style", "noscript", "template", "svg", "iframe",
         "form", "button", "select", "option", "head", "object", "embed"}
    )
    # Containers treated as boilerplate chrome (dropped with their subtree).
    boilerplate_tags: frozenset = frozenset({"nav", "footer", "aside", "header"})
    # class/id substrings marking ad/chrome containers.
    boilerplate_markers: tuple = (
        "nav", "menu", "sidebar", "footer", "banner", "advert", "promo",
        "cookie", "share", "social", "breadcrumb", "comment", "-ad-", "ad-box",
    )

    # --- alt-text quality (reference content_extractor.py:158-213 analog) ---
    min_alt_len: int = 3

    # --- inline formatting / markdown rendering ---
    bullet_indent: str = "  "
    heading_max_level: int = 6

    # --- parser selection ---
    # regex-tokenizer front-end (1.7x parse speedup); byte-identical to the
    # stdlib html.parser path — parity pinned by tests/test_fast_parser.py
    use_fast_parser: bool = True

    # --- payload guards ---
    max_html_bytes: int = 8 * 1024 * 1024   # parse cap; larger rows -> error path
    # in-process replacement for the reference's 60 s subprocess timeout
    # (app_v5.py:389): size guard instead of wall-clock guard.


DEFAULT_CONFIG = ExtractConfig()


@dataclass(frozen=True)
class PipelineConfig:
    """Ray-side execution knobs (scale tuning, not semantics)."""

    batch_size: int = 128           # pages per batch; html rows are wide (~100 KB avg)
    # documents per page-synthesis task: small so the fused synth->extract
    # chain yields many fine-grained tasks (load balance / short tail);
    # with replicate=R one task carries ~doc_batch_size*R pages
    doc_batch_size: int = 32
    # extractor actor-pool size; None -> autoscale (1, cluster_cpus - 2) so
    # the pool NEVER reserves every CPU (a fixed pool == cluster size
    # deadlocks the read stage — observed: 8 actors on 4 CPUs starved
    # ReadParquet forever)
    concurrency: int | None = None
    num_cpus_per_actor: float = 1.0
    # Extractor execution mode. The extractor's state is module-level
    # compiled regexes — paid once per WORKER PROCESS at import either
    # way — so the task pool (False) reuses Ray's prestarted workers and
    # skips the 5-14 s per-execution actor-pool spawn (measured at 32
    # cpus: tasks 11.6 s vs actors 16-26 s on the 223k-page bench).
    # Set True for a variant with genuinely expensive per-actor state
    # (e.g. a model load), where amortizing setup across batches wins.
    use_actor_pool: bool = False
    dedup_salt_buckets: int = 16    # two-phase salted dedup for hot hosts
    dedup_hot_threshold: int = 10_000  # rows per url-key before salting engages
    output_partitions: int = 0      # 0 = leave to Ray block sizing
    drop_html_after_extract: bool = True


DEFAULT_PIPELINE_CONFIG = PipelineConfig()
