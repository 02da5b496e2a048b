"""Enhancement actor pool (A2-A4 analog): pluggable text->text
transforms with per-row graceful degradation.

The reference's most-used optional path is an LLM enhancement client
family (/root/reference/src/converters/claude_markdown_convertor.py:100-187,
app_v5.py:257-296,416-465, app_v5_enterprise.py:46-199). Its CONTRACT —
not its network calls — is what a deterministic engine can rebuild:

  - config validation up front (unknown model/transform, bad pool
    bounds -> fail fast at pipeline build, reference
    claude_markdown_convertor.py:100-129's validate-configuration);
  - a BOUNDED actor pool sized independently of the extract stage (an
    enhancement backend has its own concurrency budget, never the
    cluster's CPU count);
  - per-row fallback-to-original-on-error: one bad row degrades to its
    input, never fails the batch or the job (reference
    claude_markdown_convertor.py:179-187 returns the unenhanced
    markdown on any API error);
  - response-shape sniffing: a transform may return a plain string or
    a response-like dict; anything else degrades to the original
    (reference app_v5.py:439-456 walks content lists defensively).

Transforms are registered by name (``register_transform``) so pipelines
reference them as config strings — the pluggable-client registry shape.
The per-row Python loop is deliberate and documented: the modeled
workload is a per-document RPC (IO-bound), not a vectorizable kernel;
the actor pool, not SIMD, is the scale axis. At cluster scale the pool
bound is the backpressure valve against a rate-limited backend.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

_TRANSFORMS: dict[str, object] = {}


def register_transform(name: str):
    """Register a text->text enhancement transform under ``name``."""
    def deco(fn):
        _TRANSFORMS[name] = fn
        return fn
    return deco


def get_transform(name: str):
    try:
        return _TRANSFORMS[name]
    except KeyError:
        raise ValueError(
            f"unknown enhancement transform {name!r}; registered: "
            f"{sorted(_TRANSFORMS)}") from None


@register_transform("identity")
def _identity(text: str) -> str:
    return text


@register_transform("markdown_tidy")
def _markdown_tidy(text: str) -> str:
    """Deterministic cleanup an enhancement backend typically performs:
    strip trailing whitespace per line, collapse 3+ blank lines to one
    blank line."""
    import re

    lines = [ln.rstrip() for ln in text.split("\n")]
    return re.sub(r"\n{3,}", "\n\n", "\n".join(lines))


@register_transform("flaky_prefix")
def _flaky_prefix(text: str) -> str:
    """Fault-injection transform for the graceful-degradation contract:
    deterministically fails (as a flaky backend would) when
    len(text) % 7 == 3, else prefixes a marker. Both branches are
    SQL-expressible, so the fallback path is DuckDB-oracled end to end
    (driver_queries:docs_enhanced)."""
    if len(text) % 7 == 3:
        raise ValueError("simulated upstream failure")
    return "ENHANCED: " + text


@dataclass(frozen=True)
class EnhanceConfig:
    """Validated enhancement-stage configuration (the reference's
    validate-configuration step, run at pipeline BUILD time so a typo
    fails fast, not per batch)."""
    transform: str = "identity"
    text_col: str = "text"
    pool_size: int = 4
    batch_size: int = 64
    max_pool_size: int = 64

    def validate(self) -> "EnhanceConfig":
        get_transform(self.transform)      # unknown name -> ValueError
        if not (1 <= self.pool_size <= self.max_pool_size):
            raise ValueError(
                f"pool_size {self.pool_size} outside [1, "
                f"{self.max_pool_size}] — enhancement pools are bounded "
                "independently of the cluster")
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        return self


def _sniff_text(resp) -> str | None:
    """Response-shape sniffing (reference app_v5.py:439-456): accept a
    plain string, a {'text': ...} dict, or a {'content': [{'text':...}]}
    response envelope; anything else returns None (caller degrades to
    the original)."""
    if isinstance(resp, str):
        return resp
    if isinstance(resp, dict):
        t = resp.get("text")
        if isinstance(t, str):
            return t
        content = resp.get("content")
        if isinstance(content, list):
            parts = [p.get("text") for p in content
                     if isinstance(p, dict) and isinstance(p.get("text"), str)]
            if parts:
                return "".join(parts)
    return None


class EnhanceBatch:
    """Actor-pool callable: transform resolved ONCE per actor in
    __init__ (the state-once rule); per row, any transform exception
    falls back to the original text and records the error type —
    never raises."""

    def __init__(self, config: EnhanceConfig):
        self.cfg = config.validate()
        self.fn = get_transform(config.transform)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = self.cfg.text_col
        texts = batch.column(col).to_pylist()
        out_texts, fell_back, errors = [], [], []
        for t in texts:
            original = t if t is not None else ""
            try:
                enhanced = _sniff_text(self.fn(original))
                if enhanced is None:   # unusable response shape
                    out_texts.append(original)
                    fell_back.append(True)
                    errors.append("bad_response_shape")
                else:
                    out_texts.append(enhanced)
                    fell_back.append(False)
                    errors.append("")
            except Exception as exc:   # per-row graceful degradation
                out_texts.append(original)
                fell_back.append(True)
                errors.append(type(exc).__name__)
        i = batch.schema.get_field_index(col)
        batch = batch.set_column(i, col, pa.array(out_texts, pa.string()))
        return (batch
                .append_column("fell_back", pa.array(fell_back, pa.bool_()))
                .append_column("enhance_error",
                               pa.array(errors, pa.string())))


def enhance_dataset(ds: "ray.data.Dataset",
                    config: EnhanceConfig) -> "ray.data.Dataset":
    """Apply the configured enhancement over ``ds`` with a bounded
    actor pool. Config validates NOW (fail fast), actors resolve the
    transform once each."""
    config = config.validate()
    return ds.map_batches(
        EnhanceBatch, fn_constructor_args=(config,),
        batch_format="pyarrow", batch_size=config.batch_size,
        concurrency=(1, config.pool_size))
