"""Vectorized text statistics (M25 analog + training-data quality scoring).

All pyarrow.compute kernels — no Python row loops. Token semantics are
whitespace-run split, mirroring the reference's word count
(`/root/reference/app_v5.py:590-591`) and chosen to be exactly
SQL-expressible for the DuckDB oracle:
``len(regexp_extract_all(text, '\\S+'))``.

ONE tokenizer dialect repo-wide: RE2's (pyarrow's AND DuckDB's regex
engine). RE2 ``\\s`` is ASCII-only — exactly ``[\\t\\n\\f\\r ]`` — while
Python's ``str.split()`` / ``re \\s`` also treat ``\\x0b``, ``\\xa0``,
``\\u2028`` etc. as whitespace. Mixing the dialects inside one pipeline
silently shifts token indices/counts on such bytes, so every stage that
must agree with an Arrow kernel or a DuckDB oracle tokenizes with RE2
semantics: Arrow code uses ``\\S+`` kernels directly; Python code uses
``RE2_TOKEN_RE`` below.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Python regex that matches RE2 \S+ byte-for-byte (RE2 \s = [\t\n\f\r ],
# ASCII-only — no \v, no Unicode whitespace). Use this, never
# str.split()/re \S+, wherever tokenization must agree with
# pyarrow.compute or a DuckDB oracle.
RE2_TOKEN_RE = re.compile(r"[^\t\n\f\r ]+")


def re2_tokens(s: str | None) -> list[str]:
    """Tokenize exactly like pyarrow/DuckDB ``regexp_extract_all(text,
    '\\S+')`` (RE2 ASCII whitespace; no empty tokens)."""
    return RE2_TOKEN_RE.findall(s or "")


def token_count_arrays(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace-token count per string (0 for empty/blank) — pure RE2:
    counts ``\\S+`` runs, so it equals DuckDB's
    ``len(regexp_extract_all(text, '\\S+'))`` on every byte sequence."""
    return pc.count_substring_regex(
        pc.cast(texts, pa.string()), pattern=r"\S+")


def add_text_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_tokens / n_chars_calc / avg_token_len / upper_ratio."""
    texts = batch.column(col)
    n_tokens = token_count_arrays(texts)
    n_chars = pc.utf8_length(texts)
    # characters that are not spaces
    nonspace = pc.utf8_length(pc.replace_substring(texts, " ", ""))
    avg_tok = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(pc.cast(nonspace, pa.float64()),
                  pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())),
        pa.scalar(0.0),
    )
    batch = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    batch = batch.append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
    batch = batch.append_column("avg_token_len", avg_tok)
    return batch


# GPT-2-style pre-tokenizer word-piece pattern, simplified to the
# RE2-compatible subset (no lookahead): a piece is an optional leading
# space + a letter run, digit run, or punctuation run. Both pyarrow
# and DuckDB compile RE2, so the SAME pattern string drives the Ray
# kernel and the SQL oracle.
BPE_PIECE_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count_arrays(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """BPE-ish piece count per string: the LM-token-budget estimator
    (letters/digits/punctuation split like a byte-pair pre-tokenizer,
    whitespace folded into the following piece)."""
    return pc.cast(pc.count_substring_regex(
        pc.cast(texts, pa.string()), pattern=BPE_PIECE_PATTERN),
        pa.int64())
