"""Deterministic tokenizer.

The reference counts tokens with tiktoken ``cl100k_base``
(/root/reference/raptor/utils.py:43). tiktoken is unavailable in this
environment, so the engine's default tokenizer is a deterministic
regex tokenizer (word runs + single punctuation marks — BPE-ish
granularity). It is pluggable: anything with ``encode(str) -> list``
works. For exact cl100k parity the engine ships its own from-scratch
BPE implementation (``functions/bpe.py``) — only the public
``cl100k_base.tiktoken`` vocabulary data file is needed, not the
tiktoken package.

The token pattern is written with explicit ASCII classes so that the
SAME count is computable in Python ``re``, Java regex (Spark
``regexp_extract_all``) and RE2 (DuckDB) — this is what lets token
counts participate in the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import re

# word runs OR any single char that is not word/space. \x0B = vertical tab
# (spelled out because Java regex treats \v as a class, not a char).
TOKEN_PATTERN = r"[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\r\f\x0B]"

_TOKEN_RE = re.compile(TOKEN_PATTERN)


class RegexTokenizer:
    """Drop-in for the ``tokenizer.encode`` surface used by the
    reference chunker (only ``len(encode(s))`` is consumed,
    /root/reference/raptor/utils.py:43,:62)."""

    def encode(self, text: str) -> list[str]:
        return _TOKEN_RE.findall(text)


DEFAULT_TOKENIZER = RegexTokenizer()


def token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


def spark_token_count(col):
    """Spark Column computing token_count(col) JVM-side (codegen'd).

    Built with F.lit so the pattern bypasses SQL-literal backslash
    unescaping and reaches Java regex byte-identical.
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def duckdb_token_count_expr(col: str) -> str:
    """DuckDB SQL expression computing the identical count."""
    return f"length(regexp_extract_all({col}, '{TOKEN_PATTERN}'))"
