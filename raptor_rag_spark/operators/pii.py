"""PII detection and redaction for webtext training pipelines.

A corpus destined for model training must strip personally
identifiable information (the reference pipeline's ingest assumes
pre-scrubbed text; at crawl scale the scrub is part of the engine).
Counterpart of the C4/Dolma-style scrubbing stage: detect emails,
IPv4 addresses, and US-style phone numbers, and replace each span
with a typed placeholder.

Everything here is pure JVM regexp (`regexp_count` /
`regexp_replace`) — no Python in the row path, so detection runs at
scan speed inside whole-stage codegen and the text column never
shuffles. The patterns deliberately use only the regex subset that
Java's engine and RE2 (DuckDB, the oracle) interpret identically:
no backreferences, no lookaround, ASCII `\\b` / `\\d` classes.

100 TB notes: map-only — zero exchanges; composes with any scan, and
the redaction placeholder keeps offsets deterministic so downstream
exact/fuzzy dedup sees identical scrubbed text regardless of
partitioning. Filter (`F.col("n_pii") > 0`) pushes to the scan when
materialized on write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: replacement happens email -> ipv4 -> phone, so a digit run
# inside an already-redacted span can't double-match. All three
# patterns parse identically under java.util.regex and RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts over the RAW text (counted before any
    replacement so kinds don't shadow each other — an email's host
    part can contain an IPv4-looking run; counting raw keeps each
    kind's count independent of the scrub order)."""
    return {kind: F.regexp_count(col, F.lit(pat)) for kind, pat, _ in PII_PATTERNS}


def scrub_col(col: Column) -> Column:
    """Redacted text: placeholders substituted in PII_PATTERNS order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add `n_email` / `n_ipv4` / `n_phone` / `n_pii` counts and
    replace `text_col` with the scrubbed text (raw text preserved as
    `{text_col}_raw` is NOT kept — at crawl scale the raw copy is the
    thing being deleted; callers wanting both should select it first).

    Map-only; no shuffle; codegen'd end-to-end.
    """
    counts = pii_counts(F.col(text_col))
    df = df.withColumns({f"n_{k}": v for k, v in counts.items()})
    total = None
    for k in counts:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return df.withColumn("n_pii", total).withColumn(text_col, scrub_col(F.col(text_col)))
