"""HTML -> text extraction (engine-only stage).

The reference ingests pre-extracted text (build_from_text,
/root/reference/raptor/tree_builder.py:260-295); the engine's input is
Common-Crawl-style pages (url, warc_ts, html:binary, text, lang) and
the per-row invariant is BYTE-IDENTICAL extracted text per url
(input_hint). The extractor is a deterministic pure-Python kernel in
``mapInPandas`` (Arrow batches; bytes never shuffle — extraction runs
straight off the scan and only text flows on), pinned by goldens in
tests.

Kernel rules (deterministic, no external parser):
1. drop <script>/<style>/<!-- --> blocks
2. <br> and closing block tags emit '\\n'
3. strip remaining tags
4. decode the five standard XML entities + decimal/hex numeric refs
5. collapse horizontal whitespace runs to one space, strip each line,
   drop empty lines, join with '\\n'
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_BLOCK_CLOSE_RE = re.compile(
    r"(?i)<br\s*/?>|</(p|div|h[1-6]|li|ul|ol|tr|table|blockquote|title|section|article|header|footer)\s*>"
)
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")]
_NUM_ENT_RE = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_HWS_RE = re.compile(r"[ \t\f\v]+")


def extract_text(html: bytes | str) -> str:
    """Deterministic HTML -> text. The golden-pinned kernel."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _NUM_ENT_RE.sub(lambda m: _decode_num(m.group(1)), s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    lines = []
    for line in s.split("\n"):
        line = _HWS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def _decode_num(ref: str) -> str:
    try:
        cp = int(ref[1:], 16) if ref.startswith("x") else int(ref)
        if 0 < cp <= 0x10FFFF:
            return chr(cp)
    except ValueError:
        pass
    return ""


EXTRACT_SCHEMA = "url string, text string"


def extract_pages(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """pages(url, html binary, ...) -> (url, [passthrough...], text).

    Column-pruned scan: only url+html+passthrough are read; the binary
    column dies here. ``passthrough`` carries narrow key columns (e.g.
    page_id) through the kernel so callers don't need a self-join back
    to the pages table (that join re-reads/re-generates the source and
    shuffles on url — measured as a whole extra pipeline stage)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [pages.schema[url_col]]
        + [pages.schema[c] for c in passthrough]
        + [T.StructField("text", T.StringType())]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            data = {url_col: pdf[url_col]}
            for c in passthrough:
                data[c] = pdf[c]
            data["text"] = [extract_text(h) for h in pdf[html_col]]
            yield pd.DataFrame(data)

    cols = [url_col, *passthrough, html_col]
    return pages.select(*cols).mapInPandas(run, out_schema)


# ------------------------------------------------ URL canonicalization

def canonical_url(col):
    """Canonical form of a crawl URL, pure JVM (codegen'd regexps —
    runs at scan speed, no Python): the recrawl-collapse key for
    keep_latest when the same page is fetched under trivially-varying
    URLs. Conservative, documented normalizations only (public
    practice from crawl-dedup writeups):

    1. scheme and host lowercased (RFC 3986: both case-insensitive)
    2. fragment stripped (never sent to the server)
    3. default ports dropped (:80 for http, :443 for https)
    4. utm_* / fbclid / gclid tracking params dropped, separators
       repaired (a dropped first param promotes the next '&' to '?')
    5. trailing '/' dropped (including the bare root slash — RFC 3986
       equates an empty path with '/')
    NOT done (identity-changing): www-stripping, param reordering,
    percent-decoding. NULL propagates.
    """
    from pyspark.sql import functions as F

    u = col
    prefix = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.when(prefix != "", F.concat(F.lower(prefix), tail)).otherwise(u)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443(?=[/?#]|$)", r"$1")
    # tracking-param drop, scoped to the QUERY part only (split at the
    # first '?') so a legal unencoded '&' or '&utm_x=' segment in the
    # PATH can never be touched; the ordered three-step drop keeps
    # separators exact:
    trk = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)"
    pre = F.regexp_extract(u, r"^([^?]*)", 1)
    qry = F.regexp_replace(u, r"^[^?]*", "")  # '?...' or ''
    # (a) non-first tracking params, with their '&'
    qry = F.regexp_replace(qry, r"&" + trk + r"=[^&#]*", "")
    # (b) a first tracking param with a successor: '?utm..=v&' -> '?'
    qry = F.regexp_replace(qry, r"^\?" + trk + r"=[^&#]*&", "?")
    # (c) a lone first tracking param: '?utm..=v' -> ''
    qry = F.regexp_replace(qry, r"^\?" + trk + r"=[^&#]*$", "")
    u = F.concat(pre, qry)
    u = F.regexp_replace(u, r"\?$", "")
    u = F.regexp_replace(u, r"([^/])/(?=$|[?#])", r"$1")
    return u


def canonicalize_pages(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """pages with `url` replaced by its canonical form (the recrawl
    key) and the original kept as `raw_url` — map-only, codegen'd."""
    from pyspark.sql import functions as F

    return pages.withColumn("raw_url", F.col(url_col)).withColumn(
        url_col, canonical_url(F.col(url_col))
    )
