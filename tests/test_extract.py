"""HTML->text extraction: byte-identical goldens (input_hint per-row
invariant) + synthetic-pages round trip (extracted text == source text
for the datagen template)."""

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.datagen import synthetic_pages
from raptor_rag_spark.operators.extract import extract_pages, extract_text

# pinned goldens: html bytes -> exact extracted text
GOLDENS = [
    (b"<html><body><p>Hello world</p></body></html>", "Hello world"),
    (
        b"<html><head><title>T</title><style>p{color:red}</style>"
        b"<script>var x=1;</script></head><body><p>A</p><p>B</p></body></html>",
        "T\nA\nB",
    ),
    (b"<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &#120; &#x41;</p>", 'a & b <c> "d" \'e\' x A'),
    (b"line<br>break<br/>again", "line\nbreak\nagain"),
    (b"<div>first</div><div>second</div>", "first\nsecond"),
    (b"<!-- comment --><p>kept</p>", "kept"),
    (b"  spaced\t\tout  ", "spaced out"),
    (b"", ""),
    ("türkçe çğıöşü <b>bold</b>".encode(), "türkçe çğıöşü bold"),
]


def test_extract_goldens_bytes_exact():
    for html, want in GOLDENS:
        assert extract_text(html) == want, html


def test_extract_idempotent_and_null_safe():
    assert extract_text(None) == ""
    for html, _ in GOLDENS:
        once = extract_text(html)
        if "<" in once:
            continue  # decoded entities may re-read as tags — not idempotent by design
        assert extract_text(once.encode("utf-8")) == once  # no tags left


@pytest.mark.spark
def test_extract_pages_roundtrip_synthetic(spark):
    """The datagen html template wraps text in <p>; extraction must
    recover 'title\\n' + text with template whitespace normalization."""
    pages = synthetic_pages(spark, n=64, seed=42).cache()
    ext = extract_pages(pages)
    joined = pages.select("url", F.col("text").alias("src")).join(ext, "url")
    rows = joined.collect()
    assert len(rows) == 64
    for r in rows:
        # template: <title>Page i on domain</title> ... <p>{text}</p>
        got = r["text"]
        title, _, body = got.partition("\n")
        assert title.startswith("Page ")
        # body == source text with whitespace collapsed per extractor rules
        want_body = "\n".join(
            " ".join(part.split(" ")).strip()
            for part in r["src"].split("\n")
        )
        # extractor collapses horizontal ws and strips lines
        norm_src = "\n".join(
            s.strip() for s in r["src"].replace("\t", " ").split("\n") if s.strip()
        )
        import re

        norm_src = "\n".join(re.sub(r" +", " ", line) for line in norm_src.split("\n"))
        assert body == norm_src, (body[:80], norm_src[:80])


@pytest.mark.spark
def test_extract_column_pruning(spark, tmp_path_factory):
    """The scan under extract_pages must read ONLY url+html."""
    base = str(tmp_path_factory.mktemp("pages"))
    synthetic_pages(spark, n=32, seed=1).write.mode("overwrite").parquet(base)
    df = spark.read.parquet(base)
    plan = extract_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[-1][:400] or "html" in plan
    # precise check: ReadSchema carries only url+html
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"url", "html"}, cols


def test_canonical_url_cases(spark):
    from raptor_rag_spark.operators.extract import canonical_url
    from pyspark.sql import functions as F

    cases = [
        # scheme/host case, fragment, default port
        ("HTTP://Example.COM:80/Path#frag", "http://example.com/Path"),
        ("https://Ex.com:443/a/", "https://ex.com/a"),
        # non-default port kept, path case kept
        ("http://ex.com:8080/A/B/", "http://ex.com:8080/A/B"),
        # tracking params: first with successor, non-first, lone
        ("http://ex.com/p?utm_source=x&k=1", "http://ex.com/p?k=1"),
        ("http://ex.com/p?k=1&utm_source=x", "http://ex.com/p?k=1"),
        ("http://ex.com/p?fbclid=abc", "http://ex.com/p"),
        ("http://ex.com/p?utm_a=1&utm_b=2&k=3", "http://ex.com/p?k=3"),
        # legal unencoded '&' in the PATH must survive untouched
        ("http://ex.com/a&b", "http://ex.com/a&b"),
        # even a param-LOOKING path segment (drops are query-scoped)
        ("http://ex.com/a&utm_x=1/b?k=1", "http://ex.com/a&utm_x=1/b?k=1"),
        # only tracking params -> query gone entirely
        ("http://ex.com/p?utm_a=1&utm_b=2", "http://ex.com/p"),
        # root slash equated with empty path; bare '?' dropped
        ("http://ex.com/", "http://ex.com"),
        ("http://ex.com/p?", "http://ex.com/p"),
        # non-tracking params and their order preserved
        ("http://ex.com/p?b=2&a=1", "http://ex.com/p?b=2&a=1"),
        # NULL propagates
        (None, None),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_canonicalize_pages_then_keep_latest(spark):
    """The crawl-ingest pair: canonical url as the recrawl key."""
    from raptor_rag_spark.operators.dedup import keep_latest
    from raptor_rag_spark.operators.extract import canonicalize_pages
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            ("HTTP://Ex.com/a?utm_source=feed", "2024-01-01 00:00:00", 1),
            ("http://ex.com/a", "2024-06-01 00:00:00", 2),
            ("http://ex.com/b", "2024-01-01 00:00:00", 3),
        ],
        "url string, warc_ts string, fetch_id long",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    canon = canonicalize_pages(pages)
    kept = keep_latest(canon, ["url"], "warc_ts", tie_cols=["fetch_id"])
    rows = {r["url"]: r for r in kept.collect()}
    assert set(rows) == {"http://ex.com/a", "http://ex.com/b"}
    assert rows["http://ex.com/a"]["fetch_id"] == 2
    assert rows["http://ex.com/a"]["raw_url"] == "http://ex.com/a"
