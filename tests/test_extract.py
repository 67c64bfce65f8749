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
