"""Incremental / Structured Streaming ingestion."""

from pyspark.sql import functions as F

from raptor_rag_spark.datagen import synthetic_pages
from raptor_rag_spark.streaming import incremental_level0, stream_pages


def test_incremental_level0_batch(spark):
    pages = synthetic_pages(spark, n=32, seed=5)
    nodes = incremental_level0(pages, dim=32)
    rows = nodes.collect()
    assert rows
    cols = set(nodes.columns)
    assert {"node_id", "text", "n_tokens", "embedding", "x", "y"} <= cols
    assert all(abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-5 for r in rows)


def test_stream_pages_available_now(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    chk = str(tmp_path_factory.mktemp("stream_chk"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    synthetic_pages(spark, n=24, seed=6).write.mode("overwrite").parquet(src)

    q = stream_pages(spark, src, chk, out)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n1 = got.count()
    assert n1 > 0
    assert got.select(F.min(F.size("embedding"))).first()[0] == 64

    # append a second batch of pages -> only the new rows are processed
    synthetic_pages(spark, n=12, seed=7).withColumn(
        "page_id", F.col("page_id") + 1000
    ).write.mode("append").parquet(src)
    q2 = stream_pages(spark, src, chk, out)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1
