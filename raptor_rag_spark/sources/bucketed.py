"""Bucketed node store — hash-bucketed table layout for the retrieval
hot path (Spark `bucketBy`, the warehouse-native analogue of the
reference's on-disk FAISS index co-location).

Why this exists at 100 TB: every retrieval join (children dereference,
text/metadata attach after ranking, node-matrix reuse across query
batches) keys on ``node_id``. Against a plain parquet node table each
such join shuffles the FULL node side every time — at 10^12 documents
that is the single largest recurring shuffle in the system. Writing
the collapsed node table ONCE as a table bucketed by ``node_id``
(``bucketBy(n, "node_id").sortBy("node_id")``) makes Spark's scan
report a hash-partitioned, sorted output layout, so sort-merge joins
and aggregations on ``node_id`` need NO Exchange (and no Sort) on the
node side — the one-time bucketed write amortizes across every
subsequent retrieval batch. The same applies to the documents table
bucketed by ``doc_id`` for dedup/attach joins.

Bucket count rule of thumb at scale: total table bytes / 256 MB,
rounded to a power of two; in the sandbox tests use small counts.
Two tables bucketed on the join key with the SAME bucket count join
exchange-free on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...] = ("node_id",),
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Write ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_cols``; returns the re-read table DataFrame whose scan
    carries the bucketed distribution. ``path`` makes it an external
    table (tests point this at a tmp dir); default is the session
    warehouse. Overwrites any existing table of the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # co-locate each bucket before the write: a bucketed write emits
    # one file PER (task x bucket) — at P input partitions that is up
    # to P*n_buckets small files (guide §6's small-files problem, paid
    # again on every subsequent read). repartition on the bucket key
    # uses the same Murmur3 hash family as the bucket layout, so each
    # task holds whole buckets and writes ~one file per bucket.
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (scan reports the bucket layout)."""
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan —
    the co-location assertion used by tests and plan audits."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
