"""Testdata table loaders (TPC-H-ish star schema + documents/
embeddings/events at /root/testdata/sf*/)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic Common-Crawl-style pages table derived from the
    documents table (north_rule input shape: url, warc_ts, html, text,
    lang) — warc_ts spreads doc_ids over 400 days from 2024-01-01, so
    year/month partitioning has real fan-out and the DuckDB oracle can
    recompute the same timestamps from doc_id."""
    from pyspark.sql import functions as F

    ts = F.to_timestamp(
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("doc_id") % 400).cast("int"))
    )
    return docs.select(
        F.concat(F.lit("https://example.test/doc/"), F.col("doc_id")).alias("url"),
        ts.alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
        F.col("n_chars"),
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
    )


def source_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cache key for derived /tmp artifacts: path + (name, size, mtime)
    of every file of the source table — a regenerated testdata dir gets
    a NEW key, so stale derived caches can never feed the oracle."""
    import hashlib

    h = hashlib.sha1(os.path.abspath(sf_dir).encode())
    root = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(root):
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    elif os.path.exists(root):
        st = os.stat(root)
        h.update(f"{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:12]


def write_pages_partitioned(spark: SparkSession, sf_dir: str, base_dir: str | None = None) -> str:
    """Materialize the pages table partitioned by (year, month) — the
    SURVEY §2.8 layout: at 10^12 rows a month filter must prune at the
    DIRECTORY level, never scan-and-filter. Idempotent per source-data
    fingerprint (marker file); returns the parquet root."""
    import tempfile

    tag = source_fingerprint(sf_dir)
    out = base_dir or os.path.join(tempfile.gettempdir(), f"rrs_pages_{tag}")
    marker = os.path.join(out, "_rrs_done")
    if not os.path.exists(marker):
        pages = pages_from_documents(load_table(spark, sf_dir, "documents"))
        pages.write.mode("overwrite").partitionBy("year", "month").parquet(out)
        with open(marker, "w") as fh:
            fh.write(sf_dir)
    return out


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath (not in this
    image; kept as the documented scale path)."""
    try:
        spark.sql("SELECT 1").collect()
        return "org.apache.iceberg" in spark.sparkContext._jsc.sc().listJars().toString()
    except Exception:
        return False
