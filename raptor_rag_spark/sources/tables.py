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


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath (not in this
    image; kept as the documented scale path)."""
    try:
        spark.sql("SELECT 1").collect()
        return "org.apache.iceberg" in spark.sparkContext._jsc.sc().listJars().toString()
    except Exception:
        return False
