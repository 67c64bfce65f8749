"""Skewed-corpus stress properties (north_rule: "skew from hot cells
(popular domains/languages) is handled with salted repartitioning").

datagen's ``hot_frac`` routes that fraction of pages to ONE
domain+language with text from a 3-sentence sub-pool, so their
bag-of-token embeddings collapse into one tight region — the
worst-case hot-cell corpus. These tests pin:

1. the knob itself (deterministic, partition-invariant, default off);
2. the task-balance property the bench's ``skew_task_balance`` slot
   measures: after the cap-split cell assignment (the exact partitioning
   build_level's summarizer shuffle uses), no single task's input rows
   exceed a small multiple of the median — i.e. the adaptive split keeps
   a 30%-hot corpus from creating a straggler summarization task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.config import EngineConfig
from raptor_rag_spark.datagen import synthetic_pages
from raptor_rag_spark.operators.chunk import chunk_documents
from raptor_rag_spark.operators.embed import embed_texts
from raptor_rag_spark.operators.extract import extract_pages
from raptor_rag_spark.operators.tile import reduce_2d
from raptor_rag_spark.operators.tree import _assign_cells_with_cap

DIM = 64


def test_hot_frac_default_identical(spark):
    """hot_frac=0.0 must keep the historical corpus byte-identical —
    every existing golden / scaling artifact depends on it."""
    a = synthetic_pages(spark, n=40, seed=42).orderBy("page_id").collect()
    b = synthetic_pages(spark, n=40, seed=42, hot_frac=0.0).orderBy(
        "page_id"
    ).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_hot_frac_deterministic_and_partition_invariant(spark):
    one = synthetic_pages(
        spark, n=200, seed=7, partitions=1, hot_frac=0.3
    ).orderBy("page_id").collect()
    many = synthetic_pages(
        spark, n=200, seed=7, partitions=13, hot_frac=0.3
    ).orderBy("page_id").collect()
    assert [r.asDict() for r in one] == [r.asDict() for r in many]


def test_hot_frac_shares(spark):
    pages = synthetic_pages(spark, n=1000, seed=7, hot_frac=0.3)
    by_dom = (
        pages.withColumn("dom", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .groupBy("dom")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    # pid % 1000 < 300 -> exactly 300 of 1000 are the hot domain, plus
    # whatever the Zipf draw independently gives site00
    assert by_dom["dom"] == "site00.example"
    assert by_dom["count"] >= 300
    hot_lang = pages.filter(F.col("lang") == "tr").count()
    assert hot_lang >= 300


@pytest.fixture(scope="module")
def hot_nodes(spark):
    pages = synthetic_pages(spark, n=1500, seed=777, partitions=8, hot_frac=0.3)
    docs = extract_pages(pages, passthrough=("page_id",)).select(
        F.col("page_id").alias("doc_id"), "text"
    )
    chunks = chunk_documents(docs, max_tokens=60)
    nodes = (
        embed_texts(chunks, dim=DIM)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )
    return reduce_2d(nodes, dim=DIM).localCheckpoint(eager=True)


def test_hot_corpus_task_balance(spark, hot_nodes):
    """The summarizer-shuffle balance metric: hash-partition the
    cap-split assignment on cell_id (exactly what build_level does)
    and require max task rows <= 4x the median non-empty task. Without
    the adaptive cap-split (fixed-resolution tiling), the hot blob
    lands in ~one cell -> one task owns ~30% of the corpus and the
    ratio blows past this bound."""
    assigned = _assign_cells_with_cap(hot_nodes, 4, EngineConfig(embedding_dim=DIM))
    par = 8
    counts = sorted(
        r["count"]
        for r in assigned.repartition(par, "cell_id")
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    median = counts[len(counts) // 2]
    assert median > 0
    assert max(counts) <= 4 * median, counts


def test_hot_corpus_no_giant_cell(spark, hot_nodes):
    """The cap-split must break the hot blob into many cells: the
    biggest single cell (one summarizer GROUP = indivisible task work)
    stays under 20% of the corpus even though one 'domain' owns 30%."""
    assigned = _assign_cells_with_cap(hot_nodes, 4, EngineConfig(embedding_dim=DIM))
    total = assigned.count()
    top = assigned.groupBy("cell_id").count().agg(F.max("count")).first()[0]
    assert top / total < 0.2, (top, total)
