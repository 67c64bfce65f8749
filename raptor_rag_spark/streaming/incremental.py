"""Incremental / streaming ingestion of new pages."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from raptor_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from raptor_rag_spark.operators.chunk import chunk_documents
from raptor_rag_spark.operators.embed import embed_texts
from raptor_rag_spark.operators.extract import extract_pages
from raptor_rag_spark.operators.tile import reduce_2d


def incremental_level0(
    pages: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    dim: int | None = None,
) -> DataFrame:
    """New pages batch -> level-0 node rows (extract -> chunk -> embed
    -> reduce). Pure function of the batch; append to the level-0
    checkpoint and re-aggregate touched cells upstream."""
    dim = dim or cfg.embedding_dim
    txt = extract_pages(pages)
    # stable doc id: page_id when present, else a 64-bit url hash
    from pyspark.sql import functions as F

    if "page_id" in pages.columns:
        txt = txt.join(pages.select("url", "page_id"), "url")
        docs = txt.withColumn("doc_id", F.col("page_id"))
        id_scheme = "arith"
    else:
        # full-range 64-bit url hash: the arith chunk_id scheme would
        # overflow (ANSI crash) — use the hashed scheme
        docs = txt.withColumn("doc_id", F.xxhash64("url"))
        id_scheme = "hash"
    chunks = chunk_documents(docs, max_tokens=cfg.max_tokens, id_scheme=id_scheme)
    nodes = (
        embed_texts(chunks, dim=dim)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )
    return reduce_2d(nodes, dim=dim, seed=cfg.seed)


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """Structured Streaming wrapper: watch a directory of page parquet
    files, run the same batch logic per micro-batch via foreachBatch,
    append level-0 rows to out_dir. Returns the StreamingQuery."""
    from raptor_rag_spark.datagen import PAGES_SCHEMA

    stream = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.take(1):
            incremental_level0(batch_df, cfg).write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
