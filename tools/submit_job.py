"""spark-submit entry point (north_rule: "runs via spark-submit
--py-files on multi-executor clusters").

Usage:
    tools/package.sh             # builds dist/raptor_rag_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/raptor_rag_spark.zip \\
        tools/submit_job.py [sf_dir]

On a real cluster only --master changes; the zip ships the engine to
executors. The job runs the flagship slice (extract->chunk->embed->
tile->adaptive kNN) on synthetic pages and prints a JSON summary.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = SparkSession.builder.appName("raptor_rag_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from raptor_rag_spark.datagen import synthetic_pages
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.extract import extract_pages
    from raptor_rag_spark.operators.knn import tile_knn_adaptive
    from raptor_rag_spark.operators.tile import adaptive_tile_assignments, reduce_2d

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    t0 = time.time()
    pages = synthetic_pages(spark, n=n, seed=42)
    docs = extract_pages(pages, passthrough=("page_id",)).select(
        F.col("page_id").alias("doc_id"), "text"
    )
    chunks = chunk_documents(docs, max_tokens=60)
    nodes = (
        embed_texts(chunks, dim=64)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "embedding")
    )
    nodes = reduce_2d(nodes, dim=64).localCheckpoint(eager=True)
    tiles = adaptive_tile_assignments(nodes, "node_id", 3, 256, 9)
    q = nodes.limit(16).select(
        F.col("node_id").alias("query_id"), F.col("embedding").alias("q_embedding"), "x", "y"
    )
    hits = tile_knn_adaptive(
        q, nodes.select("node_id", "embedding"), tiles, k=5, ring=2, max_ring=8
    ).count()
    print(
        json.dumps(
            {
                "ok": True,
                "pages": n,
                "nodes": nodes.count(),
                "knn_hits": int(hits),
                "wall_sec": round(time.time() - t0, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
