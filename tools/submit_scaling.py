"""Two-cluster-size scaling evidence THROUGH the deploy path.

Runs the exact job `bench.py:scaling_worker` times (synthesize pages
-> extract -> chunk -> embed -> reduce -> tile -> rollup; one lazy
plan, one action; fixed 128 input / 64 shuffle partitions) — but
launched the way the north rule words it: ``spark-submit --py-files
dist/raptor_rag_spark.zip`` from a non-repo cwd, so the engine code
reaches executors via the shipped zip, not the driver's cwd.

    tools/package.sh
    cd /tmp && spark-submit --master local[2] \
        --conf spark.sql.shuffle.partitions=64 \
        --py-files /root/repo/dist/raptor_rag_spark.zip \
        /root/repo/tools/submit_scaling.py 120000

Prints one JSON line {cores, elapsed, docs, chunks}. Run at N and 4N
cores and compare mins over interleaved repeats (see
tools/run_submit_scaling.sh).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = SparkSession.builder.appName("raptor_submit_scaling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from raptor_rag_spark.datagen import synthetic_pages
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.extract import extract_pages
    from raptor_rag_spark.operators.tile import reduce_2d, tile

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120000

    def job(n: int, seed: int, partitions: int) -> int:
        pages = synthetic_pages(spark, n=n, seed=seed, partitions=partitions)
        docs = extract_pages(pages, passthrough=("page_id",)).select(
            F.col("page_id").alias("doc_id"), "text"
        )
        chunks = chunk_documents(docs, max_tokens=60)
        nodes = (
            embed_texts(chunks, dim=64)
            .withColumnRenamed("chunk_id", "node_id")
            .select("node_id", "n_tokens", "embedding")
        )
        nodes_xy = reduce_2d(nodes, dim=64)
        rollup = tile(nodes_xy, 4).groupBy("cell_id").agg(
            F.count("*").alias("c"), F.sum("n_tokens").alias("tok")
        )
        return int(rollup.agg(F.sum("c")).first()[0])

    job(256, seed=1, partitions=8)  # full-pipeline warmup, untimed
    t0 = time.time()
    n_chunks = job(n_docs, seed=42, partitions=128)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "cores": spark.sparkContext.defaultParallelism,
                "elapsed": round(elapsed, 2),
                "docs": n_docs,
                "chunks": n_chunks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
