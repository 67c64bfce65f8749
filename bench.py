"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default all cores).

Extras:
- "throughput": docs/sec for the build pipeline + queries/sec for the
  flagship tile-pruned kNN join;
- "scaling": the north_rule two-cluster-size evidence — the same build
  job at local[8] and local[32] (fresh JVM each, timed after session
  warmup), throughput at both and efficiency = (t8/t32)/(32/8).
  Disable with SPARK_GRAFT_SCALING=0.

Internal: `python bench.py --worker <cores>` runs the scaling job in a
child process and prints its own JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
DIM = 64


def _spark(cores: int, name: str):
    from raptor_rag_spark.session import get_spark

    return get_spark(name, cores=cores)


def build_pipeline(spark, sf_dir: str):
    """docs -> chunks -> embed -> reduce -> tile -> per-cell rollup.
    Returns (n_docs, n_chunks) after materializing the whole plan."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.tile import reduce_2d, tile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    chunks = chunk_documents(docs, max_tokens=60)
    nodes = embed_texts(chunks, dim=DIM).withColumnRenamed("chunk_id", "node_id")
    nodes = reduce_2d(nodes, dim=DIM)
    tiled = tile(nodes, 4)
    rollup = tiled.groupBy("cell_id").agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("tok")
    )
    n_chunks = rollup.agg(F.sum("n")).first()[0]
    return n_docs, int(n_chunks)


def corpus_nodes(spark, sf_dir: str):
    """Materialized chunk-node table + tiles (the retrieval corpus)."""
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.tile import reduce_2d, tile_assignments

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=60)
    nodes = (
        embed_texts(chunks, dim=DIM)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "embedding")
    )
    nodes = reduce_2d(nodes, dim=DIM).localCheckpoint(eager=True)
    tiles = tile_assignments(nodes, "node_id", [3]).localCheckpoint(eager=True)
    return nodes, tiles


def knn_flagship(spark, nodes, tiles, n_queries: int = 200, k: int = 10):
    """Tile-pruned kNN of n_queries chunk vectors against all chunks
    (retrieval only — corpus already materialized)."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.knn import tile_knn

    q = (
        nodes.orderBy("node_id")
        .limit(n_queries)
        .select(
            F.col("node_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
            "x",
            "y",
        )
    )
    out = tile_knn(q, nodes.select("node_id", "embedding"), tiles, resolution=3, k=k, ring=1, max_ring=16)
    return out.count()


def scaling_worker(cores: int) -> None:
    spark = _spark(cores, f"bench-scaling-{cores}")
    spark.range(1).count()  # warm the session
    t0 = time.time()
    n_docs, n_chunks = build_pipeline(spark, SF_DIR)
    nodes, tiles = corpus_nodes(spark, SF_DIR)
    knn_flagship(spark, nodes, tiles, n_queries=128, k=10)
    elapsed = time.time() - t0
    print(json.dumps({"cores": cores, "elapsed": elapsed, "docs": n_docs, "chunks": n_chunks}))
    spark.stop()


def run_scaling() -> dict:
    out = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        out[cores] = json.loads(line)
    t8, t32 = out[8]["elapsed"], out[32]["elapsed"]
    docs = out[8]["docs"]
    speedup = t8 / t32
    return {
        "cores_small": 8,
        "cores_large": 32,
        "elapsed_c8_sec": round(t8, 2),
        "elapsed_c32_sec": round(t32, 2),
        "docs_per_sec_c8": round(docs / t8, 2),
        "docs_per_sec_c32": round(docs / t32, 2),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / 4.0, 3),
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        scaling_worker(int(sys.argv[2]))
        return

    import __spark_entry__ as em

    spark = _spark(CPUS, "bench")
    spark.range(1).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    t_total0 = time.time()
    n_docs_holder = {}

    def _build():
        n_docs, n_chunks = build_pipeline(spark, SF_DIR)
        n_docs_holder["docs"] = n_docs
        n_docs_holder["chunks"] = n_chunks

    timed("build_pipeline", _build)
    corpus = {}
    timed("corpus_materialize", lambda: corpus.update(zip(("nodes", "tiles"), corpus_nodes(spark, SF_DIR))))
    timed("knn_tiled_200q", lambda: knn_flagship(spark, corpus["nodes"], corpus["tiles"], 200, 10))
    timed("knn_tiled_1000q", lambda: knn_flagship(spark, corpus["nodes"], corpus["tiles"], 1000, 10))

    queries = em.queries()
    for name in (
        "pricing_summary",
        "knn_brute",
        "knn_tiled",
        "tile_assign",
        "cell_rollup",
        "density_raster",
        "pip",
        "dedup_exact",
        "ngram_jaccard",
        "minhash_pairs",
        "quality",
        "lang_id",
        "sessionize",
        "tumbling_window",
        "topk_per_group",
        "running_budget",
        "join_agg",
        "embedding_neardup",
    ):
        timed(name, lambda n=name: queries[n](spark, SF_DIR).count())

    total = round(time.time() - t_total0, 3)
    build_t = timings["build_pipeline"]
    knn_t = timings["knn_tiled_1000q"]
    result = {
        "metric": "tree-build + kNN-retrieval throughput (tile engine, sf headline suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "throughput": {
            "build_docs_per_sec": round(n_docs_holder.get("docs", 0) / build_t, 2),
            "build_chunks_per_sec": round(n_docs_holder.get("chunks", 0) / build_t, 2),
            "knn_queries_per_sec": round(1000 / knn_t, 2),
        },
    }
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        result["scaling"] = run_scaling()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
