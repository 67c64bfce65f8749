"""Round-6 optimization probes (guide §1.1/§1.4): per-phase wall times
for the heaviest bench slots, each labelled with setJobDescription.
NOT part of the frozen bench contract — numbers are cited in
OPTIMIZATION_r06.md. Usage: python bench_extra.py [probe ...]
(default: all). Probes: tree, ivf, knn, append, ann, save_ann
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
DIM = 64

T: dict[str, float] = {}


def timed(name: str, fn):
    t0 = time.time()
    out = fn()
    T[name] = round(time.time() - t0, 3)
    print(f"  {name}: {T[name]:.2f}s", flush=True)
    return out


def get_leaves(spark):
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=60)
    return (
        embed_texts(chunks, dim=DIM)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )


def probe_tree(spark):
    from raptor_rag_spark.config import EngineConfig
    from raptor_rag_spark.operators.tree import build_tree, read_manifest

    print("== tree_build_full ==")
    leaves = get_leaves(spark)
    base = tempfile.mkdtemp(prefix="probe_tree_")
    t0 = time.time()
    build_tree(
        spark, leaves, base, EngineConfig(embedding_dim=DIM),
        start_resolution=4, max_layers=6, embed_dim=DIM,
    ).count()
    print(f"  total: {time.time() - t0:.2f}s")
    lvl = 0
    while os.path.exists(os.path.join(base, f"level={lvl}", "_MANIFEST.json")):
        m = read_manifest(base, lvl)
        print(f"  level {lvl}: rows={m['rows']} wall={m['wall_sec']}s")
        lvl += 1
    return base


def probe_ivf(spark):
    import shutil

    from raptor_rag_spark.operators.ivf import IvfIndex
    from raptor_rag_spark.operators.tile import adaptive_tile_assignments, reduce_2d

    print("== ivf build+save ==")
    leaves = get_leaves(spark)
    nodes = reduce_2d(
        leaves.select("node_id", "embedding"), dim=DIM
    ).localCheckpoint(eager=True)
    idx = timed("ivf_build", lambda: IvfIndex(
        nodes.select("node_id", "embedding"), dim=DIM, nlist=64, seed=42))
    qidx = timed("ivf_build_quantized", lambda: IvfIndex(
        nodes.select("node_id", "embedding"), dim=DIM, nlist=64, seed=42,
        quantized=True))
    base = tempfile.mkdtemp(prefix="probe_ivf_")
    timed("ivf_save_float", lambda: idx.save(os.path.join(base, "flt")))
    timed("ivf_save_int8", lambda: qidx.save(os.path.join(base, "int8")))
    shutil.rmtree(base, ignore_errors=True)


def probe_knn(spark):
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.knn import tile_knn_adaptive
    from raptor_rag_spark.operators.tile import adaptive_tile_assignments, reduce_2d

    print("== knn adaptive ==")
    leaves = get_leaves(spark)
    nodes = timed("corpus_nodes", lambda: reduce_2d(
        leaves.select("node_id", "embedding"), dim=DIM
    ).localCheckpoint(eager=True))
    tiles = timed("corpus_tiles", lambda: adaptive_tile_assignments(
        nodes, "node_id", base_resolution=3, max_occupancy=256, max_resolution=9
    ).localCheckpoint(eager=True))
    q = (
        nodes.orderBy("node_id").limit(1000)
        .select(F.col("node_id").alias("query_id"),
                F.col("embedding").alias("q_embedding"), "x", "y")
    )
    timed("knn_1000q_warm", lambda: tile_knn_adaptive(
        q, nodes.select("node_id", "embedding"), tiles, k=10, ring=3, max_ring=8
    ).count())
    timed("knn_1000q_2nd", lambda: tile_knn_adaptive(
        q, nodes.select("node_id", "embedding"), tiles, k=10, ring=3, max_ring=8
    ).count())


def probe_append(spark):
    import shutil

    from pyspark.sql import functions as F

    from raptor_rag_spark.config import EngineConfig
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.tile import reduce_2d
    from raptor_rag_spark.streaming.incremental import incremental_update

    print("== incremental append 1pct ==")
    base = probe_tree(spark)
    cfg = EngineConfig(embedding_dim=DIM)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 100 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    chunks = chunk_documents(docs, max_tokens=60)
    leaves = (
        embed_texts(chunks, dim=DIM)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )
    leaves = reduce_2d(leaves, dim=DIM, seed=cfg.seed)
    timed("incremental_append_1pct", lambda: incremental_update(
        spark, base, leaves, cfg, start_resolution=4, max_layers=6, embed_dim=DIM
    ).count())
    shutil.rmtree(base, ignore_errors=True)


def probe_ann(spark):
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.similarity import TileAnnIndex
    from raptor_rag_spark.operators.tile import reduce_2d

    print("== TileAnnIndex build+search ==")
    leaves = get_leaves(spark)
    nodes = reduce_2d(
        leaves.select("node_id", "embedding"), dim=DIM
    ).localCheckpoint(eager=True)
    idx = timed("ann_build_2proj", lambda: TileAnnIndex(
        nodes.select("node_id", "embedding"), dim=DIM, seeds=(224, 777),
        base_resolution=3, max_occupancy=256, max_resolution=9))
    q = (
        nodes.orderBy("node_id").limit(1000)
        .select(F.col("node_id").alias("query_id"),
                F.col("embedding").alias("q_embedding"))
    )
    timed("ann_search_1000q", lambda: idx.search(q, k=10, ring=2)
          .write.format("noop").mode("overwrite").save())
    timed("ann_search_1000q_2nd", lambda: idx.search(q, k=10, ring=2)
          .write.format("noop").mode("overwrite").save())


def probe_planned(spark):
    """Per-day wall of the planned-append slot: which days flush and
    what the non-flush floor is."""
    import shutil

    from pyspark.sql import functions as F

    from raptor_rag_spark.config import EngineConfig
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.tile import reduce_2d
    from raptor_rag_spark.streaming.incremental import (
        incremental_update_planned,
        read_pending,
    )

    base = probe_tree(spark)
    cfg = EngineConfig(embedding_dim=DIM)
    planned = base + "_planned"
    shutil.copytree(base, planned)
    for day in range(5):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") % 100 == day)
            .withColumn("doc_id", F.col("doc_id") + F.lit(20_000_000 + day * 1_000_000))
        )
        chunks = chunk_documents(docs, max_tokens=60)
        leaves = (
            embed_texts(chunks, dim=DIM)
            .withColumnRenamed("chunk_id", "node_id")
            .select("node_id", "text", "n_tokens", "embedding")
        )
        leaves = reduce_2d(leaves, dim=DIM, seed=cfg.seed)
        timed(f"planned_day{day}", lambda lv=leaves, d=day: incremental_update_planned(
            spark, planned, lv, cfg, start_resolution=4, max_layers=6,
            embed_dim=DIM, min_pending_per_cell=4, force_flush=(d == 4),
        ).count())
    print("  flushes:", [
        {k: f[k] for k in ("cells", "recomputed_parents", "forced")}
        for f in read_pending(planned)["flushes"]
    ])
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(planned, ignore_errors=True)


PROBES = {
    "tree": probe_tree,
    "ivf": probe_ivf,
    "knn": probe_knn,
    "append": probe_append,
    "ann": probe_ann,
    "planned": probe_planned,
}


def main():
    from raptor_rag_spark.session import get_spark

    which = sys.argv[1:] or list(PROBES)
    spark = get_spark("bench-extra", cores=CPUS)
    spark.range(1).count()
    t0 = time.time()
    for name in which:
        PROBES[name](spark)
    print(json.dumps({"probe_timings": T, "wall": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
