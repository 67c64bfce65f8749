"""Int8 embedding quantization: reconstruction error bound and kNN
recall parity vs the exact float path on real testdata embeddings."""

import numpy as np
from pyspark.sql import functions as F

from raptor_rag_spark.operators.quantize import (
    brute_force_knn_quantized,
    quantize_embeddings,
)


def test_quantize_roundtrip_error_bound(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(emb)
    rows = q.select("embedding", "q_vec", "q_scale").limit(50).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        back = np.asarray(r["q_vec"], dtype=np.float64) * r["q_scale"]
        m = np.max(np.abs(v)) if v.size else 0.0
        # symmetric quantization: per-component error <= scale/2
        assert np.max(np.abs(v - back)) <= (m / 127.0) / 2 + 1e-9
        assert len(r["q_vec"]) == len(v)


def test_quantized_knn_recall_vs_exact(spark):
    from raptor_rag_spark.operators.knn import brute_force_knn

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(F.col("vec_id").alias("node_id"), "embedding")
        .cache()
    )
    nodes_q = quantize_embeddings(emb).select("node_id", "q_vec", "q_scale").cache()
    queries = (
        emb.orderBy("node_id")
        .limit(20)
        .select(
            F.col("node_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        )
    )
    exact = brute_force_knn(queries, emb, k=10, strategy="broadcast")
    quant = brute_force_knn_quantized(queries, nodes_q, k=10)
    inter = exact.select("query_id", "node_id").intersect(
        quant.select("query_id", "node_id")
    )
    recall = inter.count() / exact.count()
    assert recall >= 0.95, recall


def test_quantize_null_and_zero_vectors(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [1.0, -2.0])],
        "id long, embedding array<float>",
    )
    rows = {r["id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[0]["q_vec"] == [0, 0] and rows[0]["q_scale"] == 0.0
    assert rows[1]["q_vec"] is None and rows[1]["q_scale"] is None
    assert rows[2]["q_vec"][1] == -127
