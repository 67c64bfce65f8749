"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — full engine slice on sf0.001: documents
-> chunks -> embeddings -> 2-D reduction -> quadkey tiles ->
tile-pruned kNN join (ring expansion) -> token-budget prefix ->
per-query context. Returns the selected-node rows (stable schema).

queries()/oracle_sql(): operator catalog with DuckDB oracles — see
raptor_rag_spark/plans/driver_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile-pruned kNN retrieval over sf0.001 documents."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts
    from raptor_rag_spark.operators.knn import tile_knn, token_budget_prefix
    from raptor_rag_spark.operators.tile import reduce_2d, tile_assignments

    dim, k, res = 64, 5, 3
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=60)
    nodes = (
        embed_texts(chunks, dim=dim)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )
    nodes = reduce_2d(nodes, dim=dim).cache()
    tiles = tile_assignments(nodes, "node_id", [res]).cache()

    queries = spark.createDataFrame(
        [
            (0, "table scan join order"),
            (1, "window aggregate group"),
            (2, "stream filter data row"),
            (3, "hash merge sort key"),
            (4, "customer line part value"),
        ],
        "query_id long, text string",
    )
    q = embed_texts(queries, dim=dim)
    q = reduce_2d(q, dim=dim).withColumnRenamed("embedding", "q_embedding")

    ranked = tile_knn(
        q, nodes.select("node_id", "embedding"), tiles,
        resolution=res, k=k, ring=1, max_ring=1 << (res + 1),
    )
    sel = ranked.join(nodes.select("node_id", "n_tokens"), "node_id")
    kept = token_budget_prefix(sel, max_tokens=500)
    return kept.select(
        "query_id", "node_id", "rank", F.round("dist", 6).alias("dist"), "cum_tokens"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from raptor_rag_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raptor_rag_spark.plans.driver_queries import oracle_sql_map

    return oracle_sql_map()
