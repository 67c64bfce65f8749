"""Bucketed node store: co-located (exchange-free) joins/aggs on
node_id, row parity with the plain layout, facade integration."""

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.sources.bucketed import n_exchanges, read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    df = spark.range(5000).select(
        F.col("id").alias("node_id"),
        (F.col("id") % 17).alias("layer"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    plain_path = str(d / "plain")
    df.write.mode("overwrite").parquet(plain_path)
    t1 = write_bucketed(df, "bk_nodes", n_buckets=8, path=str(d / "t1"))
    t2 = write_bucketed(
        df.select("node_id", F.col("text").alias("text2")),
        "bk_nodes2",
        n_buckets=8,
        path=str(d / "t2"),
    )
    yield {"df": df, "plain": spark.read.parquet(plain_path), "t1": t1, "t2": t2}
    spark.sql("DROP TABLE IF EXISTS bk_nodes")
    spark.sql("DROP TABLE IF EXISTS bk_nodes2")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_roundtrip_row_parity(spark, stores):
    got = sorted(
        (r["node_id"], r["layer"], r["text"])
        for r in read_bucketed(spark, "bk_nodes").collect()
    )
    want = sorted(
        (r["node_id"], r["layer"], r["text"]) for r in stores["df"].collect()
    )
    assert got == want


def test_bucketed_join_is_exchange_free(stores, no_broadcast):
    j = stores["t1"].join(stores["t2"], "node_id")
    assert n_exchanges(j) == 0
    plain = stores["plain"]
    jp = plain.join(plain.select("node_id", F.col("text").alias("text2")), "node_id")
    assert n_exchanges(jp) >= 1
    assert j.count() == jp.count() == 5000


def test_bucketed_agg_is_exchange_free(stores):
    g = stores["t1"].groupBy("node_id").agg(F.count("*").alias("n"))
    assert n_exchanges(g) == 0
    gp = stores["plain"].groupBy("node_id").agg(F.count("*").alias("n"))
    assert n_exchanges(gp) >= 1
    assert g.count() == 5000


def test_one_sided_retrieval_join_shuffles_only_query_side(stores, no_broadcast):
    ranked = stores["plain"].filter(F.col("node_id") % 50 == 0).select("node_id")
    j = ranked.hint("merge").join(stores["t1"], "node_id")
    # the node-table side is co-located; only the small ranked side hashes
    assert n_exchanges(j) == 1
    assert j.count() == 100


def test_facade_store_swap_preserves_retrieval(spark, tmp_path_factory):
    from raptor_rag_spark.api import RaptorEngine
    from raptor_rag_spark.config import EngineConfig
    from raptor_rag_spark.datagen import synthetic_pages

    base = tmp_path_factory.mktemp("bk_api")
    eng = RaptorEngine(
        spark,
        str(base / "tree"),
        EngineConfig(embedding_dim=32, min_level_nodes=4),
        embed_dim=32,
        start_resolution=3,
    )
    docs = synthetic_pages(spark, n=60, seed=7).select(
        F.col("page_id").alias("doc_id"), "text"
    )
    eng.add_documents(docs)
    before = eng.retrieve(["veri isleme", "shuffle"], top_k=3, max_tokens=300)
    stored = eng.materialize_node_store(
        "bk_engine_nodes", n_buckets=4, path=str(base / "store")
    )
    try:
        assert stored.count() == eng.nodes.count()
        after = eng.retrieve(["veri isleme", "shuffle"], top_k=3, max_tokens=300)
        assert after == before
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_engine_nodes")
