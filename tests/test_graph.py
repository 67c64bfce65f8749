"""Connected components (large-star/small-star) vs a python union-find
oracle, plus the dedup-clustering and sampling contract operators."""

import random

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.graph import connected_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {i: find(i) for i in range(n_nodes)}


def _labels(spark, n_nodes, edges):
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src != src")
    v = spark.range(n_nodes).select(F.col("id"))
    out = connected_components(e, vertices=v)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_cc_path_graph_log_rounds(spark):
    # a 40-node chain: hash-min needs 40 rounds, star ops need ~log n
    edges = [(i, i + 1) for i in range(39)]
    got = _labels(spark, 40, edges)
    assert got == {i: 0 for i in range(40)}


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 50))
        ]
        want = _uf_components(n, edges)
        got = _labels(spark, n, edges)
        assert got == want, f"trial {trial}"


def test_cc_isolated_and_empty(spark):
    got = _labels(spark, 5, [])
    assert got == {i: i for i in range(5)}
    # two components + isolated vertices
    got = _labels(spark, 6, [(4, 5), (1, 2)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 4}


def test_cc_direction_and_duplicates_ignored(spark):
    got = _labels(spark, 4, [(2, 1), (1, 2), (2, 1), (3, 3)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 3}


def test_simhash_pairs_jvm_planted(spark):
    from raptor_rag_spark.operators.dedup import simhash_pairs_jvm

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today and tomorrow morning"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today and tomorrow morning the dog"),
        (2, "completely unrelated text about catalyst plans shuffle exchange partitioning statistics costs"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank today and tomorrow morning"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_jvm(docs, max_hamming=3).collect()
    }
    assert pairs.get((0, 3)) == 0  # exact dup
    # two appended words flip 2 of 48 bits (deterministic md5 hash)
    assert pairs.get((0, 1)) == 2
    assert pairs.get((1, 3)) == 2
    assert not any(2 in p for p in pairs)


def test_simhash_pairs_jvm_pigeonhole_guard():
    import pyspark.sql  # noqa: F401

    from raptor_rag_spark.operators.dedup import simhash_pairs_jvm

    with pytest.raises(ValueError):
        simhash_pairs_jvm(None, max_hamming=4, blocks=4)


def test_stratified_sample_deterministic_and_rated(spark):
    from raptor_rag_spark.operators.textstats import stratified_hash_sample

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    s1 = stratified_hash_sample(docs, rates_pct={"en": 20}, default_pct=50)
    s2 = stratified_hash_sample(docs, rates_pct={"en": 20}, default_pct=50)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())  # no RNG state
    by_lang = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 2000 - 0.20) < 0.05
    assert abs(by_lang["de"] / 2000 - 0.50) < 0.05
    # repartitioning must not change membership (the df.sample failure mode)
    s3 = stratified_hash_sample(
        docs.repartition(17), rates_pct={"en": 20}, default_pct=50
    )
    assert ids1 == sorted(r["doc_id"] for r in s3.collect())


def test_top_terms_shape_and_ties(spark):
    from raptor_rag_spark.operators.textstats import top_terms

    docs = spark.createDataFrame(
        [(0, "b b b a a c", "en"), (1, "x y y", "de")],
        "doc_id long, text string, lang string",
    )
    rows = top_terms(docs, k=2).collect()
    got = {(r["stratum"], r["rnk"]): (r["term"], r["tf"]) for r in rows}
    assert got[("en", 1)] == ("b", 3)
    assert got[("en", 2)] == ("a", 2)
    assert got[("de", 1)] == ("y", 2)
    assert got[("de", 2)] == ("x", 1)


def test_md5_fingerprint_udf_matches_jvm_expression(spark):
    from raptor_rag_spark.operators.textstats import (
        fingerprint_col,
        make_md5_fingerprint_udf,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog and more words here"),
        (1, "short doc"),
        (2, ""),
        (3, None),
        (4, "tab\tand\x0bvertical\ttab  runs\n\nnewlines"),
        (5, "Ünïcode CASE Müst Löwer the säme"),
        (6, "exactly eight words in this doc here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = make_md5_fingerprint_udf()
    got = df.select(
        "doc_id",
        fingerprint_col(F.col("text")).alias("jvm"),
        fp(F.col("text")).alias("arrow"),
    ).collect()
    for r in got:
        assert r["jvm"] == r["arrow"], (r["doc_id"], r["jvm"], r["arrow"])


def test_lang_id_udf_matches_jvm_expression(spark):
    from raptor_rag_spark.operators.textstats import lang_id, make_lang_id_udf

    rows = [
        (0, "the cat and the dog of it is that"),
        (1, "der hund ist nicht ein tier mit der katze"),
        (2, "no stop words whatsoever xyz qqq"),
        (3, ""),
        (4, None),
        (5, "de de de la la el"),          # es/fr tie material
        (6, "la de que un la de"),         # shared es/fr stopwords
        (7, "ve bir bu da ne"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lid = make_lang_id_udf()
    got = df.select(
        "doc_id", lang_id(F.col("text")).alias("jvm"), lid(F.col("text")).alias("arrow")
    ).collect()
    for r in got:
        assert r["jvm"] == r["arrow"], (r["doc_id"], r["jvm"], r["arrow"])
