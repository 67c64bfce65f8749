"""Deterministic training-order export: reproducibility across runs
and input layouts, totality, seed independence, plan shape."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.sources.training_export import (
    export_shard_paths,
    read_shuffled_export,
    shuffled_export_plan,
    write_shuffled_export,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )


def _shard_orders(out_dir):
    """Per-shard doc_id sequences as written on disk (file row order)."""
    orders = {}
    for p in export_shard_paths(out_dir):
        t = pq.read_table(p)
        orders[p.rsplit("=", 1)[1]] = t.column("doc_id").to_pylist()
    return orders


def test_export_reproducible_across_runs_and_layouts(spark, docs, tmp_path):
    """Same seed -> byte-order-identical shards, regardless of the
    input's partitioning (the permutation is a function of (id, seed),
    never of arrival order)."""
    a, b, c = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c")
    write_shuffled_export(docs, a, seed=7, shards=8)
    write_shuffled_export(docs, b, seed=7, shards=8)
    write_shuffled_export(docs.repartition(13), c, seed=7, shards=8)
    oa, ob, oc = _shard_orders(a), _shard_orders(b), _shard_orders(c)
    assert oa == ob == oc
    assert len(oa) == 8


def test_export_total_and_permutation(spark, docs, tmp_path):
    out = str(tmp_path / "x")
    write_shuffled_export(docs, out, seed=1, shards=4)
    orders = _shard_orders(out)
    flat = [i for shard in sorted(orders) for i in orders[shard]]
    assert sorted(flat) == list(range(500))  # every row exactly once
    assert flat != list(range(500))  # and actually shuffled


def test_export_seed_changes_order(spark, docs, tmp_path):
    a, b = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_shuffled_export(docs, a, seed=1, shards=4)
    write_shuffled_export(docs, b, seed=2, shards=4)
    assert _shard_orders(a) != _shard_orders(b)


def test_export_matches_reference_permutation(spark, docs, tmp_path):
    """The on-disk order equals the closed-form permutation: sort by
    (xxhash64(id, seed) % shards, xxhash64(id, seed), id)."""
    out = str(tmp_path / "ref")
    write_shuffled_export(docs, out, seed=3, shards=4)
    keyed = docs.select(
        "doc_id", F.xxhash64("doc_id", F.lit(3)).alias("k")
    ).collect()
    expect = {}
    for r in keyed:
        expect.setdefault(str(r["k"] % 4), []).append((r["k"], r["doc_id"]))
    expect = {s: [d for _, d in sorted(v)] for s, v in expect.items()}
    assert _shard_orders(out) == expect


def test_export_plan_single_exchange(spark, docs):
    plan = (
        shuffled_export_plan(docs, seed=1, shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan  # no runtime-sampled ranges
    # the sort is partition-local (global=false in the Sort operator),
    # never a global sort
    import re

    assert re.search(r"Sort \[[^\]]*\], false,", plan), plan
    assert not re.search(r"Sort \[[^\]]*\], true,", plan), plan


def test_read_shuffled_export_global_order(spark, docs, tmp_path):
    out = str(tmp_path / "r")
    write_shuffled_export(docs, out, seed=5, shards=4)
    rows = read_shuffled_export(spark, out).collect()
    keys = [(r["_shard"], r["_shuffle_key"]) for r in rows]
    assert keys == sorted(keys)
    assert sorted(r["doc_id"] for r in rows) == list(range(500))


# --------------------------------------------------- sequence packing


def test_pack_sequences_budget_and_totality(spark):
    from raptor_rag_spark.operators.chunk import pack_sequences

    chunks = spark.range(0, 300).select(
        F.col("id").alias("chunk_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(90)) + 10).cast("int").alias("n_tokens"),
    )
    out = pack_sequences(chunks, max_tokens=128, seed=1, shards=8).collect()
    assert sorted(r["chunk_id"] for r in out) == list(range(300))
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq_id, rows in by_seq.items():
        total = sum(r["n_tokens"] for r in rows)
        # budget holds except oversized singletons (none here: max 99)
        assert total <= 128, (seq_id, total)
        assert sorted(r["seq_pos"] for r in rows) == list(range(len(rows)))
        # a sequence never crosses shards
        assert len({r["_shard"] for r in rows}) == 1


def test_pack_sequences_deterministic_across_layouts(spark):
    from raptor_rag_spark.operators.chunk import pack_sequences

    chunks = spark.range(0, 200).select(
        F.col("id").alias("chunk_id"),
        (F.pmod(F.col("id"), F.lit(50)) + 1).cast("int").alias("n_tokens"),
    )
    a = pack_sequences(chunks, max_tokens=64, seed=2, shards=4)
    b = pack_sequences(chunks.repartition(17), max_tokens=64, seed=2, shards=4)
    ka = {(r["chunk_id"], r["seq_id"], r["seq_pos"]) for r in a.collect()}
    kb = {(r["chunk_id"], r["seq_id"], r["seq_pos"]) for r in b.collect()}
    assert ka == kb


def test_pack_sequences_oversized_chunk_isolated(spark):
    from raptor_rag_spark.operators.chunk import pack_sequences

    chunks = spark.createDataFrame(
        [(1, 10), (2, 500), (3, 10)], "chunk_id long, n_tokens int"
    )
    out = pack_sequences(chunks, max_tokens=100, seed=0, shards=1).collect()
    seq_of = {r["chunk_id"]: r["seq_id"] for r in out}
    # the 500-token chunk sits alone in its sequence
    assert sum(1 for r in out if r["seq_id"] == seq_of[2]) == 1


def test_pack_sequences_real_chunks(spark):
    """End-to-end on real testdata: chunk sf0.001 docs then pack."""
    from raptor_rag_spark.operators.chunk import chunk_documents, pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=60)
    n = chunks.count()
    packed = pack_sequences(chunks, max_tokens=256, seed=7, shards=8)
    rows = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    ).collect()
    assert sum(r["n"] for r in rows) == n
    assert all(r["tot"] <= 256 or r["n"] == 1 for r in rows)
    # packing actually packs: far fewer sequences than chunks
    assert len(rows) < n / 2


# --------------------------------------------------- per-stratum cap


def test_cap_per_stratum(spark):
    from raptor_rag_spark.operators.textstats import cap_per_stratum

    df = spark.createDataFrame(
        [(i, "hot" if i < 90 else f"cold{i}") for i in range(100)],
        "doc_id long, source string",
    )
    capped = cap_per_stratum(df, cap=10, stratum_col="source", seed=3)
    counts = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["hot"] == 10
    assert all(v == 1 for k, v in counts.items() if k != "hot")
    # deterministic + repartition-invariant kept set
    k1 = {r["doc_id"] for r in capped.collect()}
    k2 = {r["doc_id"] for r in cap_per_stratum(df.repartition(13), cap=10, stratum_col="source", seed=3).collect()}
    assert k1 == k2
    # stable under appends of OTHER strata
    df2 = df.union(spark.createDataFrame([(1000, "new")], "doc_id long, source string"))
    k3 = {r["doc_id"] for r in cap_per_stratum(df2, cap=10, stratum_col="source", seed=3).collect()}
    assert k1 | {1000} == k3
    # WindowGroupLimit plan (map-side top-cap)
    plan = cap_per_stratum(df, cap=10, stratum_col="source", seed=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_pack_sequences_rejects_reserved_columns(spark):
    from raptor_rag_spark.operators.chunk import pack_sequences

    df = spark.createDataFrame([(1, 5, 0)], "chunk_id long, n_tokens int, seq_id long")
    with pytest.raises(ValueError, match="reserved"):
        pack_sequences(df, max_tokens=10, shards=1)


def test_read_shuffled_export_rejects_wrong_id(spark, docs, tmp_path):
    out = str(tmp_path / "wid")
    write_shuffled_export(docs, out, seed=1, shards=2)
    with pytest.raises(ValueError, match="id_col"):
        read_shuffled_export(spark, out, id_col="nope")


# --------------------------------------- mixture sampling with epochs


def test_sample_mixture_epochs_and_determinism(spark):
    from raptor_rag_spark.operators.textstats import sample_mixture

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        "doc_id long, lang string",
    )
    out = sample_mixture(df, rates_pct={"en": 250}, default_pct=40)
    rows = [(r["doc_id"], r["lang"], r["epoch"]) for r in out.collect()]
    en_ids = {i for i in range(400) if i % 2 == 0}
    # every en doc appears at epochs 0 and 1 (the two full copies)
    for e in (0, 1):
        assert {d for d, lang, ep in rows if lang == "en" and ep == e} == en_ids
    # fractional third en copy ~50%, strictly between none and all
    extra = {d for d, lang, ep in rows if lang == "en" and ep == 2}
    assert 0 < len(extra) < len(en_ids)
    assert not any(ep > 2 for _, lang, ep in rows if lang == "en")
    # de: subset at epoch 0 only, ~40%
    de = {d for d, lang, ep in rows if lang == "de"}
    assert all(ep == 0 for _, lang, ep in rows if lang == "de")
    assert 0 < len(de) < 200
    # repartition-invariant (pure function of (id, rate))
    rows2 = {
        (r["doc_id"], r["epoch"])
        for r in sample_mixture(
            df.repartition(17), rates_pct={"en": 250}, default_pct=40
        ).collect()
    }
    assert {(d, e) for d, _, e in rows} == rows2


def test_sample_mixture_rate_zero_and_guards(spark):
    from raptor_rag_spark.operators.textstats import sample_mixture

    df = spark.createDataFrame(
        [(1, "en"), (2, "de")], "doc_id long, lang string"
    )
    out = sample_mixture(df, rates_pct={"de": 0}, default_pct=100).collect()
    assert [(r["doc_id"], r["epoch"]) for r in out] == [(1, 0)]
    with pytest.raises(ValueError, match=">= 0"):
        sample_mixture(df, rates_pct={"en": -1})
    with pytest.raises(ValueError, match="epoch"):
        sample_mixture(df.withColumn("epoch", F.lit(1)), default_pct=100)


# --------------------------------------- exact token-budget selection


def _budget_reference(rows, budget):
    """Naive global prefix: (score desc, id asc) cumsum <= budget."""
    kept, cum = set(), 0
    for doc_id, score, toks in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += toks
        if cum > budget:
            break
        kept.add(doc_id)
    return kept


def test_select_to_token_budget_matches_naive_window(spark):
    import random

    from raptor_rag_spark.operators.textstats import select_to_token_budget

    rng = random.Random(42)
    data = [
        (i, round(rng.random(), 3), rng.randrange(0, 50)) for i in range(600)
    ]
    df = spark.createDataFrame(data, "doc_id long, score double, toks long")
    total = sum(t for _, _, t in data)
    for budget, buckets in [(0, 16), (total // 3, 16), (total // 3, 2), (total * 2, 16)]:
        got = {
            r["doc_id"]
            for r in select_to_token_budget(
                df, budget, score_col="score", tokens_col="toks", num_buckets=buckets
            ).collect()
        }
        assert got == _budget_reference(data, budget), (budget, buckets)
    # repartition invariance at a boundary-heavy setting
    got13 = {
        r["doc_id"]
        for r in select_to_token_budget(
            df.repartition(13), total // 3, score_col="score", tokens_col="toks",
            num_buckets=4,
        ).collect()
    }
    assert got13 == _budget_reference(data, total // 3)


def test_select_to_token_budget_prefix_blocking_and_nulls(spark):
    """A huge row early in the order blocks EVERYTHING after it
    (prefix semantics, not knapsack); NULL score/tokens are excluded."""
    from raptor_rag_spark.operators.textstats import select_to_token_budget

    df = spark.createDataFrame(
        [
            (1, 1.0, 10),
            (2, 0.9, 10_000),   # exceeds remaining budget -> blocks 3,4
            (3, 0.8, 1),
            (4, 0.7, 1),
            (5, None, 1),       # NULL score excluded
            (6, 0.95, None),    # NULL tokens excluded
        ],
        "doc_id long, score double, toks long",
    )
    got = {
        r["doc_id"]
        for r in select_to_token_budget(
            df, 100, score_col="score", tokens_col="toks", num_buckets=4
        ).collect()
    }
    assert got == {1}
    with pytest.raises(ValueError, match="budget"):
        select_to_token_budget(df, -1, score_col="score", tokens_col="toks")
    with pytest.raises(ValueError, match="num_buckets"):
        select_to_token_budget(df, 10, score_col="score", tokens_col="toks", num_buckets=1)


def test_sample_mixture_decorrelated_from_stratified_sample(spark):
    """The mixture draw is salted ('mix|') so composing with
    stratified_hash_sample keeps the Bernoulli draws independent:
    a 40% stratified sample followed by mixture rate 150 gives the
    fractional second epoch to ~50% of survivors — the UNSALTED draw
    gave it to 100% of them (h < 40 is a subset of h < 50)."""
    from raptor_rag_spark.operators.textstats import (
        sample_mixture,
        stratified_hash_sample,
    )

    df = spark.createDataFrame(
        [(i, "en") for i in range(2000)], "doc_id long, lang string"
    )
    kept = stratified_hash_sample(df, default_pct=40)
    n_kept = kept.count()
    assert n_kept > 0
    extra = sample_mixture(kept, default_pct=150).filter("epoch = 1").count()
    assert 0 < extra < n_kept
    assert 0.35 < extra / n_kept < 0.65


def test_select_to_token_budget_rejects_negative_tokens(spark):
    """Negative token counts break the monotone-cumsum precondition;
    the base filter now excludes them so the kept set stays an exact
    (score desc, id asc) prefix of the valid rows."""
    from raptor_rag_spark.operators.textstats import select_to_token_budget

    df = spark.createDataFrame(
        [(1, 0.9, 10), (2, 0.8, -5), (3, 0.7, 10), (4, 0.6, 10)],
        "doc_id long, quality_score double, n_tokens long",
    )
    out = select_to_token_budget(df, budget=20, num_buckets=4)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
