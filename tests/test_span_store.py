"""SpanFingerprintStore — incremental ExactSubstr dedup: batch-op
equivalence, first-copy-kept ingest, append idempotency + replay
self-heal, compaction identity, bucketed (exchange-free) store side,
session re-registration, crashed-compaction heal."""

import os
import random

import pytest
from pyspark.sql import functions as F

K = 4


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_rows(seed=11, n=20, start_id=0):
    rng = random.Random(seed)
    vocab = ["red", "blue", "green", "ink", "dot", "fig"]
    return [
        (start_id + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(n)
    ]


def _md5_map(df):
    return {r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text_md5"]) for r in df.collect()}


@pytest.fixture()
def store_and_corpus(spark, tmp_path):
    from raptor_rag_spark.operators.span_store import SpanFingerprintStore

    corpus = _df(spark, _corpus_rows())
    store = SpanFingerprintStore.build(
        spark, corpus, str(tmp_path / "spanstore"), k=K, n_buckets=4
    )
    yield store, corpus
    spark.sql(f"DROP TABLE IF EXISTS {store.table}")


def test_scrub_equals_batch_op(spark, store_and_corpus):
    """scrub_batch(batch) == remove_duplicate_spans(corpus ∪ batch)
    restricted to batch docs — the store is exact, not approximate."""
    from raptor_rag_spark.operators.dedup import remove_duplicate_spans

    store, corpus = store_and_corpus
    batch = _df(spark, _corpus_rows(seed=12, n=10, start_id=100))
    got = _md5_map(store.scrub_batch(batch))
    full = remove_duplicate_spans(corpus.unionByName(batch), k=K)
    want = {i: v for i, v in _md5_map(full).items() if i >= 100}
    assert got == want


def test_ingest_first_copy_kept(spark, tmp_path):
    from raptor_rag_spark.operators.span_store import SpanFingerprintStore

    span = "alpha beta gamma delta epsilon"
    seed = _df(spark, [(0, "u0 u1 u2 u3 u4")])
    store = SpanFingerprintStore.build(
        spark, seed, str(tmp_path / "s2"), k=K, n_buckets=2
    )
    b1 = _df(spark, [(1, "w0 w1 " + span + " w2")])
    out1 = _md5_map(store.ingest(b1, return_text=False))
    assert out1[1][1] == out1[1][0]  # first copy: nothing scrubbed

    # second batch carries the same span -> scrubbed there, plus a
    # batch-internal dup pair -> both copies drop (count_batch summed
    # into the store by the append-first ingest)
    b2 = _df(
        spark,
        [
            (2, "x0 x1 " + span + " x2"),
            (3, "p q r s y0 y1"),
            (4, "p q r s z0 z1"),
        ],
    )
    out2 = {
        r["doc_id"]: r["text"]
        for r in store.ingest(b2, return_text=True).collect()
    }
    assert out2[2] == "x0 x1 x2"
    assert out2[3] == "y0 y1"
    assert out2[4] == "z0 z1"
    # first batch's copy remains kept (never revisited): store docs are
    # immutable after ingest — re-scrubbing b1 now WOULD drop it, which
    # is exactly the documented first-copy-kept distinction
    re1 = _md5_map(store.scrub_batch(b1, count_batch=False))
    assert re1[1][1] < re1[1][0]
    spark.sql(f"DROP TABLE IF EXISTS {store.table}")


def test_append_idempotency_and_replay_self_heal(spark, store_and_corpus):
    store, corpus = store_and_corpus
    batch = _df(spark, _corpus_rows(seed=13, n=6, start_id=200))
    probe = _df(spark, _corpus_rows(seed=14, n=6, start_id=300))

    aid = store.append(batch)
    baseline = _md5_map(store.scrub_batch(probe))
    assert store.append(batch) == "already_applied"
    assert _md5_map(store.scrub_batch(probe)) == baseline

    # lost-meta replay: drop the ledger entry (simulating a crash after
    # the data commit, before the meta commit) and re-append — the rows
    # land twice, the (fp, aid) partial-collapse read heals the counts
    store.meta["applied_appends"].remove(aid)
    assert store.append(batch) == aid
    assert _md5_map(store.scrub_batch(probe)) == baseline


def test_compact_identity_and_ledger(spark, store_and_corpus):
    store, corpus = store_and_corpus
    b1 = _df(spark, _corpus_rows(seed=15, n=5, start_id=400))
    b2 = _df(spark, _corpus_rows(seed=16, n=5, start_id=500))
    a1 = store.append(b1)
    store.append(b2)
    probe = _df(spark, _corpus_rows(seed=17, n=8, start_id=600))
    before = _md5_map(store.scrub_batch(probe))

    stats = store.compact()
    assert stats["rows_after"] <= stats["rows_before"]
    assert _md5_map(store.scrub_batch(probe)) == before
    # a retry of an append merged into the compacted rows still no-ops
    assert store.append(b1) == "already_applied"
    assert a1 in store.meta["applied_appends"]


def test_store_side_plans_zero_exchanges(spark, store_and_corpus):
    from raptor_rag_spark.sources.bucketed import n_exchanges

    store, corpus = store_and_corpus
    # the pure store-side pipeline: partial-collapse + total per fp
    totals = store._counts().groupBy("_fp").agg(F.sum("cnt").alias("t"))
    assert n_exchanges(totals) == 0
    # and the scrub plan actually scans the bucketed layout
    batch = _df(spark, _corpus_rows(seed=18, n=4, start_id=700))
    plan = (
        store.scrub_batch(batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Bucketed: true" in plan


def test_reregister_after_catalog_loss(spark, store_and_corpus, tmp_path):
    """In-memory catalog: a new session has no table metadata — load()
    re-issues the CLUSTERED BY DDL over the existing files."""
    from raptor_rag_spark.operators.span_store import SpanFingerprintStore

    store, corpus = store_and_corpus
    probe = _df(spark, _corpus_rows(seed=19, n=5, start_id=800))
    want = _md5_map(store.scrub_batch(probe))
    spark.sql(f"DROP TABLE {store.table}")  # simulate a fresh session
    re = SpanFingerprintStore.load(spark, store.path)
    assert _md5_map(re.scrub_batch(probe)) == want
    from raptor_rag_spark.sources.bucketed import n_exchanges

    totals = re._counts().groupBy("_fp").agg(F.sum("cnt").alias("t"))
    assert n_exchanges(totals) == 0  # DDL re-registration kept buckets


def test_crashed_compaction_heals_on_entry(spark, store_and_corpus):
    store, corpus = store_and_corpus
    probe = _df(spark, _corpus_rows(seed=20, n=5, start_id=900))
    want = _md5_map(store.scrub_batch(probe))
    # fabricate a crash-before-swap leftover
    leftover = store._counts_dir + ".compacting"
    os.makedirs(leftover, exist_ok=True)
    with open(os.path.join(leftover, "junk.parquet"), "w") as fh:
        fh.write("not parquet")
    assert _md5_map(store.scrub_batch(probe)) == want
    assert not os.path.exists(leftover)


def test_span_store_path_with_quote_rejected(spark, tmp_path):
    """Same DDL-interpolation hazard as the minhash store: the path
    lands in CREATE TABLE ... LOCATION '<path>'; a quoted path must
    fail fast at build/load, not at first read."""
    from raptor_rag_spark.operators.span_store import SpanFingerprintStore

    bad = str(tmp_path / "o'store")
    docs = _df(spark, _corpus_rows(n=2))
    with pytest.raises(ValueError, match="quotes"):
        SpanFingerprintStore.build(spark, docs, bad, k=K, n_buckets=2)
    with pytest.raises(ValueError, match="quotes"):
        SpanFingerprintStore.load(spark, bad)
