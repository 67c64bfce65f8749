"""MinHashSignatureStore — incremental fuzzy dedup: batch-op pair
equivalence, first-copy-kept ingest, within-batch greedy drop, append
idempotency + replay self-heal, compaction identity, bucketed
(exchange-free) store side, session re-registration."""

import os
import random

import pytest
from pyspark.sql import functions as F

N_HASHES, BANDS, SHINGLE_N, THRESH = 64, 16, 3, 0.5


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _doc(rng, n):
    vocab = ["red", "blue", "green", "ink", "dot", "fig", "oak", "sky"]
    return " ".join(rng.choice(vocab) for _ in range(n))


def _corpus_rows(seed=21, n=20, start_id=0, plant=None):
    rng = random.Random(seed)
    rows = [(start_id + i, _doc(rng, rng.randint(12, 40))) for i in range(n)]
    for i, text in plant or []:
        rows.append((start_id + i, text))
    return rows


def _pairs(df):
    # match_batch returns the UNROUNDED estimate (so est >= threshold
    # holds on the returned frame); the batch family rounds to 6dp for
    # oracle hash stability — compare at the rounded precision
    return {
        (r["batch_id"], r["store_id"]): round(r["est_jaccard"], 6)
        for r in df.collect()
    }


@pytest.fixture()
def store_and_corpus(spark, tmp_path):
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    corpus = _df(spark, _corpus_rows())
    store = MinHashSignatureStore.build(
        spark, corpus, str(tmp_path / "mhstore"),
        n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N, n_buckets=4,
    )
    yield store, corpus
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_match_equals_batch_pairs(spark, store_and_corpus):
    """match_batch == the batch family's est-only pairs over
    corpus ∪ batch, restricted to cross (corpus, batch) pairs — the
    store is the incremental form of the same LSH estimate."""
    from raptor_rag_spark.operators.dedup import minhash_dedup_pairs

    store, corpus = store_and_corpus
    # plant near-dups of two corpus docs into the batch
    planted = [
        (r["doc_id"] + 100, r["text"] + " tail")
        for r in corpus.orderBy("doc_id").limit(2).collect()
    ]
    batch = _df(spark, _corpus_rows(seed=22, n=8, start_id=150) + planted)
    got = _pairs(store.match_batch(batch, threshold=THRESH))
    assert len(got) >= 2  # the plants match their originals

    want_all = minhash_dedup_pairs(
        corpus.unionByName(batch), n_hashes=N_HASHES, bands=BANDS,
        shingle_n=SHINGLE_N, threshold=THRESH, verify=False,
    ).collect()
    batch_ids = {r[0] for r in batch.collect()}
    want = {}
    for r in want_all:
        a, b = r["id_a"], r["id_b"]
        if (a in batch_ids) != (b in batch_ids):  # cross pairs only
            bid, sid = (a, b) if a in batch_ids else (b, a)
            want[(bid, sid)] = r["est_jaccard"]
    assert got == want


def test_ingest_first_copy_kept_and_within_batch(spark, tmp_path):
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    rng = random.Random(30)
    base = _doc(rng, 30)
    seed = _df(spark, [(0, _doc(rng, 25))])
    store = MinHashSignatureStore.build(
        spark, seed, str(tmp_path / "mh2"),
        n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N, n_buckets=2,
    )
    # first batch introduces `base` -> kept (nothing in store matches)
    b1 = _df(spark, [(1, base + " one")])
    kept1 = {r["doc_id"] for r in store.ingest(b1).collect()}
    assert kept1 == {1}
    # second batch: a near-copy of base (drops vs store) and an
    # internal near-dup pair (greedy keep-min-id drops the larger)
    other = _doc(random.Random(31), 28)
    b2 = _df(
        spark,
        [(2, base + " two"), (3, other + " x"), (4, other + " y"), (5, _doc(random.Random(32), 20))],
    )
    kept2 = {r["doc_id"] for r in store.ingest(b2, within_batch=True).collect()}
    assert kept2 == {3, 5}
    # third batch: a near-copy of the DROPPED doc 4's content still
    # drops (scrubbed docs' signatures stay in the store on purpose)
    b3 = _df(spark, [(6, other + " z")])
    kept3 = {r["doc_id"] for r in store.ingest(b3).collect()}
    assert kept3 == set()
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ingest_retry_returns_same_survivors(spark, tmp_path):
    """A clean ingest retry (append already applied) must return the
    SAME survivors — the exclusion aid is recomputed from content, not
    taken from append's already_applied return, so the batch's own
    earlier-appended rows never self-match."""
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    seed = _df(spark, _corpus_rows(seed=40, n=6))
    store = MinHashSignatureStore.build(
        spark, seed, str(tmp_path / "mh3"),
        n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N, n_buckets=2,
    )
    batch = _df(
        spark,
        _corpus_rows(seed=41, n=4, start_id=50)
        + [(60, seed.orderBy("doc_id").first()["text"] + " t")],  # drops
    )
    first = {r["doc_id"] for r in store.ingest(batch, threshold=THRESH).collect()}
    assert 60 not in first and first
    retry = {r["doc_id"] for r in store.ingest(batch, threshold=THRESH).collect()}
    assert retry == first
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_append_idempotency_and_replay_self_heal(spark, store_and_corpus):
    store, corpus = store_and_corpus
    batch = _df(spark, _corpus_rows(seed=23, n=6, start_id=200))
    probe = _df(
        spark,
        _corpus_rows(seed=24, n=4, start_id=300)
        + [(330, batch.orderBy("doc_id").first()["text"] + " t")],
    )
    aid = store.append(batch)
    baseline = _pairs(store.match_batch(probe, threshold=THRESH))
    assert any(sid >= 200 for _, sid in baseline)  # probe hits the batch
    assert store.append(batch) == "already_applied"
    assert _pairs(store.match_batch(probe, threshold=THRESH)) == baseline

    # lost-meta replay: rows land twice; the (key, _aid) collapse heals
    store.meta["applied_appends"].remove(aid)
    assert store.append(batch) == aid
    assert _pairs(store.match_batch(probe, threshold=THRESH)) == baseline


def test_compact_identity_and_ledger(spark, store_and_corpus):
    store, corpus = store_and_corpus
    b1 = _df(spark, _corpus_rows(seed=25, n=5, start_id=400))
    a1 = store.append(b1)
    store.append(_df(spark, _corpus_rows(seed=26, n=5, start_id=500)))
    probe = _df(
        spark,
        _corpus_rows(seed=27, n=4, start_id=600)
        + [(630, b1.orderBy("doc_id").first()["text"] + " q")],
    )
    before = _pairs(store.match_batch(probe, threshold=THRESH))
    stats = store.compact()
    for t in stats.values():
        assert t["rows_after"] <= t["rows_before"]
    assert _pairs(store.match_batch(probe, threshold=THRESH)) == before
    assert store.append(b1) == "already_applied"
    assert a1 in store.meta["applied_appends"]


def test_store_side_plans_zero_exchanges(spark, store_and_corpus):
    from raptor_rag_spark.sources.bucketed import n_exchanges

    store, corpus = store_and_corpus
    assert n_exchanges(store._bands()) == 0
    assert n_exchanges(store._sigs()) == 0
    batch = _df(spark, _corpus_rows(seed=28, n=4, start_id=700))
    plan = (
        store.scrub_batch(batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Bucketed: true" in plan


def test_string_id_store_survives_reregistration(spark, tmp_path):
    """A store over non-bigint ids must reload in a fresh session: the
    DDL re-registration takes the id type from meta, not a hard-coded
    BIGINT (which made every fresh-session read fail schema
    conversion for string/int ids)."""
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    docs = spark.createDataFrame(
        [(f"u{i}", t) for i, (_, t) in enumerate(_corpus_rows(seed=45, n=8))],
        "url string, text string",
    )
    store = MinHashSignatureStore.build(
        spark, docs, str(tmp_path / "mhs"),
        id_col="url", n_hashes=N_HASHES, bands=BANDS, n_buckets=2,
    )
    probe = spark.createDataFrame(
        [("p0", docs.orderBy("url").first()["text"] + " t")], "url string, text string"
    )
    want = _pairs(store.match_batch(probe, threshold=THRESH))
    assert want
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE {t}")  # fresh-session simulation
    re = MinHashSignatureStore.load(spark, store.path)
    assert re.meta["id_type"] == "string"
    assert _pairs(re.match_batch(probe, threshold=THRESH)) == want
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_reregister_after_catalog_loss(spark, store_and_corpus):
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore
    from raptor_rag_spark.sources.bucketed import n_exchanges

    store, corpus = store_and_corpus
    probe = _df(
        spark,
        [(800, corpus.orderBy("doc_id").first()["text"] + " r")],
    )
    want = _pairs(store.match_batch(probe, threshold=THRESH))
    assert want  # the probe matches its corpus original
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE {t}")  # simulate a fresh session
    re = MinHashSignatureStore.load(spark, store.path)
    assert _pairs(re.match_batch(probe, threshold=THRESH)) == want
    assert n_exchanges(re._bands()) == 0  # DDL kept the bucket layout


def test_store_path_with_quote_rejected(spark, tmp_path):
    """The path lands in CREATE TABLE ... LOCATION '<path>' DDL; a
    quoted path must fail fast at build/load, not at first read."""
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    bad = str(tmp_path / "o'store")
    docs = _df(spark, _corpus_rows(n=2))
    with pytest.raises(ValueError, match="quotes"):
        MinHashSignatureStore.build(spark, docs, bad, n_buckets=2)
    with pytest.raises(ValueError, match="quotes"):
        MinHashSignatureStore.load(spark, bad)
    # backslash: a LEGAL dirname, but Spark's SQL parser reads it as an
    # escape sequence inside the LOCATION literal (default
    # escapedStringLiterals=false turns '\n' into a real newline),
    # silently registering the table at a different location
    slashed = str(tmp_path / "a\\nb" / "mh")
    with pytest.raises(ValueError, match="backslash"):
        MinHashSignatureStore.build(spark, docs, slashed, n_buckets=2)


def test_match_batch_thresholds_unrounded_estimate(spark, tmp_path):
    """Boundary pairs: match_batch must threshold the UNROUNDED max
    estimate, matching est_pairs_from_sigs' order of operations. With
    n_hashes=48 any match count k with k % 3 == 2 has
    est = k/48 = 0.x666... whose 6-decimal rounding is ABOVE the exact
    value — a threshold in (exact, round6] must exclude the pair
    (rounding first would admit it)."""
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    n_hashes = 48
    corpus = _df(spark, _corpus_rows(seed=7, n=12))
    store = MinHashSignatureStore.build(
        spark, corpus, str(tmp_path / "mh48"),
        n_hashes=n_hashes, bands=BANDS, shingle_n=SHINGLE_N, n_buckets=2,
    )
    # batch of perturbed corpus docs -> a spread of partial est values
    batch = _df(
        spark,
        [
            (900 + r["doc_id"], r["text"] + " extra tail words here")
            for r in corpus.collect()
        ],
    )
    got = _pairs(store.match_batch(batch, threshold=0.05))
    boundary = None
    for (bid, sid), est in got.items():
        k = round(est * n_hashes)  # recover the exact match count
        if k % 3 == 2:  # k/48 repeats ...666, round6 rounds UP
            boundary = (bid, sid, k)
            break
    assert boundary is not None, f"no repeating-decimal pair in {got}"
    bid, sid, k = boundary
    t_above = round(k / n_hashes, 6)  # > exact k/48
    sel = _pairs(store.match_batch(batch, threshold=t_above))
    assert (bid, sid) not in sel  # unrounded max < threshold
    # control: thresholding AT the exact double keeps the pair
    at = store.match_batch(batch, threshold=k / n_hashes)
    sel_at = _pairs(at)
    assert (bid, sid) in sel_at
    # the RETURNED value is unrounded, so est >= threshold holds
    # row-for-row on the output (re-filtering downstream is a no-op)
    assert all(r["est_jaccard"] >= k / n_hashes for r in at.collect())
    for t in store.meta["tables"].values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
