"""Dedup + text-analysis operators: planted-duplicate recall and
python-oracle checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    _shingle_set,
)
from raptor_rag_spark.operators.multimodal import decode_features, fake_decode, synthetic_media
from raptor_rag_spark.operators.textstats import STOPWORDS, lang_id, quality_metrics

BASE_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "a completely different document about spark query planning and shuffles"),
    (2, "yet another text concerning window functions and aggregate pushdown rules"),
    (3, "der hund läuft schnell und die katze ist nicht da mit auf zu"),
    (4, "el perro corre y la casa es un lugar que se ve en no"),
]
# planted near-duplicates of doc 0 and exact dup of doc 1
DUPS = [
    (100, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (101, "a completely different document about spark query planning and shuffles"),
    (102, "A  Completely   different document about Spark query planning and shuffles"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(BASE_DOCS + DUPS, "doc_id long, text string").cache()


def test_exact_dedup_normalized(docs):
    kept = exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # 101 and 102 normalize to doc 1's text -> only 1 survives
    assert 1 in ids and 101 not in ids and 102 not in ids
    assert len(ids) == len(BASE_DOCS) + 1  # 100 is not an exact dup


def test_ngram_jaccard_finds_planted_pair(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert (0, 100) in pairs
    assert (1, 101) in pairs and (1, 102) in pairs
    assert all(a < b for a, b in pairs)


def test_minhash_estimates_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(docs, n_hashes=64, bands=16, threshold=0.3).collect()
    }
    assert (0, 100) in pairs
    assert (1, 101) in pairs and pairs[(1, 101)] == 1.0
    # estimate within tolerance of true jaccard for the planted pair
    true_j = len(set(_shingle_set(BASE_DOCS[0][1], 3)) & set(_shingle_set(DUPS[0][1], 3))) / len(
        set(_shingle_set(BASE_DOCS[0][1], 3)) | set(_shingle_set(DUPS[0][1], 3))
    )
    assert abs(pairs[(0, 100)] - true_j) < 0.25


def test_ngram_short_docs_ansi_safe(spark):
    """Docs with fewer than n words must not crash under ANSI mode
    (element_at past the array end) — they fall back to the whole text
    as one shingle."""
    df = spark.createDataFrame(
        [(0, "one"), (1, "two words"), (2, "one"), (3, ""), (4, "the quick brown fox runs")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, n=3, threshold=0.9).collect()}
    assert (0, 2) in pairs  # identical single-word docs match exactly


def test_ngram_max_df_caps_hot_shingle(spark):
    """A stopword-run shingle shared by every doc must not explode the
    candidate self-join when the df cap is active."""
    hot = "click here now"  # appears in all docs
    rows = [(i, f"{hot} unique tail {i} alpha beta{i} gamma{i} delta{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_df=None).count()
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_df=10).count()
    assert uncapped == 40 * 39 // 2  # the hot shingle makes it quadratic
    assert capped == 0  # cap removes the only shared shingle


def test_minhash_exact_verify(docs):
    out = minhash_dedup_pairs(docs, n_hashes=64, bands=16, threshold=0.5, verify=True)
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (1, 101) in rows and rows[(1, 101)]["jaccard"] == 1.0
    # verified jaccard is the TRUE set jaccard, not the estimate
    true_j = len(set(_shingle_set(BASE_DOCS[0][1], 3)) & set(_shingle_set(DUPS[0][1], 3))) / len(
        set(_shingle_set(BASE_DOCS[0][1], 3)) | set(_shingle_set(DUPS[0][1], 3))
    )
    if (0, 100) in rows:
        assert abs(rows[(0, 100)]["jaccard"] - round(true_j, 6)) < 1e-9


def test_chunk_id_schemes(spark):
    from raptor_rag_spark.operators.chunk import chunk_documents

    docs = spark.createDataFrame(
        [(1, "alpha beta. gamma delta. epsilon zeta."), (1 << 50, "one two. three four.")],
        "doc_id long, text string",
    )
    # hashed scheme: works for ANY doc_id, ids are distinct
    hashed = chunk_documents(docs, max_tokens=4, id_scheme="hash").collect()
    ids = [r["chunk_id"] for r in hashed]
    assert len(ids) == len(set(ids)) and len(ids) >= 3
    # arith scheme: validated bound — raises on out-of-range doc ids
    # instead of silently wrapping (ANSI: would crash anyway)
    import pytest as _pytest

    with _pytest.raises(Exception, match="2\\^43|USER_RAISED|arith"):
        chunk_documents(docs, max_tokens=4, id_scheme="arith").collect()
    small = docs.filter(F.col("doc_id") == 1)
    ok = chunk_documents(small, max_tokens=4, id_scheme="arith").collect()
    assert [r["chunk_id"] for r in ok] == [(1 << 20) + r["chunk_idx"] for r in ok]


def test_simhash_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert (1, 101) in pairs and pairs[(1, 101)] == 0
    assert (0, 100) in pairs and pairs[(0, 100)] <= 10


def test_embedding_neardup_planted(spark):
    rng = np.random.RandomState(5)
    base = rng.randn(20, 16)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    near = base[0] + rng.randn(16) * 0.01
    near /= np.linalg.norm(near)
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(base)] + [
        (99, [float(v) for v in near])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in embedding_neardup_pairs(df, min_cosine=0.98).collect()}
    assert (0, 99) in pairs and pairs[(0, 99)] > 0.99
    # no spurious pairs among independent random vectors
    assert all(a == 0 and b == 99 for a, b in pairs)


def test_lang_id_heuristic(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred")).collect()}
    assert got[0] == "en" and got[3] == "de" and got[4] == "es"


def test_quality_metrics_oracle(spark):
    df = spark.createDataFrame(
        [(0, "Good sentence with enough words to pass the filters."), (1, "123 456 789"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_metrics(df).collect()}
    assert rows[0]["quality_score"] == 1.0
    assert rows[1]["digit_ratio"] > 0.5 and rows[1]["quality_score"] < 1.0
    assert rows[2]["n_words"] == 0 and rows[2]["quality_score"] >= 0.0


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=24)
    feats = decode_features(media, decode_fn=fake_decode).collect()
    assert len(feats) == 24
    for r in feats:
        assert len(r["feature"]) == 16
        norm = sum(v * v for v in r["feature"])
        assert abs(norm - 1.0) < 1e-5
    # stub path: without a decode_fn the kernel must raise clearly
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_features(media).collect()


def test_frame_sample_plan(spark):
    from raptor_rag_spark.operators.multimodal import frame_sample_plan

    media = synthetic_media(spark, n=24)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert rows and all(r["n"] >= 1 for r in rows)


def test_minhash_jvm_signatures_estimate_jaccard(docs):
    """JVM (md5-base) minhash: identical docs share the whole
    signature; the planted near-dup pair's signature agreement
    estimates the true shingle Jaccard within tolerance."""
    from raptor_rag_spark.operators.dedup import minhash_signatures_jvm

    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures_jvm(docs).collect()}
    assert sigs[1] == sigs[101]  # exact dup -> identical signature
    est = sum(x == y for x, y in zip(sigs[0], sigs[100])) / 64.0
    true_j = len(set(_shingle_set(BASE_DOCS[0][1], 3)) & set(_shingle_set(DUPS[0][1], 3))) / len(
        set(_shingle_set(BASE_DOCS[0][1], 3)) | set(_shingle_set(DUPS[0][1], 3))
    )
    assert abs(est - true_j) < 0.25


def test_word_shingles_udf_matches_jvm_expression(spark):
    """The Arrow shingle kernel must emit byte-identical arrays to the
    Catalyst word_shingles expression (the oracle-documented semantics)
    — including whitespace-only, short-doc and None edge cases."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.dedup import make_word_shingles_udf, word_shingles

    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "one two"),
        (2, ""),
        (3, "   \t\n  "),
        (4, "Tabs\tand\nnewlines\x0bform FEED\f here"),
        (5, "tek kelime"),
        (6, None),
        (7, "a  b   c    d"),
        (8, "Ünïcödé İstanbul ŞĞıi words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3):
        got = df.select(
            "doc_id", make_word_shingles_udf(n)(F.col("text")).alias("s")
        ).collect()
        want = df.select("doc_id", word_shingles(F.col("text"), n).alias("s")).collect()
        gm = {r["doc_id"]: r["s"] for r in got}
        wm = {r["doc_id"]: r["s"] for r in want}
        assert gm == wm, (n, gm, wm)


def test_quality_null_text_scores_zero(spark):
    """A NULL-text document must not outscore an empty one (the penalty
    CASEs evaluate NULL -> no penalty, which left NULL text at 0.8 —
    above a typical keep threshold). Pinned: NULL -> 0.0."""
    from raptor_rag_spark.operators.textstats import quality_metrics

    docs = spark.createDataFrame(
        [(1, "hello world this is fine."), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["quality_score"] for r in quality_metrics(docs).collect()}
    assert got[2] == 0.0
    assert got[2] <= got[3] < got[1]


def test_resize_images_plumbing(spark):
    """Resize op (brief: decode/feature-extract/resize/frame-sample):
    deterministic stubbed kernel, real schema/streamed-batch plumbing,
    map-only plan (the binary column never shuffles), clear stub error
    without an injected codec."""
    from raptor_rag_spark.operators.multimodal import fake_resize, resize_images

    media = synthetic_media(spark, n=24)
    out = resize_images(media, 64, 64, resize_fn=fake_resize)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only straight off the scan
    rows = out.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images > 0
    for r in rows:
        assert r["target_w"] == 64 and r["target_h"] == 64
        assert 0 < len(r["bytes"])  # shrunk payload, never empty for real input
        assert r["scale_x"] == 64 / r["width"] and r["scale_y"] == 64 / r["height"]
    again = {r["media_id"]: bytes(r["bytes"]) for r in out.collect()}
    assert {r["media_id"]: bytes(r["bytes"]) for r in rows} == again  # deterministic
    with pytest.raises(Exception, match="NotImplementedError|resize_fn"):
        resize_images(media, 64, 64).collect()


# ------------------------------------------------- decontamination


def test_decontaminate_planted_overlap(spark):
    from raptor_rag_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark item verbatim -> full overlap
            (1, "intro words alpha beta gamma delta epsilon zeta eta theta trailing text"),
            # shares a partial run of the benchmark n-grams
            (2, "alpha beta gamma delta epsilon nothing else here at all"),
            # unrelated
            (3, "spark shuffles partitions and broadcast joins for scale"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=3, threshold=0.5).collect()
    }
    assert 1 in out and out[1]["overlap_frac"] == 1.0
    assert out[1]["bench_id"] == 900
    # bench has 6 3-grams; doc 2 covers 3 of them (0.5 -> kept at >=0.5)
    assert 2 in out and out[2]["n_common"] == 3 and out[2]["sz_bench"] == 6
    assert 3 not in out


def test_decontaminate_null_and_threshold(spark):
    from raptor_rag_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(1, "one two three four five six")], "bench_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, None), (11, "one two three zzz")],
        "doc_id long, text string",
    )
    # NULL text drops out (NULL shingle array -> explode drops the doc);
    # doc 11 covers 1 of 4 3-grams = 0.25 < 0.6
    assert decontaminate(docs, bench, n=3, threshold=0.6).count() == 0


def test_decontaminate_broadcasts_benchmark(spark):
    from raptor_rag_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(1, "one two three four five six")], "bench_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "one two three four zzz")], "doc_id long, text string"
    )
    plan = decontaminate(docs, bench, n=3, threshold=0.1)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------- keep_latest


def test_keep_latest_recrawl(spark):
    from raptor_rag_spark.operators.dedup import keep_latest

    rows = [
        ("u1", "2024-01-01 00:00:00", 1, "old"),
        ("u1", "2024-03-01 00:00:00", 2, "new"),
        ("u2", "2024-02-01 00:00:00", 3, "only"),
        # equal timestamps -> tie-break keeps the SMALLEST id
        ("u3", "2024-02-01 00:00:00", 5, "tie-b"),
        ("u3", "2024-02-01 00:00:00", 4, "tie-a"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string, fetch_id long, body string")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    kept = {r["url"]: r for r in keep_latest(df, ["url"], "ts", tie_cols=["fetch_id"]).collect()}
    assert kept["u1"]["fetch_id"] == 2 and kept["u1"]["body"] == "new"
    assert kept["u2"]["fetch_id"] == 3
    assert kept["u3"]["fetch_id"] == 4
    # top-1 window limit is pushed map-side (no full-history shuffle)
    plan = keep_latest(df, ["url"], "ts", tie_cols=["fetch_id"])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# --------------------------------------------------- repetition


def _rep_reference(t):
    """Independent reference (plain Python, no shared code paths)."""
    import re
    from collections import Counter

    if t is None:
        return None
    lines = [l for l in t.split("\n") if l != ""]
    paras = [p for p in t.split("\n\n") if p != ""]
    words = [w for w in re.split(r"[ \t\n\r\f\x0B]+", t.lower()) if w != ""]
    bgs = [words[i] + " " + words[i + 1] for i in range(len(words) - 1)]
    return {
        "n_lines": len(lines),
        "dup_line_frac": round(1 - len(set(lines)) / len(lines), 6) if lines else 0.0,
        "n_paras": len(paras),
        "dup_para_frac": round(1 - len(set(paras)) / len(paras), 6) if paras else 0.0,
        "top_word_frac": round(Counter(words).most_common(1)[0][1] / len(words), 6) if words else 0.0,
        "top_bigram_frac": round(Counter(bgs).most_common(1)[0][1] / len(bgs), 6) if bgs else 0.0,
    }


def test_repetition_metrics_reference_parity(spark):
    from raptor_rag_spark.operators.textstats import repetition_metrics

    texts = [
        (0, "same line\nsame line\nother line\n\nsame line\nsame line"),
        (1, "para one\n\npara one\n\npara two"),
        (2, "the the the the unique"),
        (3, "a b a b a b a b"),  # bigram 'a b' dominates
        (4, ""),  # empty -> zeros
        (5, "   \t  "),  # whitespace-only: no words, one 'line'
        (6, None),  # NULL -> NULL metrics
        (7, "Mixed CASE words mixed case WORDS"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    for doc_id, t in texts:
        ref = _rep_reference(t)
        if ref is None:
            assert all(got[doc_id][k] is None for k in
                       ("n_lines", "dup_line_frac", "n_paras", "dup_para_frac",
                        "top_word_frac", "top_bigram_frac")), got[doc_id]
            continue
        for k, v in ref.items():
            gv = got[doc_id][k]
            assert gv == pytest.approx(v, abs=1e-9), (doc_id, k, gv, v)


def test_repetition_metrics_map_only_plan(spark):
    from raptor_rag_spark.operators.textstats import repetition_metrics

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    q = repetition_metrics(df)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one Arrow pass, no shuffle
    assert "ArrowEvalPython" in plan


def test_decontaminate_single_shuffle_plan(spark):
    """Review regression: the corpus side must flow into the broadcast
    probe with NO shuffle — the only Exchange is the (doc,bench)
    partial-agg count."""
    from raptor_rag_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(1, "one two three four five six")], "bench_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "one two three four zzz")], "doc_id long, text string"
    )
    plan = decontaminate(docs, bench, n=3, threshold=0.1)._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan


def test_keep_latest_preserves_caller_rn_column(spark):
    """Review regression: a pre-existing '_rn' column must survive."""
    from raptor_rag_spark.operators.dedup import keep_latest

    df = spark.createDataFrame(
        [("u", 1, "2024-01-01 00:00:00", 7), ("u", 2, "2024-06-01 00:00:00", 9)],
        "url string, fetch_id long, ts string, _rn long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = keep_latest(df, ["url"], "ts", tie_cols=["fetch_id"]).collect()
    assert len(out) == 1 and out[0]["_rn"] == 9


def test_decontaminate_no_broadcast_parity(spark):
    """The scale path when the benchmark is NOT broadcastable (huge
    eval-set unions): plain hash join, identical results."""
    from raptor_rag_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta"),
         (901, "one two three four five six seven")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "x alpha beta gamma delta epsilon zeta eta theta y"),
         (2, "one two three four nothing else"),
         (3, "unrelated words entirely")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, decontaminate(docs, bench, n=3, threshold=0.4).collect()))
    b = sorted(map(tuple, decontaminate(docs, bench, n=3, threshold=0.4,
                                        broadcast_benchmark=False).collect()))
    assert a == b and len(a) >= 2


# ------------------------------------------ mergeable HLL sketches


def test_distinct_sketches_merge_equals_single_pass(spark):
    """Union-of-daily-sketches == sketch-of-union (register-wise max):
    estimates are IDENTICAL, not merely close — the property that makes
    incremental crawl accounting exact w.r.t. the sketch state."""
    from raptor_rag_spark.operators.textstats import (
        distinct_sketches,
        estimate_distinct,
        merge_sketches,
    )

    df = spark.range(0, 20000).select(
        (F.col("id") % 5).alias("day"),
        (F.col("id") % 2).alias("lang"),
        F.concat(F.lit("u"), (F.col("id") % 6000)).alias("url"),
    )
    daily = distinct_sketches(df, "url", key_cols=["day", "lang"])
    merged = estimate_distinct(merge_sketches(daily, key_cols=["lang"]))
    single = estimate_distinct(distinct_sketches(df, "url", key_cols=["lang"]))
    got = {r["lang"]: (r["distinct_est"], r["n_rows"]) for r in merged.collect()}
    want = {r["lang"]: (r["distinct_est"], r["n_rows"]) for r in single.collect()}
    assert got == want
    # estimate within ~3% of exact (3000 distinct urls per lang)
    exact = {
        r["lang"]: r["d"]
        for r in df.groupBy("lang").agg(F.countDistinct("url").alias("d")).collect()
    }
    for lang, (est, n) in got.items():
        assert abs(est - exact[lang]) / exact[lang] < 0.03
        assert n == 10000


def test_distinct_sketches_global_and_persist_roundtrip(spark, tmp_path):
    from raptor_rag_spark.operators.textstats import (
        distinct_sketches,
        estimate_distinct,
        merge_sketches,
    )

    df = spark.range(0, 5000).select(F.concat(F.lit("u"), (F.col("id") % 777)).alias("url"))
    sk = distinct_sketches(df, "url")  # no keys -> one global row
    p = str(tmp_path / "sk")
    sk.write.parquet(p)  # sketches are plain binary columns
    back = spark.read.parquet(p)
    est = estimate_distinct(merge_sketches(back)).collect()[0]
    assert abs(est["distinct_est"] - 777) / 777 < 0.03
    assert est["n_rows"] == 5000
