"""PII scrub, unigram-LM scoring, paragraph dedup — the webtext
pipeline operators added in round 4 (eighth session)."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def _pii_df(spark):
    rows = [
        (0, "reach me at alice.smith+spam@mail-host.co.uk or bob@x.io today"),
        (1, "server 10.0.255.3 talked to 192.168.1.1; port not an ip 1.2"),
        (2, "call 555-867-5309 then 023-456-7890"),
        (3, "clean text, no contact info at all"),
        (4, "mixed: eve@corp.com from 172.16.0.9 dial 555-000-1111"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_pii_counts_and_redaction(spark):
    from raptor_rag_spark.operators.pii import scrub_pii

    out = {r["doc_id"]: r for r in scrub_pii(_pii_df(spark)).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert out[0]["text"] == "reach me at <EMAIL> or <EMAIL> today"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 2, 0)
    assert out[1]["text"] == "server <IP> talked to <IP>; port not an ip 1.2"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 2)
    assert out[2]["text"] == "call <PHONE> then <PHONE>"
    assert out[3]["n_pii"] == 0
    assert out[3]["text"] == "clean text, no contact info at all"
    assert out[4]["n_pii"] == 3
    assert out[4]["text"] == "mixed: <EMAIL> from <IP> dial <PHONE>"


def test_scrub_pii_map_only_plan(spark):
    from raptor_rag_spark.operators.pii import scrub_pii

    plan = scrub_pii(_pii_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Unigram LM scoring
# ---------------------------------------------------------------------------


def _lm_df(spark):
    rows = [
        (0, "the cat sat"),
        (1, "the the the"),
        (2, "dog dog zebra"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_nll(doc_tokens, corpus_counts, n_total, vocab_size):
    denom = n_total + vocab_size + 1.0
    return sum(
        -math.log((corpus_counts.get(t, 0) + 1.0) / denom) for t in doc_tokens
    ) / len(doc_tokens)


def test_lm_doc_scores_matches_hand_model(spark):
    from raptor_rag_spark.operators.textstats import lm_doc_scores

    # corpus: the=4 cat=1 sat=1 dog=2 zebra=1 -> N=9, V=5
    counts = {"the": 4, "cat": 1, "sat": 1, "dog": 2, "zebra": 1}
    out = {r["doc_id"]: r for r in lm_doc_scores(_lm_df(spark)).collect()}
    for doc_id, toks in [
        (0, ["the", "cat", "sat"]),
        (1, ["the", "the", "the"]),
        (2, ["dog", "dog", "zebra"]),
    ]:
        exp = _expected_nll(toks, counts, 9, 5)
        assert out[doc_id]["n_tok"] == len(toks)
        assert out[doc_id]["nll_avg"] == pytest.approx(exp, abs=1e-6)
    # rarer tokens -> higher nll than the all-common-token doc
    assert out[2]["nll_avg"] > out[1]["nll_avg"]
    # token-less doc: present, n_tok 0, NULL score
    assert out[3]["n_tok"] == 0 and out[3]["nll_avg"] is None


def test_lm_doc_scores_top_v_parity_and_oov(spark):
    from raptor_rag_spark.operators.textstats import lm_doc_scores

    df = _lm_df(spark)
    full = {r["doc_id"]: r["nll_avg"] for r in lm_doc_scores(df).collect()}
    # cap >= V: identical to the full model
    capped = {r["doc_id"]: r["nll_avg"] for r in lm_doc_scores(df, top_v=100).collect()}
    assert capped == full
    # cap = 1 keeps only 'the'; every other token scores as unseen
    # (c=0 in the SAME denominator), so doc 1 (all 'the') is unchanged
    top1 = {r["doc_id"]: r["nll_avg"] for r in lm_doc_scores(df, top_v=1).collect()}
    assert top1[1] == full[1]
    denom = 9 + 5 + 1.0
    exp0 = (-math.log(5 / denom) - 2 * math.log(1 / denom)) / 3
    assert top1[0] == pytest.approx(exp0, abs=1e-6)
    # capped-vocab join side is a broadcast, not a shuffle
    plan = (
        lm_doc_scores(df, top_v=1)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_lm_doc_scores_external_counts(spark):
    """`counts` trained on a reference corpus scores OTHER docs (the
    CCNet setup): scoring docs contribute nothing to the model."""
    from raptor_rag_spark.operators.textstats import lm_doc_scores, unigram_counts

    ref = _lm_df(spark)
    counts = unigram_counts(ref)
    target = spark.createDataFrame([(7, "the martian")], "doc_id long, text string")
    row = lm_doc_scores(target, counts=counts).collect()[0]
    denom = 9 + 5 + 1.0
    exp = (-math.log(5 / denom) - math.log(1 / denom)) / 2  # 'martian' is OOV
    assert row["nll_avg"] == pytest.approx(exp, abs=1e-6)


# ---------------------------------------------------------------------------
# Paragraph dedup
# ---------------------------------------------------------------------------


def test_dedup_paragraphs_first_occurrence(spark):
    from raptor_rag_spark.operators.dedup import dedup_paragraphs

    rows = [
        (0, "unique a\nSHARED NAV\nunique b"),
        (1, "SHARED NAV\nunique c"),
        (2, "unique d\n\nSHARED NAV"),  # blank line must survive
        (3, "SHARED NAV"),  # every line dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 3)  # first occurrence keeps
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (3, 2)  # blank kept, NAV dropped
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 0)
    assert out[3]["text_md5"] is None

    # rebuilt text md5 matches a hand rebuild
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[0]["text_md5"] == md5("unique a\nSHARED NAV\nunique b")
    assert out[1]["text_md5"] == md5("unique c")
    assert out[2]["text_md5"] == md5("unique d\n")


def test_dedup_paragraphs_within_doc_and_determinism(spark):
    from raptor_rag_spark.operators.dedup import dedup_paragraphs

    # duplicate INSIDE one doc dedups to the earliest line_idx, and the
    # result is repartition-invariant (winner = global min, not
    # partition order)
    rows = [(5, "x\ny\nx"), (6, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for d in (df, df.repartition(7)):
        out = {r["doc_id"]: r for r in dedup_paragraphs(d).collect()}
        assert (out[5]["n_lines"], out[5]["n_kept"]) == (3, 2)
        assert (out[6]["n_lines"], out[6]["n_kept"]) == (1, 0)


def test_facades(spark, tmp_path):
    from raptor_rag_spark.api import RaptorEngine

    eng = RaptorEngine(spark, str(tmp_path / "ck"))
    assert eng.scrub_pii(_pii_df(spark)).count() == 5
    assert eng.lm_quality_scores(_lm_df(spark)).count() == 4
    df = spark.createDataFrame([(0, "a\nb"), (1, "a")], "doc_id long, text string")
    assert eng.dedup_paragraphs(df).count() == 2


# ---------------------------------------------------------------------------
# CCNet perplexity buckets
# ---------------------------------------------------------------------------


def test_lm_perplexity_buckets(spark):
    from raptor_rag_spark.operators.textstats import lm_perplexity_buckets

    rows = [(i, float(i)) for i in range(9)] + [(9, None)]
    scores = spark.createDataFrame(rows, "doc_id long, nll_avg double")
    out = {r["doc_id"]: r["lm_bucket"] for r in lm_perplexity_buckets(scores).collect()}
    # exact percentiles on 0..8: q33 -> 2.64.. -> nearest-rank approx;
    # assert the ordering property instead of exact thresholds
    buckets = [out[i] for i in range(9)]
    order = {"head": 0, "middle": 1, "tail": 2}
    assert all(order[a] <= order[b] for a, b in zip(buckets, buckets[1:]))
    assert buckets[0] == "head" and buckets[8] == "tail"
    assert "middle" in buckets
    assert out[9] == "tail"  # NULL score pins to tail

    with pytest.raises(ValueError):
        lm_perplexity_buckets(scores, cuts=(0.7, 0.3))


def test_lm_perplexity_buckets_facade(spark, tmp_path):
    from raptor_rag_spark.api import RaptorEngine

    eng = RaptorEngine(spark, str(tmp_path / "ck"))
    out = eng.lm_perplexity_buckets(_lm_df(spark))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[3]["lm_bucket"] == "tail"  # token-less doc
    assert {r["lm_bucket"] for r in rows.values()} <= {"head", "middle", "tail"}


# ---------------------------------------------------------------------------
# DF-based boilerplate removal
# ---------------------------------------------------------------------------


def test_drop_boilerplate_lines(spark):
    from raptor_rag_spark.operators.dedup import drop_boilerplate_lines

    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # NAV appears in 3/5 docs (60%), FOOT in 2/5 (40%), others unique
    rows = [
        (0, "NAV\nalpha\nFOOT"),
        (1, "NAV\nbeta"),
        (2, "NAV\n\ngamma"),
        (3, "delta\nFOOT"),
        (4, "epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_docs=3: only NAV crosses; dropped from ALL docs (no first copy)
    out = {r["doc_id"]: r for r in drop_boilerplate_lines(df, min_docs=3).collect()}
    assert out[0]["text_md5"] == md5("alpha\nFOOT")
    assert out[1]["text_md5"] == md5("beta")
    assert out[2]["text_md5"] == md5("\ngamma")  # blank survives
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 2)
    # min_doc_frac=0.4 -> threshold max(ceil(2),2)=2: FOOT also drops
    out = {
        r["doc_id"]: r
        for r in drop_boilerplate_lines(df, min_doc_frac=0.4, min_docs=None).collect()
    }
    assert out[0]["text_md5"] == md5("alpha")
    assert out[3]["text_md5"] == md5("delta")
    assert out[4]["text_md5"] == md5("epsilon")  # unique lines untouched

    # exactly-one-param guard
    with pytest.raises(ValueError):
        drop_boilerplate_lines(df, min_doc_frac=0.1, min_docs=3)
    with pytest.raises(ValueError):
        drop_boilerplate_lines(df, min_doc_frac=None, min_docs=None)
    with pytest.raises(ValueError):
        drop_boilerplate_lines(df, min_docs=1, min_doc_frac=None)


def test_drop_boilerplate_facade_and_within_doc_df(spark, tmp_path):
    from raptor_rag_spark.api import RaptorEngine

    # DF counts DISTINCT docs: a line repeated 5x inside ONE doc stays
    df = spark.createDataFrame(
        [(0, "x\nx\nx\nx\nx"), (1, "y")], "doc_id long, text string"
    )
    eng = RaptorEngine(spark, str(tmp_path / "ck"))
    out = {
        r["doc_id"]: r
        for r in eng.drop_boilerplate_lines(df, min_docs=2).collect()
    }
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (5, 5)


def test_lm_doc_scores_counts_guard(spark):
    from raptor_rag_spark.operators.textstats import lm_doc_scores

    bad = spark.createDataFrame([("the", 4)], "word string, cnt long")
    with pytest.raises(ValueError, match="token"):
        lm_doc_scores(_lm_df(spark), counts=bad)


# ---------------------------------------------------------------------------
# prepare_training_corpus — the composed pipeline
# ---------------------------------------------------------------------------


def test_prepare_training_corpus_end_to_end(spark, tmp_path):
    """One planted hazard per stage; the pipeline must resolve all of
    them in one call and keep the clean survivors' (scrubbed) text."""
    from raptor_rag_spark.api import RaptorEngine

    good = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "and watches the quiet water move past the old stone bridge"
    )
    rows = [
        # recrawl pair: same canonical url, id 1 is the newer fetch
        (0, "http://A.com/page?utm_source=x", 100, "siteA", "old fetch " + good),
        (1, "http://a.com/page", 200, "siteA", good + " updated text version here"),
        # PII doc (otherwise clean)
        (2, "http://b.com/1", 100, "siteB", good + " contact zed@example.com now"),
        # low-quality doc (digit-heavy AND too few words -> score 0.0)
        (3, "http://b.com/2", 100, "siteB", "1234 5678 9999"),
        # exact dup pair: 4 kept (min id), 5 dropped
        (4, "http://c.com/1", 100, "siteC", good),
        (5, "http://c.com/2", 100, "siteC", good.upper()),
        # benchmark leak: verbatim bench question (distinct from `good`)
        (6, "http://d.com/1", 100, "siteD",
         "what color is the cloudless daytime sky answer it is blue of course"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long, source string, text string"
    )
    bench = spark.createDataFrame(
        [(0, "what color is the cloudless daytime sky answer it is blue of course")],
        "bench_id long, text string",
    )
    eng = RaptorEngine(spark, str(tmp_path / "ck"))
    out = eng.prepare_training_corpus(
        docs,
        url_col="url",
        min_quality=0.5,
        dedup="exact",
        benchmark=bench,
        decontam_n=5,
    )
    rows_out = {r["doc_id"]: r for r in out.collect()}
    # 0 lost to recrawl collapse, 3 to quality, 5 to exact dedup, 6 to decontam
    assert set(rows_out) == {1, 2, 4}
    assert "<EMAIL>" in rows_out[2]["text"] and "zed@" not in rows_out[2]["text"]
    # original non-text columns survive
    assert rows_out[4]["source"] == "siteC"


def test_prepare_training_corpus_stages_toggle(spark, tmp_path):
    """Stages off -> passthrough; near-dup clustering path + domain cap."""
    from raptor_rag_spark.api import RaptorEngine

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two"
    )
    rows = [(i, "s" + str(i % 2), base + f" tail{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    eng = RaptorEngine(spark, str(tmp_path / "ck"))
    # everything disabled = identity (same rows, text untouched)
    ident = eng.prepare_training_corpus(
        docs, scrub=False, min_quality=None, dedup=None
    )
    assert sorted(r["text"] for r in ident.collect()) == sorted(r[2] for r in rows)
    # near-dup clustering: all 6 are one ngram cluster -> canonical only
    clustered = eng.prepare_training_corpus(
        docs, scrub=False, min_quality=None, dedup="ngram"
    )
    assert [r["doc_id"] for r in clustered.collect()] == [0]
    # domain cap: 2 sources, cap 1 -> 2 rows
    capped = eng.prepare_training_corpus(
        docs, scrub=False, min_quality=None, dedup=None, max_per_stratum=1
    )
    assert capped.count() == 2


def test_prepare_training_corpus_budget_and_mixture(spark, tmp_path):
    """Stages 11+12: token-budget selection keeps the best-quality
    prefix of survivors; mixture sampling runs LAST so epochs multiply
    only surviving docs."""
    from raptor_rag_spark.api import RaptorEngine

    good = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "and watches the quiet water move past the old stone bridge"
    )
    rows = (
        # high-quality docs, lang en (tokens ~22 each)
        [(i, "en", good + f" marker{i}") for i in range(4)]
        # a low-quality doc (digits-heavy -> score penalty)
        + [(10, "en", "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    eng = RaptorEngine(spark, str(tmp_path / "ck"))

    # budget = exactly 3 good docs' tokens: best-scored prefix survives
    from raptor_rag_spark.tokenizer import spark_token_count

    t = docs.filter("doc_id = 0").select(
        spark_token_count(F.col("text")).alias("t")
    ).collect()[0]["t"]
    out = eng.prepare_training_corpus(
        docs, min_quality=None, dedup=None, token_budget=3 * t,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 10 not in kept  # low score orders last, over budget
    assert kept == {0, 1, 2}  # score ties -> doc_id asc prefix

    # mixture as the last stage: epochs only for survivors
    out2 = eng.prepare_training_corpus(
        docs, min_quality=0.9, dedup=None,
        mixture_rates_pct={"en": 200}, mixture_stratum_col="lang",
    )
    got = [(r["doc_id"], r["epoch"]) for r in out2.collect()]
    assert {d for d, _ in got} == {0, 1, 2, 3}  # doc 10 filtered first
    assert sorted(e for d, e in got if d == 0) == [0, 1]


def test_corpus_report(spark, tmp_path):
    from raptor_rag_spark.api import RaptorEngine

    good = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank and watches the quiet water move past the stone bridge"
    )
    rows = (
        [(i, "en", good + f" v{i}") for i in range(6)]
        + [(10, "de", good + " v0")]      # exact dup of doc 0 (normalized)
        + [(11, "de", None)]              # NULL text
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rep = RaptorEngine(spark, str(tmp_path / "ck")).corpus_report(docs)
    assert rep["n_docs"] == 8
    assert rep["n_null_text"] == 1
    assert rep["exact_dup_rate"] == round(1 / 7, 6)  # 7 non-null, 6 distinct
    assert abs(rep["distinct_content_est"] - 6) <= 1
    assert rep["strata_top"] == {"en": 6, "de": 2}
    assert rep["total_tokens"] > 0
    p10, p50, p90 = rep["quality_p10_p50_p90"]
    assert 0.0 <= p10 <= p50 <= p90 <= 1.0


def test_corpus_report_empty_input(spark, tmp_path):
    from raptor_rag_spark.api import RaptorEngine

    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    rep = RaptorEngine(spark, str(tmp_path / "ck")).corpus_report(empty)
    assert rep["n_docs"] == 0 and rep["n_null_text"] == 0
    assert rep["total_tokens"] == 0 and rep["exact_dup_rate"] == 0.0
    assert rep["distinct_content_est"] == 0
    assert rep["quality_p10_p50_p90"] == [] and rep["strata_top"] == {}


# ---------------------------------------------------------------------------
# C4 rule set
# ---------------------------------------------------------------------------


def test_c4_line_filters_rules(spark):
    from raptor_rag_spark.operators.textstats import c4_line_filters

    L = "this line has enough words here."   # keeps
    short = "too few words."                  # < 5 words -> drops
    nopunct = "this line has enough words but no mark"  # drops
    rows = [
        (0, f"{L}\n{L}\n{L}"),                       # 3 good lines -> kept
        (1, f"{L}\n{L}"),                            # only 2 -> page drops
        (2, f"{L}\n{short}\n{nopunct}\n{L}\n{L}"),   # bad lines filtered, 3 survive
        (3, f"{L}\n{L}\n{L}\nsee Lorem Ipsum text"), # lorem -> page drops
        (4, f"{L}\n{L}\n{L}\nvar x = {{}}"),         # brace -> page drops
        (5, None),                                    # NULL text
        (6, f"{L}   \n{L}\n{L}"),                    # trailing spaces tolerated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filters(df).collect()}
    assert out[0]["kept"] and out[0]["text"] == f"{L}\n{L}\n{L}"
    assert not out[1]["kept"] and out[1]["text"] is None
    assert out[2]["kept"] and (out[2]["n_lines"], out[2]["n_kept"]) == (5, 3)
    assert out[2]["text"] == f"{L}\n{L}\n{L}"
    assert not out[3]["kept"] and out[3]["n_kept"] >= 3  # page rule, not lines
    assert not out[4]["kept"]
    assert not out[5]["kept"] and (out[5]["n_lines"], out[5]["n_kept"]) == (0, 0)
    assert out[6]["kept"]  # [.!?"]\s*$ tolerates trailing whitespace
    # map-only: no exchange, no Python
    plan = c4_line_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_prepare_training_corpus_c4_stage(spark, tmp_path):
    from raptor_rag_spark.api import RaptorEngine

    L = "this line has enough words here."
    rows = [
        (0, "en", f"{L}\n{L}\n{L}"),
        (1, "en", "too short.\nalso short."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = RaptorEngine(spark, str(tmp_path / "ck")).prepare_training_corpus(
        docs, min_quality=None, dedup=None, c4_rules=True,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {0: f"{L}\n{L}\n{L}"}
