"""ExactSubstr duplicate-span dedup (dedup.duplicate_spans /
remove_duplicate_spans) — planted-span exactness, within-doc repeats,
min_count, merge behavior, and brute-force parity on a small corpus."""

import random
import re
from collections import Counter

from pyspark.sql import functions as F

K = 4  # small k keeps hand-built fixtures readable


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(rows, k, min_count):
    """Reference window-cover in plain Python: token -> covered set."""
    toks = {
        i: re.sub(r"[ \t\n\r\f\x0B]+", " ", t).strip().split(" ")
        for i, t in rows
        if t is not None
    }
    cnt = Counter()
    for ts in toks.values():
        for p in range(len(ts) - k + 1):
            cnt[" ".join(ts[p : p + k])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if cnt[" ".join(ts[p : p + k])] >= min_count:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (len(ts), covered, kept)
    return out


def test_planted_cross_doc_span(spark):
    from raptor_rag_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    # u0..u9 / w0..w9 unique contexts; the shared 5-token span sits at
    # token 3 in doc 0 and token 0 in doc 1 -> exactly 2 dup windows
    # (k=4) per doc covering the 5 shared tokens, nothing else
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, "u0 u1 u2 " + shared + " u3 u4 u5"),
        (1, shared + " w0 w1 w2 w3 w4 w5"),
        (2, "v0 v1 v2 v3 v4 v5 v6 v7 v8"),
    ]
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(_df(spark, rows), k=K).collect()
    }
    assert spans == {0: (3, 8, 2), 1: (0, 5, 2)}

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            _df(spark, rows), k=K, return_text=True
        ).collect()
    }
    assert out[0]["text"] == "u0 u1 u2 u3 u4 u5"
    assert out[1]["text"] == "w0 w1 w2 w3 w4 w5"
    assert out[2]["text"] == "v0 v1 v2 v3 v4 v5 v6 v7 v8"
    assert (out[0]["n_tokens"], out[0]["n_kept"]) == (11, 6)


def test_within_doc_repeat_counts(spark):
    from raptor_rag_spark.operators.dedup import remove_duplicate_spans

    # the 4-gram repeats inside ONE doc -> total count 2 -> both copies
    # drop (ExactSubstr semantics: occurrences, not distinct docs)
    rows = [(0, "a b c d x1 x2 a b c d y1"), (1, "z0 z1 z2 z3 z4")]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            _df(spark, rows), k=K, return_text=True
        ).collect()
    }
    assert out[0]["text"] == "x1 x2 y1"
    assert out[1]["text"] == "z0 z1 z2 z3 z4"


def test_min_count_threshold(spark):
    from raptor_rag_spark.operators.dedup import remove_duplicate_spans

    twice = "p q r s"
    thrice = "h i j k"
    rows = [
        (0, f"{twice} m0 {thrice} m1"),
        (1, f"{twice} n0 {thrice} n1"),
        (2, f"o0 o1 {thrice} o2"),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            _df(spark, rows), k=K, min_count=3, return_text=True
        ).collect()
    }
    # count-2 span survives min_count=3; count-3 span drops everywhere
    assert out[0] == f"{twice} m0 m1"
    assert out[1] == f"{twice} n0 n1"
    assert out[2] == "o0 o1 o2"


def test_adjacent_and_overlapping_windows_merge(spark):
    from raptor_rag_spark.operators.dedup import duplicate_spans

    # 6 shared tokens with k=4 -> dup windows at pos 0,1,2 in doc 1:
    # overlapping windows must merge into ONE maximal span [0, 6)
    shared = "s0 s1 s2 s3 s4 s5"
    rows = [(0, shared + " a0 a1 a2"), (1, shared + " b0 b1 b2")]
    spans = duplicate_spans(_df(spark, rows), k=K).collect()
    per_doc = {(r["doc_id"]): (r["span_start"], r["span_end"]) for r in spans}
    assert len(spans) == 2 and per_doc == {0: (0, 6), 1: (0, 6)}


def test_fully_covered_and_short_and_null_docs(spark):
    from raptor_rag_spark.operators.dedup import remove_duplicate_spans

    dup = "c0 c1 c2 c3 c4"
    rows = [(0, dup), (1, dup), (2, "tiny doc"), (3, None), (4, "")]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(_df(spark, rows), k=K).collect()
    }
    assert set(out) == {0, 1, 2, 4}  # NULL-text doc absent
    for i in (0, 1):  # fully covered -> everything dropped, md5 NULL
        assert (out[i]["n_tokens"], out[i]["n_kept"]) == (5, 0)
        assert out[i]["text_md5"] is None
    assert (out[2]["n_tokens"], out[2]["n_kept"]) == (2, 2)  # < k untouched
    assert out[4]["n_tokens"] == 1  # '' splits to one empty token, kept


def test_brute_force_parity_small_vocab(spark):
    from raptor_rag_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    # tiny vocab + seeded shuffles -> many NATURAL duplicate 4-grams,
    # including within-doc repeats and boundary collisions
    rng = random.Random(7)
    vocab = ["red", "blue", "green", "ink", "dot"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(30)
    ]
    ref = _brute(rows, K, 2)

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            _df(spark, rows), k=K, return_text=True
        ).collect()
    }
    assert set(out) == set(ref)
    for i, (n_tok, covered, kept) in ref.items():
        assert out[i]["n_tokens"] == n_tok, i
        assert out[i]["n_kept"] == len(kept), i
        assert out[i]["text"] == (" ".join(kept) if kept else None), i

    # spans == maximal runs of the brute-force covered sets
    spans = duplicate_spans(_df(spark, rows), k=K).collect()
    got = {}
    for r in spans:
        got.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"])
        )
        assert r["span_end"] - r["span_start"] >= K
    want = {i: cov for i, (_, cov, _) in ref.items() if cov}
    assert got == want


def test_detection_shuffle_carries_fingerprints_not_text(spark):
    """The dup-window groupBy must aggregate 8-byte fingerprints: no
    window STRING (concat of tokens) may survive into the exchange,
    and the whole pipeline stays JVM-side (no BatchEvalPython)."""
    from raptor_rag_spark.operators.dedup import duplicate_spans

    rows = [(i, f"x{i} y{i} z{i} w{i} q{i}") for i in range(4)]
    plan = duplicate_spans(_df(spark, rows), k=K)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # the aggregate keys on the xxhash64 fingerprint column `_fp`
    assert "_fp" in plan


def test_pipeline_span_stage(spark, tmp_path):
    """prepare_training_corpus(dedup_spans_k=...): the shared tail span
    drops from both carriers, a fully-duplicated doc drops entirely,
    non-text columns survive."""
    from raptor_rag_spark.api import RaptorEngine

    span = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, "siteA", "u0 u1 u2 u3 u4 u5 u6 u7 " + span),
        (1, "siteB", "w0 w1 w2 w3 w4 w5 w6 w7 " + span),
        (2, "siteC", span),  # fully covered -> dropped
        (3, "siteD", "v0 v1 v2 v3 v4 v5 v6 v7 v8"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    eng = RaptorEngine(spark, str(tmp_path / "ck"))
    out = eng.prepare_training_corpus(
        docs, scrub=False, min_quality=None, dedup=None, dedup_spans_k=K
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {0, 1, 3}
    assert got[0]["text"] == "u0 u1 u2 u3 u4 u5 u6 u7"
    assert got[1]["text"] == "w0 w1 w2 w3 w4 w5 w6 w7"
    assert got[3]["text"] == "v0 v1 v2 v3 v4 v5 v6 v7 v8"
    assert got[0]["source"] == "siteA"
