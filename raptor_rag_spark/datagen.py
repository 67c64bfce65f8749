"""Deterministic synthetic `pages` table (FIXTURES.md §1).

Common-Crawl-style shape per input_hint: (url string, warc_ts
timestamp, html binary, text string, lang string). Seeded; hot-domain
and hot-language Zipf skew on purpose (exercises salting). The html
wraps the text in a fixed template so HTML->text extraction has a
known byte-exact answer.

Generation is distributed: an id range is parallelized and rows are
synthesized per-partition inside mapInPandas — no driver-side
materialization, so `n` can be 10^9 without changing this code.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SENTENCE_POOL = [
    "The quick brown fox jumps over the lazy dog.",
    "Web scale data processing needs careful partitioning!",
    "Bir berber bir berbere gel beraber bir berber dukkani acalim demis.",
    "Edebiyat nedir diye sordu ogretmen?",
    "Los datos crecen mas rapido que nunca.",
    "Die Verarbeitung grosser Datenmengen erfordert Geduld.",
    "Every join has a shuffle, unless it broadcasts.",
    "Kucuk veriler buyuk sorunlar cikarabilir, dikkatli olun; verileri iyi yonetin.",
    "Sorting costs n log n, hashing is linear, choose wisely: benchmarks decide.",
    "A page may contain many sentences\nand even embedded newlines.",
    "Numbers like 12345 and 3.14159 appear often.",
    "Short one.",
]

_DOMAINS = [f"site{i:02d}.example" for i in range(50)]
_LANGS = ["tr", "en", "de", "es"]

PAGES_SCHEMA = "page_id long, url string, warc_ts timestamp, html binary, text string, lang string"


def _zipf_probs(n: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** alpha
    return w / w.sum()


def _make_rows(ids: np.ndarray, seed: int, hot_frac: float = 0.0) -> pd.DataFrame:
    dom_p = _zipf_probs(len(_DOMAINS), 1.3)
    lang_p = _zipf_probs(len(_LANGS), 1.2)
    t0 = dt.datetime(2024, 1, 1)
    span = int((dt.datetime(2025, 6, 30) - t0).total_seconds())
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for pid in ids:
        rng = np.random.RandomState(seed + int(pid))  # per-row determinism
        # deliberate hot-key stress: route ``hot_frac`` of the pages
        # (deterministic by pid, partition-invariant) to ONE domain +
        # language, drawing their text from a 3-sentence sub-pool so
        # their bag-of-token embeddings collapse into one tight region
        # (-> one hot tile cell) — the north_rule's popular-domain /
        # popular-language skew in its worst-case form
        hot = (int(pid) % 1000) < int(hot_frac * 1000)
        if hot:
            domain, lang = _DOMAINS[0], _LANGS[0]
        else:
            domain = _DOMAINS[rng.choice(len(_DOMAINS), p=dom_p)]
            lang = _LANGS[rng.choice(len(_LANGS), p=lang_p)]
        n_sent = rng.randint(2, 41)
        pool = 3 if hot else len(_SENTENCE_POOL)
        idx = rng.randint(0, pool, size=n_sent)
        text = " ".join(_SENTENCE_POOL[i] for i in idx)
        title = f"Page {pid} on {domain}"
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{text}</p></body></html>"
        ).encode("utf-8")
        urls.append(f"https://{domain}/p/{pid}")
        tss.append(t0 + dt.timedelta(seconds=int(rng.randint(0, span))))
        htmls.append(bytearray(html))
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {
            "page_id": ids.astype("int64"),
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def synthetic_pages(
    spark: SparkSession,
    n: int = 2000,
    seed: int = 42,
    partitions: int | None = None,
    hot_frac: float = 0.0,
) -> DataFrame:
    """``hot_frac`` > 0 makes that fraction of pages a single hot
    domain/language with near-identical text (see _make_rows) — the
    skewed-corpus stress input. Default 0.0 keeps the historical
    corpus byte-identical (hot_frac=0 selects no rows)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _make_rows(pdf["id"].to_numpy(), seed, hot_frac)

    return base.mapInPandas(gen, PAGES_SCHEMA)
