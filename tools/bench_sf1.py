"""sf1 spot-run: one decade more scale evidence than sf0.1 for the five
most expensive, corpus-shaped entries (VERDICT r4 item 6).

The driver ships parquet only up to sf0.1 (5,000 docs), so both legs
here are SYNTHETIC from the same generator — a word-salad corpus that
matches the driver testdata's documents distribution (vocab ~30 words,
15-60 words/doc, ~2% controlled near-dup rate) — at 5,000 docs
("sf0.1-eq") and 50,000 docs ("sf1"). Comparing within one generator
isolates the engine's cost curve from text-distribution differences.

Per entry we record elapsed at both sizes, the time ratio, and the
expected complexity; an entry flags ``super_linear`` when its time
ratio exceeds size_ratio * slack (slack 1.4 absorbs shuffle-partition
granularity + co-tenant noise; the doc-complexity note says what the
expected curve is).

Usage: python tools/bench_sf1.py [--small 5000] [--large 50000]
Writes bench_out/bench_r5_sf1.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
_VOCAB = [
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "hash", "slow", "group", "batch", "agg", "filter", "query",
    "key", "window", "vector", "part", "table", "stream", "customer",
    "join", "data", "big", "the", "a", "page", "cell",
]
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_LANGS = ["en", "zh", "tr", "de"]


def _gen_rows(ids: np.ndarray, seed: int) -> pd.DataFrame:
    texts, langs, srcs = [], [], []
    for did in ids:
        rng = np.random.RandomState(seed + int(did))
        if int(did) % 50 == 1:
            # controlled near-dup: a perturbed copy of the previous doc
            # (constant per-doc dup rate at every corpus size)
            base = np.random.RandomState(seed + int(did) - 1)
            words = [_VOCAB[i] for i in base.randint(0, len(_VOCAB), base.randint(15, 61))]
            if words:
                words[rng.randint(0, len(words))] = _VOCAB[rng.randint(0, len(_VOCAB))]
        else:
            words = [_VOCAB[i] for i in rng.randint(0, len(_VOCAB), rng.randint(15, 61))]
        texts.append(" ".join(words))
        langs.append(_LANGS[rng.randint(0, len(_LANGS))])
        srcs.append(f"src{rng.randint(0, 10)}")
    return pd.DataFrame(
        {
            "doc_id": ids.astype("int64"),
            "text": texts,
            "lang": langs,
            "source": srcs,
            "n_chars": [len(t) for t in texts],
        }
    )


def synth_documents(spark, n: int, seed: int = 99, partitions: int = 64):
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _gen_rows(pdf["id"].to_numpy(), seed)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, DOCS_SCHEMA)


def leaf_nodes(docs):
    from raptor_rag_spark.operators.chunk import chunk_documents
    from raptor_rag_spark.operators.embed import embed_texts

    chunks = chunk_documents(docs, max_tokens=60)
    return (
        embed_texts(chunks, dim=DIM)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=5000)
    ap.add_argument("--large", type=int, default=50000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from raptor_rag_spark.config import EngineConfig
    from raptor_rag_spark.operators.dedup import (
        dedup_paragraphs,
        minhash_dedup_pairs,
        remove_duplicate_spans,
    )
    from raptor_rag_spark.operators.knn import tile_knn_adaptive
    from raptor_rag_spark.operators.tile import adaptive_tile_assignments, reduce_2d
    from raptor_rag_spark.operators.tree import build_tree
    from raptor_rag_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("bench-sf1", cores=cpus)
    spark.range(1).count()

    # the warmup leg pays every one-time constant (python workers, Arrow
    # paths, codegen caches) OUTSIDE the timed legs — without it the
    # small leg absorbs ~all warmup and the ratio reads inverted
    sizes = {"warmup": 200, "sf0.1eq": args.small, "sf1": args.large}
    # entry -> (expected complexity note, extra slack multiplier)
    expectations = {
        "tree_build_full": (
            "O(n log n): ~log4 more levels at 10x docs; each level linear", 1.3
        ),
        "minhash_pairs": (
            "O(n) signatures + O(candidates) verify; dup rate constant by "
            "construction so candidates ~ linear", 1.0
        ),
        "para_dedup": ("O(lines) partial-agg + winner join", 1.0),
        "span_dedup_exactsubstr": ("O(tokens) fingerprints + span merge", 1.0),
        "knn_corpus_tile": (
            "O(n): embed+reduce+adaptive tiling of the corpus", 1.0
        ),
        "knn_tiled_1000q": (
            "~O(queries x capped candidates): occupancy-capped tiles keep "
            "candidates/query ~flat as the corpus densifies -> SUBlinear "
            "in corpus size (ratio ~1 expected, not 10)", 1.0
        ),
    }
    results: dict[str, dict] = {k: {} for k in expectations}
    base_slack = 1.4

    for tag, n in sizes.items():
        docs = synth_documents(spark, n).localCheckpoint(eager=True)
        holder: dict = {}

        def timed(name: str, fn) -> None:
            t0 = time.time()
            fn()
            results[name][tag] = round(time.time() - t0, 2)

        tree_dir = tempfile.mkdtemp(prefix=f"sf1_tree_{tag}_")

        timed(
            "tree_build_full",
            lambda: build_tree(
                spark, leaf_nodes(docs), tree_dir,
                EngineConfig(embedding_dim=DIM),
                start_resolution=4, max_layers=6, embed_dim=DIM,
            ).count(),
        )
        shutil.rmtree(tree_dir, ignore_errors=True)

        timed("minhash_pairs", lambda: minhash_dedup_pairs(docs).count())
        results["minhash_pairs"].setdefault("pairs", {})[tag] = (
            minhash_dedup_pairs(docs).count()
        )
        timed("para_dedup", lambda: dedup_paragraphs(docs).count())
        timed(
            "span_dedup_exactsubstr",
            lambda: remove_duplicate_spans(docs, k=8)
            .write.format("noop").mode("overwrite").save(),
        )

        def _corpus():
            nodes = leaf_nodes(docs).select("node_id", "embedding")
            nodes = reduce_2d(nodes, dim=DIM).localCheckpoint(eager=True)
            tiles = adaptive_tile_assignments(
                nodes, "node_id", base_resolution=3,
                max_occupancy=256, max_resolution=9,
            ).localCheckpoint(eager=True)
            holder["nodes"], holder["tiles"] = nodes, tiles

        timed("knn_corpus_tile", _corpus)

        def _knn():
            q = (
                holder["nodes"].orderBy("node_id").limit(1000)
                .select(
                    F.col("node_id").alias("query_id"),
                    F.col("embedding").alias("q_embedding"), "x", "y",
                )
            )
            tile_knn_adaptive(
                q, holder["nodes"].select("node_id", "embedding"),
                holder["tiles"], k=10, ring=3, max_ring=8,
            ).count()

        timed("knn_tiled_1000q", _knn)

    for vals in results.values():
        vals.pop("warmup", None)
        if "pairs" in vals:
            vals["pairs"].pop("warmup", None)
    size_ratio = args.large / args.small
    out = {
        "metric": "sf1 spot-run: five corpus-shaped entries at 10x sf0.1 docs",
        "docs": sizes,
        "size_ratio": size_ratio,
        "cpus": cpus,
        "entries": {},
    }
    for name, vals in results.items():
        note, extra = expectations[name]
        ratio = round(vals["sf1"] / vals["sf0.1eq"], 2) if vals["sf0.1eq"] else None
        entry = {
            "sec_small": vals["sf0.1eq"],
            "sec_large": vals["sf1"],
            "time_ratio": ratio,
            "expected": note,
            "super_linear": (
                bool(ratio > size_ratio * base_slack * extra) if ratio else None
            ),
        }
        if "pairs" in vals:
            entry["pairs"] = vals["pairs"]
        out["entries"][name] = entry
    spark.stop()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_out"
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "bench_r5_sf1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
