"""Generate tests/goldens/golden.json — pinned tile assignments and
kNN join output on the deterministic synthetic pages corpus (north_rule
parity surface: "join output rows and tile assignments"). Run once;
tests/test_goldens.py recomputes and asserts equality forever after.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from raptor_rag_spark.datagen import synthetic_pages  # noqa: E402
from raptor_rag_spark.operators.chunk import chunk_documents  # noqa: E402
from raptor_rag_spark.operators.embed import embed_texts  # noqa: E402
from raptor_rag_spark.operators.extract import extract_pages  # noqa: E402
from raptor_rag_spark.operators.knn import brute_force_knn  # noqa: E402
from raptor_rag_spark.operators.tile import reduce_2d, tile_assignments  # noqa: E402
from raptor_rag_spark.session import get_spark  # noqa: E402

N_PAGES = 300
DIM = 32
K = 5


def build(spark):
    pages = synthetic_pages(spark, n=N_PAGES, seed=42)
    docs = extract_pages(pages, passthrough=("page_id",)).select(
        F.col("page_id").alias("doc_id"), "text"
    )
    chunks = chunk_documents(docs, max_tokens=60)
    nodes = (
        embed_texts(chunks, dim=DIM)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )
    return reduce_2d(nodes, dim=DIM).localCheckpoint(eager=True)


def compute_goldens(spark) -> dict:
    nodes = build(spark)
    tiles = tile_assignments(nodes, "node_id", [2, 4]).collect()
    tile_rows = sorted(
        (r["node_id"], r["resolution"], r["cell_id"], r["is_soft"]) for r in tiles
    )
    tile_hash = hashlib.sha256(
        "\n".join(map(str, tile_rows)).encode()
    ).hexdigest()

    queries = nodes.orderBy("node_id").limit(10).select(
        F.col("node_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    knn = brute_force_knn(queries, nodes, k=K).collect()
    knn_rows = sorted(
        (r["query_id"], r["rank"], r["node_id"], round(r["dist"], 6)) for r in knn
    )
    return {
        "n_pages": N_PAGES,
        "dim": DIM,
        "n_nodes": nodes.count(),
        "n_tile_rows": len(tile_rows),
        "tile_assignments_sha256": tile_hash,
        "tile_sample": [list(r) for r in tile_rows[:20]],
        "knn_rows": [list(r) for r in knn_rows],
    }


if __name__ == "__main__":
    spark = get_spark("gen-goldens", cores=8)
    g = compute_goldens(spark)
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "golden.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(g, f, indent=1)
    print("wrote", out, "nodes:", g["n_nodes"], "tile rows:", g["n_tile_rows"])
    spark.stop()
