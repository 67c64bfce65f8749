"""kNN join — the engine's flagship operator.

Replaces the reference's brute-force scipy loop
(/root/reference/raptor/utils.py:103-136 + argsort :198-208, callers
tree_retriever.py:199-224) and its FAISS IndexFlatIP search
(/root/reference/raptor/FaissRetriever.py:187-202,:259-273).

Two physical strategies over identical semantics:

1. ``brute_force_knn`` — queries x nodes cross join + cosine distance
   + per-query top-k window. The node side is the build side shared by
   all queries (the batch-retrieval reuse at tree_retriever.py:502-504
   is just "the join build side" here). Correct at any selectivity;
   O(|Q| * |N|).

2. ``tile_knn`` — tile-pruned candidate generation: equi-join query
   cells against the node tile table on cell_id (with a neighbor ring
   around the query cell), then exact cosine re-rank. This is the
   engine recast of the FAISS index (north_rule): the cell grid is the
   index, the equi-join is the lookup — shuffle/broadcast hash join
   picked by AQE. Ring expansion: queries that end up with < k
   candidates retry with a wider ring (driver loop, geometrically rare).

Distances: embeddings are unit-norm, so cosine distance = 1 - dot.
The dot product is computed JVM-side (zip_with + aggregate in double
precision) — no Python in the join hot path. Ordering ties break on
node_id: np.argsort's default quicksort is NOT stable, so the
reference's tie order is undefined; the engine pins (dist, node_id)
total order (SURVEY.md §2.5 W1, documented deviation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raptor_rag_spark.config import DEFAULT_CONFIG
from raptor_rag_spark.operators.tile import grid_index, neighbor_cells


def dot_product(a: Column, b: Column) -> Column:
    """double dot product of two array<float> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity, assuming unit-norm inputs (reference
    stores normalized e5 vectors; FAISS IP == cosine there too,
    FaissRetriever.py:181-185)."""
    return F.lit(1.0) - dot_product(a, b)


def _rank_and_take(
    scored: DataFrame, k: int, query_id: str = "query_id", node_id: str = "node_id"
) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(node_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_knn(
    queries: DataFrame,
    nodes: DataFrame,
    k: int = DEFAULT_CONFIG.top_k,
    query_id: str = "query_id",
    node_id: str = "node_id",
    q_emb: str = "q_embedding",
    n_emb: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, node_id, dist, rank<=k). Exact.

    At scale: broadcast the QUERY side (queries are few, nodes are
    10^12) so the node table streams map-side with zero shuffle of the
    big side; only the per-query top-k partial aggregates shuffle.
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    joined = q.crossJoin(nodes.select(node_id, n_emb))
    scored = joined.select(
        query_id, node_id, cosine_distance(F.col(q_emb), F.col(n_emb)).alias("dist")
    )
    return _rank_and_take(scored, k, query_id, node_id)


def tile_knn_candidates(
    queries_xy: DataFrame,
    node_tiles: DataFrame,
    resolution: int,
    ring: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """Candidate generation: explode the query's neighbor-ring cells at
    ``resolution`` and equi-join the node tile table on cell_id.

    queries_xy needs x, y (reduced coords); node_tiles is the long
    (node_id, resolution, cell_id, is_soft) table — pre-filtered to one
    resolution here, so partition pruning applies when tiles are
    written partitioned by resolution.
    """
    q = queries_xy.withColumn("ix", grid_index(F.col("x"), resolution)).withColumn(
        "iy", grid_index(F.col("y"), resolution)
    )
    q = q.withColumn(
        "cell_id", F.explode(neighbor_cells(resolution, ring))
    ).drop("ix", "iy")
    tiles = node_tiles.filter(F.col("resolution") == resolution).select(
        "node_id", "cell_id"
    )
    # dropDuplicates: soft assignment can emit a node into several of
    # the query's ring cells — each (query, node) pair scores once.
    return (
        F.broadcast(q)
        .join(tiles, "cell_id")
        .select(query_id, "node_id")
        .dropDuplicates([query_id, "node_id"])
    )


def tile_knn(
    queries: DataFrame,
    nodes: DataFrame,
    node_tiles: DataFrame,
    resolution: int,
    k: int = DEFAULT_CONFIG.top_k,
    ring: int = 1,
    max_ring: int | None = None,
    query_id: str = "query_id",
    q_emb: str = "q_embedding",
) -> DataFrame:
    """Tile-pruned kNN: candidates via cell equi-join, exact re-rank.

    ``queries`` must carry x, y (from tile.reduce_2d on the query
    embedding). If ``max_ring`` is set, queries with < k candidates are
    retried at wider rings (driver loop — each pass is a pure
    DataFrame job; at most log-grid passes since ring doubles).
    """
    max_ring = max_ring if max_ring is not None else ring
    grid_n = 1 << (resolution + 1)

    remaining = queries
    results: DataFrame | None = None
    r = ring
    while True:
        cand = tile_knn_candidates(remaining, node_tiles, resolution, r, query_id)
        scored = (
            cand.join(nodes.select("node_id", "embedding"), "node_id")
            .join(F.broadcast(remaining.select(query_id, q_emb)), query_id)
            .select(
                query_id,
                "node_id",
                cosine_distance(F.col(q_emb), F.col("embedding")).alias("dist"),
            )
        )
        ranked = _rank_and_take(scored, k, query_id)
        if r >= max_ring or r >= grid_n:
            results = ranked if results is None else results.unionByName(ranked)
            break
        # queries that already have k hits are done; rest widen the ring
        counts = ranked.groupBy(query_id).agg(F.count("*").alias("_n"))
        done_ids = counts.filter(F.col("_n") >= k).select(query_id)
        done = ranked.join(F.broadcast(done_ids), query_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(F.broadcast(done_ids), query_id, "left_anti")
        if not remaining.take(1):
            break
        r = max(r * 2, r + 1)
    return results


def token_budget_prefix(
    ranked: DataFrame,
    max_tokens: int = DEFAULT_CONFIG.retrieve_max_tokens,
    query_id: str = "query_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Keep the rank-order prefix whose inclusive running token sum
    stays <= max_tokens — exactly the reference's break-at-first-
    overflow loop (tree_retriever.py:211-221): n_tokens >= 0 makes the
    running sum monotone, so 'first overflow' == 'cumsum > budget'."""
    w = (
        Window.partitionBy(query_id)
        .orderBy(F.col("rank").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranked.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("cum_tokens") <= max_tokens)
    )


def threshold_select(ranked: DataFrame, threshold: float) -> DataFrame:
    """Reference 'threshold' mode keeps dist > threshold — note:
    DISTANCE, not similarity (quirk preserved, tree_retriever.py:293-296,
    SURVEY.md W3)."""
    return ranked.filter(F.col("dist") > threshold)


# every char class Python str.splitlines treats as a line boundary
_LINE_TERM = "[\\n\\r\\x0B\\f\\x1C-\\x1E\\u0085\\u2028\\u2029]"


def flatten_lines(col: Column) -> Column:
    """JVM equivalent of ``' '.join(s.splitlines())`` (utils.py:193):
    \\r\\n is ONE break, every internal break becomes one space, and one
    trailing break is dropped (dropping any single terminator of a
    trailing run is equivalent)."""
    t = F.regexp_replace(col, "\\r\\n", "\n")
    # \z = absolute end of input ($ would also match before a final
    # terminator and replaceAll would strip the whole trailing run)
    t = F.regexp_replace(t, _LINE_TERM + "\\z", "")
    return F.regexp_replace(t, _LINE_TERM, " ")


def assemble_context(
    selected: DataFrame, query_id: str = "query_id", text_col: str = "text"
) -> DataFrame:
    """Per-query context string: nodes in rank order, each with
    newlines flattened to spaces, joined by blank lines with a
    TRAILING separator — byte-matches the reference get_text
    (utils.py:181-195: text += joined + "\\n\\n" per node)."""
    ordered = selected.withColumn("_flat", flatten_lines(F.col(text_col)))
    agg = (
        ordered.groupBy(query_id)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rank"), F.col("_flat")))
                    ),
                    lambda s: s["_flat"],
                ),
                "\n\n",
            ).alias("_ctx")
        )
    )
    return agg.select(
        query_id, F.concat(F.col("_ctx"), F.lit("\n\n")).alias("context")
    )
