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
from raptor_rag_spark.operators.tile import (
    MAX_BROADCAST_RESOLUTION,
    cell_key_col,
    grid_index,
    neighbor_cells,
)


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


# above this many queries the driver-collected broadcast matrix stops
# being a build side and starts being a driver OOM: strategy='auto'
# switches to the join-based (fully distributed) scoring path there.
BROADCAST_MAX_QUERIES = 100_000


def _collect_query_matrix(queries: DataFrame, query_id: str, q_emb: str):
    """Query side -> (ids ndarray, float64 matrix). Broadcast-path build
    side for small query batches; large batches take the join path
    (see BROADCAST_MAX_QUERIES / strategy='join')."""
    import numpy as np

    pdf = queries.select(query_id, q_emb).toPandas()
    ids = pdf[query_id].to_numpy(dtype=np.int64)
    mat = vec_matrix(pdf[q_emb], q_emb, "_collect_query_matrix")
    return ids, mat


def vec_matrix(values, col: str, where: str, expect_dim: int | None = None):
    """Column of array<float> -> (n, d) float64 matrix, failing LOUDLY
    on NULL or ragged-length vectors. ``np.array(list(col))`` silently
    builds a ragged object array from such input and the downstream
    matmul dies with a cryptic gufunc shape error (or, worse, a batch
    of only-NULL rows scores garbage) — every scoring kernel builds its
    matrices through this guard instead."""
    import numpy as np

    vals = list(values)
    if not vals:
        return np.zeros((0, 0), dtype=np.float64)
    if any(v is None for v in vals):
        raise ValueError(
            f"{where}: NULL vector in column {col!r}; drop or repair "
            f"NULL embeddings before scoring (e.g. .filter(col({col!r}).isNotNull()))"
        )
    try:
        mat = np.asarray(vals, dtype=np.float64)
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"{where}: non-numeric or ragged-length vectors in column {col!r}"
        ) from exc
    if mat.ndim != 2:
        raise ValueError(
            f"{where}: ragged vector lengths in column {col!r} "
            f"(rows must share one dimension)"
        )
    if expect_dim is not None and mat.shape[1] != expect_dim:
        # a ragged corpus whose rows split across Arrow batches builds
        # internally-consistent per-batch matrices — the cross-batch
        # mismatch only surfaces against the expected (query) dim
        raise ValueError(
            f"{where}: vectors in column {col!r} have length "
            f"{mat.shape[1]}, expected {expect_dim}"
        )
    return mat


def require_integral_id(df: DataFrame, col: str, where: str) -> None:
    """The join-path kernels cast ids with cast('long') / numpy int64: a
    non-integral id column would silently become NULL, collapse every
    row into the xxhash64(NULL) block, and crash the kernel on None ids
    — fail loudly up front instead (same contract as
    dedup.embedding_neardup_pairs)."""
    id_type = df.schema[col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"{where} needs an integral id column; {col!r} is {id_type}. "
            f"Derive one first, e.g. xxhash64({col}) or row_number, and "
            f"join back after."
        )


def semi_filter_allowed(
    df: DataFrame, allowed: DataFrame, id_col: str = "node_id"
) -> DataFrame:
    """Restrict ``df`` to the ids in a one-column ``allowed`` allowlist
    — the FILTERED-search metadata filter shared by brute_force_knn,
    retrieve_collapsed, TileAnnIndex.search and IvfIndex.search. One
    implementation so the semantics (left-semi: no columns contributed,
    first column renamed so any one-column frame works) cannot drift
    between call sites."""
    return df.join(
        allowed.withColumnRenamed(allowed.columns[0], id_col).select(id_col),
        id_col,
        "left_semi",
    )


def _resolve_strategy(strategy: str, queries: DataFrame) -> str:
    """'auto' -> 'broadcast' below BROADCAST_MAX_QUERIES else 'join'
    (one count() on the query side, which the caller's batch endpoint
    knows anyway)."""
    if strategy != "auto":
        return strategy
    return "broadcast" if queries.count() <= BROADCAST_MAX_QUERIES else "join"


def _brute_force_knn_join(
    queries: DataFrame,
    nodes: DataFrame,
    k: int,
    query_id: str,
    node_id: str,
    q_emb: str,
    n_emb: str,
    n_query_blocks: int | None = None,
    n_node_blocks: int | None = None,
) -> DataFrame:
    """Fully distributed brute-force kNN — NO driver collect of either
    side, so 10^6+ query batches behave exactly like 10 (the batch
    contract in retrieve.py).

    Physical strategy — two-sided blocked matmul (same shape as
    dedup.embedding_neardup_pairs): queries hash into QB blocks, nodes
    into NB blocks; each query row is replicated to every node block and
    vice versa; one ``applyInPandas`` group per (qb, nb) block pair does
    a BLAS matmul and emits its per-query partial top-k. The global
    window then sees at most NB*k rows per query — the union of partial
    top-ks always contains the global top-k. Shuffle volume is
    |Q|*NB + |N|*QB rows; block counts default from the cluster's
    parallelism so every core gets a block pair."""
    import numpy as np
    import pandas as pd

    require_integral_id(queries, query_id, "_brute_force_knn_join")
    require_integral_id(nodes, node_id, "_brute_force_knn_join")
    spark = nodes.sparkSession
    par = spark.sparkContext.defaultParallelism
    # qb*nb ~ 2*parallelism: measured 5.2 s vs 24.2 s (120k q x 5k nodes,
    # 32 cores) for sqrt(2*par) vs sqrt(par) blocks — one wave of
    # par-ish groups straggles on the skewiest block pair, two waves of
    # smaller groups load-balance; shuffle volume grows only as
    # sqrt(par) * (|Q| + |N|)
    default_b = max(2, int((2 * par) ** 0.5))
    qb = int(n_query_blocks) if n_query_blocks else default_b
    nb = int(n_node_blocks) if n_node_blocks else default_b

    qrep = (
        queries.select(
            F.lit(0).alias("_side"),
            F.col(query_id).cast("long").alias("_id"),
            F.col(q_emb).alias("_emb"),
        )
        .withColumn("_qb", F.pmod(F.xxhash64("_id"), F.lit(qb)).cast("int"))
        .withColumn("_nb", F.explode(F.array(*[F.lit(i) for i in range(nb)])))
    )
    nrep = (
        nodes.select(
            F.lit(1).alias("_side"),
            F.col(node_id).cast("long").alias("_id"),
            F.col(n_emb).alias("_emb"),
        )
        .withColumn("_nb", F.pmod(F.xxhash64("_id"), F.lit(nb)).cast("int"))
        .withColumn("_qb", F.explode(F.array(*[F.lit(i) for i in range(qb)])))
    )

    def block_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        side = pdf["_side"].to_numpy()
        q_sel = side == 0
        n_sel = ~q_sel
        if not q_sel.any() or not n_sel.any():
            return pd.DataFrame({query_id: [], node_id: [], "dist": []}).astype(
                {query_id: "int64", node_id: "int64", "dist": "float64"}
            )
        q_ids = pdf["_id"].to_numpy(dtype=np.int64)[q_sel]
        n_ids = pdf["_id"].to_numpy(dtype=np.int64)[n_sel]
        q_mat = vec_matrix(pdf["_emb"][q_sel], q_emb, "_brute_force_knn_join")
        n_mat = vec_matrix(pdf["_emb"][n_sel], n_emb, "_brute_force_knn_join", expect_dim=q_mat.shape[1] if q_mat.size else None)
        dists = 1.0 - q_mat @ n_mat.T  # (nq, nn)
        take = min(k, dists.shape[1])
        part = np.argpartition(dists, take - 1, axis=1)[:, :take]
        rows_q = np.repeat(np.arange(len(q_ids)), take)
        cols = part.reshape(-1)
        return pd.DataFrame(
            {
                query_id: q_ids[rows_q],
                node_id: n_ids[cols],
                "dist": dists[rows_q, cols],
            }
        )

    scored = (
        qrep.unionByName(nrep)
        .groupBy("_qb", "_nb")
        .applyInPandas(block_kernel, f"{query_id} long, {node_id} long, dist double")
    )
    return _rank_and_take(scored, k, query_id, node_id)


def brute_force_knn(
    queries: DataFrame,
    nodes: DataFrame,
    k: int = DEFAULT_CONFIG.top_k,
    query_id: str = "query_id",
    node_id: str = "node_id",
    q_emb: str = "q_embedding",
    n_emb: str = "embedding",
    broadcast_queries: bool = True,  # kept for API compat (pre-strategy)
    strategy: str = "auto",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """(query_id, node_id, dist, rank<=k). Exact at any batch size.

    ``allowed``: optional one-column (node_id) allowlist for FILTERED
    kNN — rows of ``nodes`` outside it never reach the scoring kernel
    (left-semi join, planned broadcast/shuffled by size via AQE). The
    metadata-predicate pattern is
    ``allowed=metadata.filter(pred).select("node_id")`` so the
    predicate is pushed down on the metadata table's own scan.

    strategy='broadcast' (small query batches): the query matrix is
    broadcast as numpy; each Arrow batch of NODES does one BLAS matmul
    against it and emits the per-batch top-k per query (map-side
    partial top-k => the shuffle into the final window carries at most
    parts*k rows per query, not |nodes|). The big side streams with
    zero shuffle. A Catalyst zip_with/aggregate cosine is interpreted
    (~0.27 ms/row measured) — 1000x slower than this path at scale.

    strategy='join' (large query batches): two-sided blocked matmul,
    no driver collect of either side (_brute_force_knn_join). 'auto'
    switches at BROADCAST_MAX_QUERIES.
    """
    import numpy as np
    import pandas as pd

    if allowed is not None:
        nodes = semi_filter_allowed(nodes, allowed, node_id)
    if _resolve_strategy(strategy, queries) == "join":
        return _brute_force_knn_join(
            queries, nodes, k, query_id, node_id, q_emb, n_emb
        )
    q_ids, q_mat = _collect_query_matrix(queries, query_id, q_emb)
    spark = nodes.sparkSession
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], f"{query_id} long, {node_id} long, dist double, rank int"
        )
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    def score(it):
        ids, mat = b_ids.value, b_mat.value
        nq = len(ids)
        for pdf in it:
            if not len(pdf):
                continue
            n_ids = pdf[node_id].to_numpy(dtype=np.int64)
            n_mat = vec_matrix(pdf[n_emb], n_emb, "brute_force_knn", expect_dim=mat.shape[1])
            dists = 1.0 - mat @ n_mat.T  # (nq, batch)
            take = min(k, dists.shape[1])
            # per-batch partial top-k (argpartition then exact sort later)
            part = np.argpartition(dists, take - 1, axis=1)[:, :take]
            rows_q = np.repeat(np.arange(nq), take)
            cols = part.reshape(-1)
            yield pd.DataFrame(
                {
                    query_id: ids[rows_q],
                    node_id: n_ids[cols],
                    "dist": dists[rows_q, cols],
                }
            )

    scored = nodes.select(node_id, n_emb).mapInPandas(
        score, f"{query_id} long, {node_id} long, dist double"
    )
    return _rank_and_take(scored, k, query_id, node_id)


def tile_knn_candidates(
    queries_xy: DataFrame,
    node_tiles: DataFrame,
    resolution: int,
    ring: int = 1,
    query_id: str = "query_id",
    broadcast_probe: bool = True,
) -> DataFrame:
    """Candidate generation: explode the query's neighbor-ring cells at
    ``resolution`` and equi-join the node tile table on cell_id.

    queries_xy needs x, y (reduced coords); node_tiles is the long
    (node_id, resolution, cell_id, is_soft) table — pre-filtered to one
    resolution here, so partition pruning applies when tiles are
    written partitioned by resolution. ``broadcast_probe=False`` drops
    the broadcast hint for huge query batches (AQE then picks a
    shuffle-hash join on cell_id).
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
    probe = F.broadcast(q) if broadcast_probe else q
    # dropDuplicates: soft assignment can emit a node into several of
    # the query's ring cells — each (query, node) pair scores once.
    return (
        probe
        .join(tiles, "cell_id")
        .select(query_id, "node_id")
        .dropDuplicates([query_id, "node_id"])
    )


def _score_candidates_join(
    cand_with_emb: DataFrame,
    queries: DataFrame,
    query_id: str = "query_id",
    q_emb: str = "q_embedding",
) -> DataFrame:
    """Join-based twin of :func:`_score_candidates` for query batches
    past the broadcast bound: candidates equi-join the query-embedding
    table on query_id (shuffle-hash or broadcast, AQE's call), then one
    Arrow kernel computes the row-wise dot per batch. The query vector
    travels with each candidate row — double the Arrow traffic of the
    broadcast lookup, but NO driver-resident state, so 10^6+ query
    batches score exactly like 10 (pytest-asserted parity)."""
    import numpy as np
    import pandas as pd

    require_integral_id(queries, query_id, "_score_candidates_join")
    require_integral_id(cand_with_emb, "node_id", "_score_candidates_join")
    joined = cand_with_emb.select(query_id, "node_id", "embedding").join(
        queries.select(query_id, q_emb), query_id
    )

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            q_mat = vec_matrix(pdf[q_emb], q_emb, "_score_candidates_join")
            n_mat = vec_matrix(pdf["embedding"], "embedding", "_score_candidates_join", expect_dim=q_mat.shape[1])
            dists = 1.0 - np.einsum("ij,ij->i", q_mat, n_mat)
            yield pd.DataFrame(
                {
                    query_id: pdf[query_id].to_numpy(dtype=np.int64),
                    "node_id": pdf["node_id"].to_numpy(dtype=np.int64),
                    "dist": dists,
                }
            )

    return joined.mapInPandas(score, f"{query_id} long, node_id long, dist double")


def _score_candidates(
    cand_with_emb: DataFrame,
    queries: DataFrame,
    query_id: str = "query_id",
    q_emb: str = "q_embedding",
    strategy: str = "broadcast",
) -> DataFrame:
    """(query_id, node_id, embedding) candidates -> exact cosine dist,
    via a broadcast query matrix + per-Arrow-batch vectorized lookup
    matmul (einsum). Only the node embedding travels with the row; the
    query vector is looked up from the broadcast — half the Arrow
    traffic of shipping both vectors, and no interpreted Catalyst
    higher-order functions in the hot path. strategy='join' switches to
    the distributed no-collect twin (_score_candidates_join)."""
    if strategy == "join":
        return _score_candidates_join(cand_with_emb, queries, query_id, q_emb)
    q_ids, q_mat = _collect_query_matrix(queries, query_id, q_emb)
    spark = cand_with_emb.sparkSession
    if len(q_ids) == 0:
        return spark.createDataFrame([], f"{query_id} long, node_id long, dist double")
    index = {int(qid): i for i, qid in enumerate(q_ids)}
    b_index = spark.sparkContext.broadcast(index)
    b_mat = spark.sparkContext.broadcast(q_mat)
    return _score_with_broadcast(cand_with_emb, b_index, b_mat, query_id)


def _score_with_broadcast(
    cand_with_emb: DataFrame,
    b_index,
    b_mat,
    query_id: str = "query_id",
) -> DataFrame:
    """Score candidates against an ALREADY-broadcast query matrix
    (``b_index``: {query_id: row}, ``b_mat``: (n, d) float64). Lets a
    driver loop — tree traversal visits the same queries once per layer
    — collect and broadcast the query side ONCE instead of re-running
    the query-embedding plan per layer (the collect was ~2 s/layer of
    pure fixed overhead at sf0.1)."""
    import numpy as np

    from pyspark.sql import types as T

    in_df = cand_with_emb.select(query_id, "node_id", "embedding")
    out_schema = T.StructType(
        [f for f in in_df.schema.fields if f.name != "embedding"]
        + [T.StructField("dist", T.DoubleType())]
    )

    def score(it):
        idx, mat = b_index.value, b_mat.value
        for pdf in it:
            if not len(pdf):
                continue
            rows = pdf[query_id].map(idx).to_numpy(dtype=np.int64)
            n_mat = vec_matrix(pdf["embedding"], "embedding", "_score_candidates", expect_dim=mat.shape[1])
            dists = 1.0 - np.einsum("ij,ij->i", mat[rows], n_mat)
            out = pdf.drop(columns=["embedding"])
            out["dist"] = dists
            yield out

    return in_df.mapInPandas(score, out_schema)


def _score_candidates_quantized(
    cand_with_q: DataFrame,
    queries: DataFrame,
    query_id: str = "query_id",
    q_emb: str = "q_embedding",
    strategy: str = "broadcast",
) -> DataFrame:
    """Quantized twin of :func:`_score_candidates`: candidates carry
    (q_vec array<tinyint>, q_scale float) instead of the float
    embedding — 4x less Arrow traffic and executor memory on the
    corpus side; the kernel dequantizes per batch (int8 matrix ->
    float64 once per Arrow batch, never per corpus). Same two physical
    strategies: broadcast query matrix below the bound, query-embedding
    equi-join above it (no driver collect)."""
    import numpy as np
    import pandas as pd

    if strategy == "join":
        require_integral_id(queries, query_id, "_score_candidates_quantized")
        require_integral_id(cand_with_q, "node_id", "_score_candidates_quantized")
        joined = cand_with_q.select(query_id, "node_id", "q_vec", "q_scale").join(
            queries.select(query_id, q_emb), query_id
        )

        def score_join(it):
            for pdf in it:
                if not len(pdf):
                    continue
                q_mat = vec_matrix(pdf[q_emb], q_emb, "_score_candidates_quantized(join)")
                n_mat = vec_matrix(pdf["q_vec"], "q_vec", "_score_candidates_quantized(join)", expect_dim=q_mat.shape[1])
                scales = pdf["q_scale"].to_numpy(dtype=np.float64)
                dists = 1.0 - np.einsum("ij,ij->i", q_mat, n_mat) * scales
                yield pd.DataFrame(
                    {
                        query_id: pdf[query_id].to_numpy(dtype=np.int64),
                        "node_id": pdf["node_id"].to_numpy(dtype=np.int64),
                        "dist": dists,
                    }
                )

        return joined.mapInPandas(score_join, f"{query_id} long, node_id long, dist double")

    q_ids, q_mat = _collect_query_matrix(queries, query_id, q_emb)
    spark = cand_with_q.sparkSession
    if len(q_ids) == 0:
        return spark.createDataFrame([], f"{query_id} long, node_id long, dist double")
    index = {int(qid): i for i, qid in enumerate(q_ids)}
    b_index = spark.sparkContext.broadcast(index)
    b_mat = spark.sparkContext.broadcast(q_mat)

    def score(it):
        idx, mat = b_index.value, b_mat.value
        for pdf in it:
            if not len(pdf):
                continue
            rows = pdf[query_id].map(idx).to_numpy(dtype=np.int64)
            n_mat = vec_matrix(pdf["q_vec"], "q_vec", "_score_candidates_quantized(broadcast)", expect_dim=mat.shape[1])
            scales = pdf["q_scale"].to_numpy(dtype=np.float64)
            dists = 1.0 - np.einsum("ij,ij->i", mat[rows], n_mat) * scales
            yield pd.DataFrame(
                {
                    query_id: pdf[query_id].to_numpy(dtype=np.int64),
                    "node_id": pdf["node_id"].to_numpy(dtype=np.int64),
                    "dist": dists,
                }
            )

    return cand_with_q.select(query_id, "node_id", "q_vec", "q_scale").mapInPandas(
        score, f"{query_id} long, node_id long, dist double"
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
    scoring: str = "auto",
) -> DataFrame:
    """Tile-pruned kNN: candidates via cell equi-join, exact re-rank.

    ``scoring`` picks the exact-re-rank physical path: 'broadcast'
    (driver-collected query matrix, small batches), 'join' (fully
    distributed, unbounded batches), 'auto' (switch on query count —
    resolved ONCE here, not per ring round).

    ``queries`` must carry x, y (from tile.reduce_2d on the query
    embedding). If ``max_ring`` > ring, queries with < k candidates are
    retried at wider rings on a SHORT fixed schedule: ring -> 4*ring ->
    max_ring (at most 3 passes; a long geometric ladder multiplies
    whole-job latency for the rare straggler query, so we jump straight
    to the fallback ring instead). Each round's result is
    localCheckpoint'ed: the loop otherwise compounds lineage and
    re-executes prior rounds inside later plans.
    """
    max_ring = max_ring if max_ring is not None else ring
    grid_n = 1 << (resolution + 1)
    max_ring = min(max_ring, grid_n)
    schedule = sorted({min(ring, max_ring), min(ring * 4, max_ring), max_ring})

    # pin the (small) query side once: every round broadcasts it, and
    # without this the query-embedding pipeline re-executes per round
    remaining = queries.localCheckpoint(eager=True) if len(schedule) > 1 else queries
    # one count resolves the scoring strategy AND the loop's early-exit
    # arithmetic (cheap: the side is pinned above)
    n_remaining = remaining.count() if (scoring == "auto" or len(schedule) > 1) else None
    if scoring == "auto":
        scoring = "broadcast" if n_remaining <= BROADCAST_MAX_QUERIES else "join"
    results: DataFrame | None = None
    for round_i, r in enumerate(schedule):
        cand = tile_knn_candidates(
            remaining, node_tiles, resolution, r, query_id,
            broadcast_probe=(scoring == "broadcast"),
        )
        scored = _score_candidates(
            cand.join(nodes.select("node_id", "embedding"), "node_id"),
            remaining,
            query_id,
            q_emb,
            strategy=scoring,
        )
        ranked = _rank_and_take(scored, k, query_id)
        if round_i == len(schedule) - 1:
            results = ranked if results is None else results.unionByName(ranked)
            break
        # top-k output is tiny (<= |remaining| * k): pin it so the next
        # round's plan doesn't recompute this one
        ranked = ranked.localCheckpoint(eager=True)
        counts = ranked.groupBy(query_id).agg(F.count("*").alias("_n"))
        n_done = counts.filter(F.col("_n") >= k).count()
        if n_done == n_remaining:
            # every remaining query already has its k: skip the
            # done/remaining bookkeeping joins and further rounds —
            # the common case when the first ring suffices
            results = ranked if results is None else results.unionByName(ranked)
            break
        done_ids = counts.filter(F.col("_n") >= k).select(query_id).localCheckpoint(eager=True)
        done = ranked.join(F.broadcast(done_ids), query_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(F.broadcast(done_ids), query_id, "left_anti").localCheckpoint(
            eager=True
        )
        n_remaining -= n_done
    return results


_FINE_RING_CAP = 4


def probe_cells(
    queries_xy: DataFrame,
    populated_keys: set[int],
    resolutions: list[int],
    ring: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """Query -> probe cell_keys against an adaptive quadtree, fully
    vectorized in ONE Arrow kernel (a Catalyst-expression formulation
    of the same logic built ~34k expression nodes and ran 25x slower).

    Radius-consistent covering: qres = finest resolution whose
    containing cell is populated (the query's local density level);
    probe radius = ring * cell_width(qres). Per resolution r:
    ring_r = 1 for coarser r, ring at qres, min(ring * 2^(r-qres),
    _FINE_RING_CAP) for finer r (a dense pocket next to the query).
    """
    import numpy as np
    import pandas as pd

    spark = queries_xy.sparkSession
    b_keys = spark.sparkContext.broadcast(populated_keys)
    res_list = sorted(resolutions)

    def kernel(it):
        keys = b_keys.value
        for pdf in it:
            if not len(pdf):
                continue
            qid = pdf[query_id].to_numpy(dtype=np.int64)
            x = pdf["x"].to_numpy(dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            n_q = len(qid)
            # grid indices + morton per resolution
            ix_r, iy_r, key_r = {}, {}, {}
            for r in res_list:
                n = 1 << (r + 1)
                ix = np.clip(((x + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
                iy = np.clip(((y + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
                m = np.zeros(n_q, dtype=np.int64)
                for i in range(r + 1):
                    m += ((ix >> i) & 1) << (2 * i)
                    m += ((iy >> i) & 1) << (2 * i + 1)
                ix_r[r], iy_r[r], key_r[r] = ix, iy, (r << 32) + m
            # qres: finest populated containing cell, else coarsest res
            qres = np.full(n_q, res_list[0], dtype=np.int64)
            undecided = np.ones(n_q, dtype=bool)
            for r in sorted(res_list, reverse=True):
                hit = np.fromiter((int(k) in keys for k in key_r[r]), dtype=bool, count=n_q)
                sel = undecided & hit
                qres[sel] = r
                undecided &= ~sel
            out_q, out_k = [], []
            for r in res_list:
                n = 1 << (r + 1)
                ring_r = np.where(
                    qres > r, 1,
                    np.where(qres == r, ring,
                             np.minimum(ring << np.clip(r - qres, 0, 62), _FINE_RING_CAP)),
                )
                R = int(ring_r.max()) if n_q else 0
                for dx in range(-R, R + 1):
                    for dy in range(-R, R + 1):
                        d = max(abs(dx), abs(dy))
                        nx, ny = ix_r[r] + dx, iy_r[r] + dy
                        mask = (d <= ring_r) & (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                        if not mask.any():
                            continue
                        m = np.zeros(mask.sum(), dtype=np.int64)
                        sx, sy = nx[mask], ny[mask]
                        for i in range(r + 1):
                            m += ((sx >> i) & 1) << (2 * i)
                            m += ((sy >> i) & 1) << (2 * i + 1)
                        out_q.append(qid[mask])
                        out_k.append((r << 32) + m)
            if out_q:
                allq = np.concatenate(out_q)
                allk = np.concatenate(out_k)
                # only emit probes that hit populated cells: shrinks the
                # join probe side for free (we hold the key set anyway)
                hit = np.fromiter((int(k) in keys for k in allk), dtype=bool, count=len(allk))
                yield pd.DataFrame({query_id: allq[hit], "cell_key": allk[hit]})
            else:
                yield pd.DataFrame({query_id: [], "cell_key": []})

    return queries_xy.select(query_id, "x", "y").mapInPandas(
        kernel, f"{query_id} long, cell_key long"
    )


def probe_cells_join(
    queries_xy: DataFrame,
    populated_cells: DataFrame,
    resolutions: list[int],
    ring: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """Join-based twin of :func:`probe_cells` — NO driver-resident key
    set, so it scales past the broadcast bound (at 10^12 nodes /
    occupancy 256 the populated-cell count is ~10^9: collecting it
    would break the driver; scanning it twice with a broadcast probe
    side does not).

    Two passes against the (distinct) populated-cells table:
    1. qres: each query's containing-cell ladder (one row per
       resolution, generated JVM-side) is broadcast against the cell
       table; the finest resolution that hits is the query's local
       density level (missing => coarsest).
    2. probes: the same ring geometry as probe_cells, generated by an
       Arrow kernel from (x, y, qres) with NO membership checks, then
       intersected with the cell table via a second broadcast join.

    Identical output to probe_cells (pytest-asserted).
    """
    import numpy as np
    import pandas as pd

    res_list = sorted(resolutions)
    cells = populated_cells.select("cell_key")
    ladder = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                cell_key_col(F.col("x"), F.col("y"), r).alias("cell_key"),
            )
            for r in res_list
        ]
    )
    qladder = queries_xy.select(query_id, F.explode(ladder).alias("_c")).select(
        query_id, F.col("_c.r").alias("r"), F.col("_c.cell_key").alias("cell_key")
    )
    # populated ∩ ladder, probe side broadcast: one scan of the cell table
    hits = cells.join(F.broadcast(qladder), "cell_key").select(query_id, "r")
    qres = hits.groupBy(query_id).agg(F.max("r").alias("qres"))
    q = queries_xy.select(query_id, "x", "y").join(qres, query_id, "left").fillna(
        {"qres": res_list[0]}
    )

    def kernel(it):
        for pdf in it:
            if not len(pdf):
                continue
            qid = pdf[query_id].to_numpy(dtype=np.int64)
            x = pdf["x"].to_numpy(dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            qr = pdf["qres"].to_numpy(dtype=np.int64)
            n_q = len(qid)
            out_q, out_k = [], []
            for r in res_list:
                n = 1 << (r + 1)
                ix = np.clip(((x + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
                iy = np.clip(((y + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
                ring_r = np.where(
                    qr > r, 1,
                    np.where(qr == r, ring,
                             np.minimum(ring << np.clip(r - qr, 0, 62), _FINE_RING_CAP)),
                )
                R = int(ring_r.max()) if n_q else 0
                for dx in range(-R, R + 1):
                    for dy in range(-R, R + 1):
                        d = max(abs(dx), abs(dy))
                        nx, ny = ix + dx, iy + dy
                        mask = (d <= ring_r) & (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                        if not mask.any():
                            continue
                        m = np.zeros(int(mask.sum()), dtype=np.int64)
                        sx, sy = nx[mask], ny[mask]
                        for i in range(r + 1):
                            m += ((sx >> i) & 1) << (2 * i)
                            m += ((sy >> i) & 1) << (2 * i + 1)
                        out_q.append(qid[mask])
                        out_k.append((r << 32) + m)
            if out_q:
                yield pd.DataFrame(
                    {query_id: np.concatenate(out_q), "cell_key": np.concatenate(out_k)}
                )
            else:
                yield pd.DataFrame({query_id: [], "cell_key": []})

    probes = q.mapInPandas(kernel, f"{query_id} long, cell_key long")
    # second scan: keep only probes that hit populated cells
    return cells.join(F.broadcast(probes), "cell_key").select(query_id, "cell_key")


def adaptive_candidates(
    queries_xy: DataFrame,
    atiles: DataFrame,
    populated: set[int] | DataFrame,
    resolutions: list[int],
    ring: int = 1,
    query_id: str = "query_id",
    broadcast_probe: bool = True,
) -> DataFrame:
    """Candidate generation: vectorized probe-cell kernel + one long
    equi-join on the Morton cell_key. Each node lives in exactly one
    cell, so no dedup shuffle is needed. ``populated`` is either a
    broadcastable key set (fast path, bounded cell counts) or the
    distinct-cells DataFrame (join path, unbounded);
    ``broadcast_probe=False`` lets AQE plan a shuffle-hash join for
    huge query batches."""
    if isinstance(populated, DataFrame):
        qcells = probe_cells_join(queries_xy, populated, resolutions, ring, query_id)
    else:
        qcells = probe_cells(queries_xy, populated, resolutions, ring, query_id)
    probe = F.broadcast(qcells) if broadcast_probe else qcells
    return (
        probe
        .join(atiles.select("node_id", "cell_key"), ["cell_key"])
        .select(query_id, "node_id")
    )


def tile_knn_adaptive(
    queries: DataFrame,
    nodes: DataFrame,
    atiles: DataFrame,
    k: int = DEFAULT_CONFIG.top_k,
    ring: int = 1,
    max_ring: int = 8,
    query_id: str = "query_id",
    q_emb: str = "q_embedding",
    membership: str = "auto",
    resolutions: list[int] | None = None,
    scoring: str = "auto",
) -> DataFrame:
    """kNN join against adaptive quadtree tiles (the scale path for
    skewed corpora). Same ring-expansion contract as tile_knn.

    ``membership`` picks how probe cells are checked against populated
    cells: 'broadcast' collects the distinct cell keys into a driver
    set (fast, bounded — fine while max resolution <= 12, ~10^7 cells);
    'join' keeps them as a DataFrame and intersects via two broadcast
    joins (unbounded, two extra scans of the distinct-cells table);
    'auto' switches on the finest resolution present. ``scoring`` is
    the query-side twin of the same bound: 'broadcast' collects the
    query matrix to the driver, 'join' scores via a distributed
    equi-join (no collect), 'auto' switches on query count."""
    # the tile table is consumed at least twice per call (the populated
    # cell/resolution collect + one candidate join per ring round): if
    # it is a lazy plan with real compute behind it (e.g. the adaptive
    # assignment kernel straight off adaptive_tile_assignments), pin it
    # once instead of re-running that compute per pass. Already-
    # materialized inputs (a checkpoint, a parquet/bucketed store scan)
    # are left alone — no duplicate storage.
    from raptor_rag_spark.functions.planutil import plan_is_bare_scan

    if not plan_is_bare_scan(atiles):
        atiles = atiles.localCheckpoint(eager=False)
    need_resolutions = resolutions is None
    if membership == "auto" and need_resolutions:
        # the morton cell_key embeds its resolution (key >> 32), so ONE
        # distinct-keys collect yields BOTH the populated set and the
        # resolution ladder — previously two full passes over atiles
        # (an expensive double-run when the tile table is a lazy plan)
        keys = [
            int(r["cell_key"])
            for r in atiles.select("cell_key").distinct().collect()
        ]
        resolutions = sorted({k >> 32 for k in keys})
        membership = (
            "broadcast" if max(resolutions) <= MAX_BROADCAST_RESOLUTION else "join"
        )
        populated: set[int] | DataFrame = (
            set(keys)
            if membership == "broadcast"
            else atiles.select("cell_key").distinct().localCheckpoint(eager=True)
        )
    else:
        if need_resolutions:
            resolutions = sorted(
                r["resolution"] for r in atiles.select("resolution").distinct().collect()
            )
        if membership == "auto":
            membership = (
                "broadcast" if max(resolutions) <= MAX_BROADCAST_RESOLUTION else "join"
            )
        if membership == "join":
            populated = (
                atiles.select("cell_key").distinct().localCheckpoint(eager=True)
            )
        else:
            populated = {
                int(r["cell_key"])
                for r in atiles.select("cell_key").distinct().collect()
            }
    schedule = sorted({min(ring, max_ring), min(ring * 4, max_ring), max_ring})
    remaining = queries.localCheckpoint(eager=True) if len(schedule) > 1 else queries
    n_remaining = remaining.count() if (scoring == "auto" or len(schedule) > 1) else None
    if scoring == "auto":
        scoring = "broadcast" if n_remaining <= BROADCAST_MAX_QUERIES else "join"
    results: DataFrame | None = None
    for round_i, r in enumerate(schedule):
        cand = adaptive_candidates(
            remaining, atiles, populated, resolutions, r, query_id,
            broadcast_probe=(scoring == "broadcast"),
        )
        scored = _score_candidates(
            cand.join(nodes.select("node_id", "embedding"), "node_id"),
            remaining,
            query_id,
            q_emb,
            strategy=scoring,
        )
        ranked = _rank_and_take(scored, k, query_id)
        if round_i == len(schedule) - 1:
            results = ranked if results is None else results.unionByName(ranked)
            break
        ranked = ranked.localCheckpoint(eager=True)
        counts = ranked.groupBy(query_id).agg(F.count("*").alias("_n"))
        n_done = counts.filter(F.col("_n") >= k).count()
        if n_done == n_remaining:
            # every remaining query already has its k (the common case
            # when the first ring suffices): skip the bookkeeping joins
            results = ranked if results is None else results.unionByName(ranked)
            break
        done_ids = counts.filter(F.col("_n") >= k).select(query_id).localCheckpoint(eager=True)
        done = ranked.join(F.broadcast(done_ids), query_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(F.broadcast(done_ids), query_id, "left_anti").localCheckpoint(
            eager=True
        )
        n_remaining -= n_done
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
