"""Distributed connected components: alternating large-star / small-star.

Public algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC'14) — the same
shape GraphFrames ships as its default. Converges in O(log n) rounds
regardless of component diameter; hash-min label propagation needs
O(diameter) rounds, which a chain of pairwise near-dup pages makes
unbounded at 100 TB.

Engine role: backs the dedup-clustering stage of the training-data
pipeline — near-dup PAIR generators (exact / minhash / simhash /
embedding) emit edges, this collapses them into clusters so one
canonical document per cluster survives. The reference
(serdarildercaglar/raptor-rag) has no graph operator; this is an
engine-added op per the pipeline brief.

Every round is two self-contained DataFrame rounds (groupBy min +
equi-join), each followed by a localCheckpoint so lineage stays flat —
without it the plan doubles per iteration and Catalyst analysis time
dominates past ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Attach every neighbor larger than u to u's minimum neighborhood
    node (including u itself). Strictly decreases large-star potential;
    never disconnects a component."""
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least(F.col("_mn"), F.col("src")).alias("_m"))
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low, then attach all of u's smaller neighbors
    (and u) to the minimum of u's closed neighborhood."""
    o = e.filter(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = o.groupBy("src").agg(F.min("dst").alias("_m"))
    out = (
        o.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .union(m.select("src", F.col("_m").alias("dst")))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, cluster_id) with cluster_id = the component's minimum node id.

    ``edges`` is undirected (direction ignored); null endpoints and
    self-loops are dropped. If ``vertices`` is given (single column
    ``id_col``), isolated vertices appear with cluster_id = their own id.

    Convergence is detected by an order-insensitive edge-set signature
    (count + sum of xxhash64(src,dst)); a 64-bit sum collision on two
    consecutive DIFFERENT edge sets is ~2^-64 per round and only delays
    convergence detection by a round if it ever happened.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # decimal(38,0) sum: a long sum of xxhash64 overflows (ANSI
        # mode throws) after a few absolute-value-large hashes
        n, h = e.agg(
            F.count("*"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
            ),
        ).first()
        sig = (n, h)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:  # pragma: no cover - max_iter is far above log2(any real n)
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")

    # fixed point = star graphs: every edge is (member, component_min)
    labels = e.select(F.col("src").alias(id_col), F.col("dst").alias("cluster_id")).union(
        e.select(F.col("dst").alias(id_col), F.col("dst").alias("cluster_id"))
    ).distinct()
    if vertices is not None:
        v = vertices.select(F.col(vertices.columns[0]).alias(id_col)).distinct()
        labels = v.join(labels, id_col, "left").select(
            id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
        )
    return labels
