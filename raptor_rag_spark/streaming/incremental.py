"""Incremental / streaming ingestion of new pages, and affected-level
tree maintenance (SURVEY §2.10: "append new pages -> re-run affected
levels from checkpoints").

The affected-level update exploits the quadkey prefix property: a
node's adaptive cell (after cap-splitting) is always a DESCENDANT of
its cell at the level's start resolution, so the start-res cell is a
closed recomputation unit — the parents of a start-res cell depend
only on the child nodes inside it. An append therefore recomputes, per
level, ONLY the start-res cells that contain new/changed nodes; every
other parent row is carried over untouched (pytest: touched cells <
total cells AND result == from-scratch build)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from raptor_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from raptor_rag_spark.operators.chunk import chunk_documents
from raptor_rag_spark.operators.embed import embed_texts
from raptor_rag_spark.operators.extract import extract_pages
from raptor_rag_spark.operators.tile import reduce_2d


def incremental_level0(
    pages: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    dim: int | None = None,
) -> DataFrame:
    """New pages batch -> level-0 node rows (extract -> chunk -> embed
    -> reduce). Pure function of the batch; append to the level-0
    checkpoint and re-aggregate touched cells upstream."""
    dim = dim or cfg.embedding_dim
    txt = extract_pages(pages)
    # stable doc id: page_id when present, else a 64-bit url hash
    from pyspark.sql import functions as F

    if "page_id" in pages.columns:
        txt = txt.join(pages.select("url", "page_id"), "url")
        docs = txt.withColumn("doc_id", F.col("page_id"))
        id_scheme = "arith"
    else:
        # full-range 64-bit url hash: the arith chunk_id scheme would
        # overflow (ANSI crash) — use the hashed scheme
        docs = txt.withColumn("doc_id", F.xxhash64("url"))
        id_scheme = "hash"
    chunks = chunk_documents(docs, max_tokens=cfg.max_tokens, id_scheme=id_scheme)
    nodes = (
        embed_texts(chunks, dim=dim)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
    )
    return reduce_2d(nodes, dim=dim, seed=cfg.seed)


def _epoch_sink(out_dir: str, cfg: EngineConfig, namespace: str = "default"):
    """foreachBatch sink for stream_pages — exactly-once by epoch id.

    foreachBatch is AT-LEAST-once under retries (a crash between the
    data write and the streaming checkpoint commit replays the whole
    micro-batch), so a plain mode('append') would duplicate level-0
    rows. The canonical Spark fix: make the sink idempotent on
    ``epoch_id`` — each micro-batch writes its own ``_epoch`` partition
    via dynamic partition overwrite, so a replay REPLACES its partition
    instead of appending next to it. Exposed as a function so tests can
    replay an epoch directly.

    ``namespace`` scopes the partition key: epoch ids are only unique
    PER STREAMING CHECKPOINT, so two streams (different checkpoint
    dirs) feeding one out_dir would otherwise overwrite each other's
    epoch-N partitions — stream_pages passes a checkpoint-derived
    namespace, stable across restarts of the same stream but distinct
    per checkpoint. Caveat (inherent to epoch-keyed idempotency):
    DELETING a checkpoint dir and re-streaming under the same path
    restarts epochs at 0 within the same namespace and replaces that
    incarnation's partitions — Spark's own docs treat a lost streaming
    checkpoint as a lost stream identity; use a fresh checkpoint dir
    (hence a fresh namespace) to re-ingest alongside."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        from pyspark.sql import functions as F

        sp = batch_df.sparkSession
        out = incremental_level0(batch_df, cfg).withColumn(
            "_epoch", F.lit(f"{namespace}-{int(epoch_id)}")
        )
        prev = sp.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy("_epoch").parquet(out_dir)
        finally:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        sp.catalog.refreshByPath(out_dir)

    return sink


def read_stream_level0(spark: SparkSession, out_dir: str) -> DataFrame:
    """Level-0 rows produced by stream_pages, without the ``_epoch``
    lineage partition column (kept on disk for replay idempotency and
    micro-batch provenance)."""
    return spark.read.parquet(out_dir).drop("_epoch")


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """Structured Streaming wrapper: watch a directory of page parquet
    files, run the same batch logic per micro-batch via foreachBatch,
    write level-0 rows to out_dir exactly once per epoch (see
    _epoch_sink). Returns the StreamingQuery; read the output with
    read_stream_level0."""
    from raptor_rag_spark.datagen import PAGES_SCHEMA

    import hashlib
    import os

    stream = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    )

    # checkpoint-scoped namespace: stable across restarts of this
    # stream (same checkpoint_dir), distinct per checkpoint — two
    # streams feeding one out_dir cannot clobber each other's epochs
    ns = hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]
    return (
        stream.writeStream.foreachBatch(_epoch_sink(out_dir, cfg, namespace=ns))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def append_level(
    df: DataFrame,
    base: str,
    layer: int,
    lineage: dict,
    append_id: str | None = None,
    rows_hint: int | None = None,
    assume_pinned: bool = False,
) -> dict:
    """Append rows to an existing level checkpoint WITHOUT rewriting the
    level (the 100 TB level-0 ingest path: old data files are immutable,
    the append adds files, the manifest records the delta). Returns the
    updated manifest.

    Crash-safe + idempotent under retry (the same staging discipline
    catalog snapshots got in round 3): the delta is written to an
    ``_inflight`` subdir (invisible to parquet readers), its part files
    are then renamed into the level under names carrying ``append_id``,
    and the manifest commit is LAST. A retry with the same ``append_id``
    (a) no-ops if the manifest already records it (crash after commit),
    (b) first deletes any ``part-inflight-<id>-*`` leftovers (crash
    mid-rename or pre-commit) — so the appended rows land exactly once
    no matter where a previous attempt died. Callers that may retry
    MUST pass a stable content-derived ``append_id``
    (incremental_update derives one from the delta's node_ids AND
    content columns via functions.staging.content_append_id)."""
    import json as _json
    import time as _time
    import uuid as _uuid

    from raptor_rag_spark.functions.staging import stage_parquet_append
    from raptor_rag_spark.operators.tree import (
        _level_path,
        _manifest_path,
        read_manifest,
    )

    t0 = _time.time()
    manifest = read_manifest(base, layer)
    if append_id is not None and any(
        a.get("id") == append_id for a in manifest.get("appends", [])
    ):
        return manifest  # already applied — retry after a post-commit crash
    aid = append_id or _uuid.uuid4().hex
    # count + write, one execution. ``assume_pinned`` callers already
    # hold a checkpointed delta; ``rows_hint`` callers already counted
    # it (content_append_stats) — both skip a redundant job.
    pinned = df if assume_pinned else df.localCheckpoint(eager=True)
    delta_rows = rows_hint if rows_hint is not None else pinned.count()
    stage_parquet_append(pinned, _level_path(base, layer), aid, part_prefix="inflight")
    manifest["rows"] = int(manifest["rows"]) + int(delta_rows)
    manifest.setdefault("appends", []).append(
        {
            "id": aid,
            "rows": int(delta_rows),
            "lineage": lineage,
            "wall_sec": round(_time.time() - t0, 3),
        }
    )
    with open(_manifest_path(base, layer), "w") as fh:
        _json.dump(manifest, fh, indent=1)
    return manifest


def _propagate_affected(
    spark: SparkSession,
    checkpoint_base: str,
    cfg: EngineConfig,
    start_resolution: int,
    top: int,
    dim: int,
    delta: DataFrame | None = None,
    affected_l1: list[str] | None = None,
) -> dict:
    """Shared affected-cells propagation for levels 1..top (the loop
    both incremental_update and the append planner run): per level,
    recompute the start-res cells containing changed children, carry
    every other parent over untouched, and feed the changed parents
    into the next level. Layer 1's affected set comes from ``delta``
    (today's changed level-0 rows) unless ``affected_l1`` overrides it
    — the planner flushes DUE cells covering several days' pending
    leaves, not just today's batch. Returns aggregate stats
    {recomputed_parents, replaced_parents, affected_cells_l1}.

    Driver-round-trip budget (round 6): the affected-cell set is a
    DRIVER LIST (it always was — the manifest delta collected it), so
    membership tests compile to map-side ``isin`` filters instead of
    broadcast-join builds; the recomputed level is written ONCE with
    dynamic partition overwrite and read BACK (partition-pruned to the
    affected dirs) where its rows are needed again, instead of an
    eager localCheckpoint followed by a write; and per-partition counts
    come from the written files' parquet footers (no counting job).
    4 Spark jobs per level instead of ~8, identical rows (the
    append==rebuild pytest covers this path)."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.tile import tile
    from raptor_rag_spark.operators.tree import (
        _level_path,
        build_level,
        read_level,
        read_manifest,
        read_level_pruned,
        refresh_manifest,
        storage_partition_counts,
        update_manifest_delta,
        write_level,
    )

    stats = {"recomputed_parents": 0, "replaced_parents": 0, "affected_cells_l1": 0}
    for layer in range(1, top + 1):
        res = max(start_resolution - (layer - 1), 0)
        if layer == 1 and affected_l1 is not None:
            affected = sorted(affected_l1)
        else:
            # bounded by the cell universe at this resolution — the same
            # list the manifest delta has always collected
            affected = sorted(
                r["cell_id"]
                for r in tile(delta, res).select("cell_id").distinct().collect()
            )
        if layer == 1:
            stats["affected_cells_l1"] = len(affected)
        # child rows in affected cells — selected by the CHILD's OWN
        # x,y at this resolution (tile), which is what the next level
        # groups on. NOTE: this cannot be partition-pruned on the child
        # level's cell_pfx: a child's partition key derives from its
        # cell_id (its own children's region), while its x,y come from
        # its summary embedding — the two can disagree, and pruning on
        # cell_pfx drops legitimate members (caught by the
        # incremental==scratch pytest when tried).
        child = read_level(spark, checkpoint_base, layer - 1)
        child_in = (
            tile(child, res)
            .drop("ix", "iy", "resolution")
            .filter(F.col("cell_id").isin(affected))
        )
        recomputed = build_level(
            child_in, layer, res, cfg, with_embedding=True, embed_dim=dim
        ).select(
            "node_id", "layer", "cell_id", "text", "children", "n_tokens",
            "embedding", "x", "y",
        )
        old_manifest = read_manifest(checkpoint_base, layer)
        pfx_len = old_manifest.get("partition_prefix_len")
        prefix = F.substring("cell_id", 1, res + 1)
        # pinned BEFORE the overwrite below: this plan reads the very
        # files being replaced. Partition-pruned on the affected dirs
        # when the layout allows (the affected cells ARE this level's
        # partitions), else scan + row filter.
        if old_manifest.get("partitions_by") == "cell_pfx" and pfx_len == res + 1:
            replaced_src = read_level_pruned(
                spark, checkpoint_base, layer, affected
            )
        else:
            replaced_src = read_level(spark, checkpoint_base, layer).filter(
                prefix.isin(affected)
            )
        replaced = replaced_src.select("node_id", "x", "y").localCheckpoint(
            eager=True
        )
        if old_manifest.get("partitions_by") == "cell_pfx" and pfx_len == res + 1:
            # manifest partition counts are exact (footer-derived and
            # append-free at levels >= 1): the replaced-parents count is
            # plain arithmetic, no counting job
            parts = old_manifest.get("partitions", {})
            n_replaced = int(sum(int(parts.get(c, 0)) for c in affected))
        else:
            n_replaced = int(replaced.count())
        lineage = {
            "input": "incremental",
            "resolution": res,
            "affected_cells": len(affected),
        }
        if pfx_len == res + 1:
            # prefix-partitioned level: affected start-res cells ARE
            # partitions — dynamic partition overwrite rewrites ONLY
            # those directories; kept rows are never read or written
            # (the 100 TB maintenance path).
            lineage["write"] = "dynamic-partition-overwrite"
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    recomputed.withColumn(
                        "cell_pfx", F.substring("cell_id", 1, res + 1)
                    )
                    .write.mode("overwrite")
                    .partitionBy("cell_pfx")
                    .parquet(_level_path(checkpoint_base, layer))
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            # O(affected) footer walk of the just-written dirs — the
            # recomputed counts without a counting job
            all_counts = storage_partition_counts(
                _level_path(checkpoint_base, layer), True
            )
            rec_counts = {c: all_counts.get(c, 0) for c in affected}
            n_recomputed = int(sum(rec_counts.values()))
            lineage["recomputed_parents"] = n_recomputed
            lineage["replaced_parents"] = n_replaced
            if old_manifest.get("partitions_by") == "cell_pfx":
                # O(affected) manifest update — no level rescan
                update_manifest_delta(
                    checkpoint_base, layer, affected,
                    {k: v for k, v in rec_counts.items() if v}, lineage,
                )
            else:  # legacy manifest (partition-id keyed): refresh once
                refresh_manifest(spark, checkpoint_base, layer, lineage, pfx_len)
            # the written partitions ARE the recomputed rows: read them
            # back partition-pruned for the next level's delta instead
            # of holding a checkpoint
            recomputed_rb = read_level_pruned(
                spark, checkpoint_base, layer, affected
            ).select("node_id", "x", "y")
        else:
            recomputed = recomputed.localCheckpoint(eager=True)
            n_recomputed = int(recomputed.count())
            lineage["recomputed_parents"] = n_recomputed
            lineage["replaced_parents"] = n_replaced
            # coalesce: a NULL prefix must stay kept (the old anti-join
            # semantics — NULL never matched)
            kept = old.filter(F.coalesce(~prefix.isin(affected), F.lit(True)))
            merged = kept.unionByName(recomputed).localCheckpoint(eager=True)
            write_level(
                merged, checkpoint_base, layer, lineage,
                partition_prefix_len=pfx_len,
            )
            recomputed_rb = recomputed.select("node_id", "x", "y")
        stats["recomputed_parents"] += n_recomputed
        stats["replaced_parents"] += n_replaced
        # both the new and the vanished/updated parents perturb level+1
        delta = recomputed_rb.unionByName(replaced)
    return stats


def incremental_update(
    spark: SparkSession,
    checkpoint_base: str,
    new_leaves: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    start_resolution: int = 4,
    max_layers: int = 8,
    embed_dim: int | None = None,
) -> DataFrame:
    """Append ``new_leaves`` (node_id, text, n_tokens, embedding, x, y —
    e.g. incremental_level0 output; node_ids must be fresh) to a
    checkpointed tree and re-run ONLY the affected cells of each level.

    Per level L (start resolution res_L = start_resolution - (L-1)):
    1. affected = distinct res_L cells containing any changed child
       node (new leaves at level 0; recomputed OR replaced parents at
       higher levels — a vanished parent changes the next level too);
    2. recompute build_level over ALL child nodes in affected cells
       (closed under cap-splitting by the prefix property);
    3. carry over every parent whose cell_id prefix is unaffected;
    4. the changed-parent set becomes the next level's delta.

    Level 0 is an APPEND (immutable data files + manifest delta);
    levels >= 1 rewrite the level file with kept ∪ recomputed rows —
    the summarize/embed work (the expensive part) runs only on affected
    cells; at production scale the level files would be partitioned by
    cell prefix so the rewrite too touches only affected partitions
    (levels above 0 are already compression-ratio smaller than leaves).
    Finishes with a resumed build_tree to extend the top if the append
    pushed the top level back over min_level_nodes; returns the
    collapsed node table. Result equals a from-scratch build over the
    merged leaves (pytest-asserted).

    On a tree that has ever taken a deferred append (a planner ledger
    exists — :func:`has_pending_ledger`), the call routes through
    :func:`incremental_update_planned` with ``force_flush`` so the
    ledger is settled rather than bypassed; exactness is preserved
    (stronger: the whole tree equals a from-scratch build).
    """
    from raptor_rag_spark.operators.tree import (
        build_tree,
        last_complete_level,
        read_level,
    )

    dim = embed_dim or cfg.embedding_dim
    top = last_complete_level(checkpoint_base)
    if top < 0:
        raise ValueError(f"no complete levels under {checkpoint_base}; build first")

    if has_pending_ledger(checkpoint_base):
        # a deferred-append ledger exists for this tree: a plain eager
        # update would bypass it, leaving already-recomputed cells
        # counted as pending (redundant future flushes) and the size
        # counters blind to this batch (flush thresholds drift). Route
        # through the planner with force_flush — same exactness
        # guarantee as eager (stronger: the WHOLE tree equals a
        # from-scratch build, not just this batch's cells) with the
        # ledger settled and sizes kept. Enforced here, not at call
        # sites, so every caller keeps the invariant.
        return incremental_update_planned(
            spark, checkpoint_base, new_leaves, cfg,
            start_resolution=start_resolution, max_layers=max_layers,
            embed_dim=dim, force_flush=True,
        )

    lvl0_delta, _aid = _stage_level0_append(new_leaves, checkpoint_base)

    # changed rows at the current child level: (node_id, x, y) —
    # lvl0_delta is already checkpointed by the staging
    delta = lvl0_delta.select("node_id", "x", "y")
    _propagate_affected(
        spark, checkpoint_base, cfg, start_resolution, top, dim, delta=delta
    )
    # extend the top if the append pushed it back over min_level_nodes
    return build_tree(
        spark,
        read_level(spark, checkpoint_base, 0),
        checkpoint_base,
        cfg,
        start_resolution=start_resolution,
        max_layers=max_layers,
        embed_dim=dim,
        resume=True,
    )


def _stage_level0_append(new_leaves: DataFrame, checkpoint_base: str):
    """Shape ``new_leaves`` into level-0 rows and append them exactly
    once. Returns (lvl0_delta, append_id).

    The append id is content-derived: a retried update (crash anywhere
    downstream) re-presents the same delta and must not duplicate
    level-0 rows — append_level dedups on this id. The id covers
    text/tokens/embedding too, so a repair batch with the SAME node_ids
    but different content is a new append, not a silent no-op.

    The delta is checkpointed eagerly BEFORE anything reads it: the
    append id, the parquet write, the affected-cell delta, and the
    planner's ledger counts are all consumers, and re-executing the
    caller's plan per consumer would (a) run the expensive
    chunk→embed→reduce pipeline up to 3×, and (b) with a
    NONDETERMINISTIC embed_fn (a live service) let each consumer see
    DIFFERENT x,y — ledger counts attributed to cells other than the
    ones the written rows actually land in, breaking force_flush
    exactness. One materialization, every consumer reads it."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.functions.staging import content_append_stats

    lvl0_delta = (
        new_leaves.withColumn("layer", F.lit(0))
        .withColumn("cell_id", F.lit(None).cast("string"))
        .withColumn("children", F.array().cast("array<long>"))
        .select(
            "node_id", "layer", "cell_id", "text", "children", "n_tokens",
            "embedding", "x", "y",
        )
        .localCheckpoint(eager=True)
    )
    append_id, n_rows = content_append_stats(
        lvl0_delta, ["node_id", "text", "n_tokens", "embedding"]
    )
    append_level(
        lvl0_delta, checkpoint_base, 0, {"input": "incremental append"},
        append_id=append_id, rows_hint=n_rows, assume_pinned=True,
    )
    return lvl0_delta, append_id


_PENDING_LEDGER = "pending_appends.json"
_PENDING_APPLIED_KEEP = 256  # retry horizon for append-id dedup
_PENDING_FLUSHES_KEEP = 64  # recent-history window; totals keep the rest


def _pending_path(base: str) -> str:
    import os

    return os.path.join(base, _PENDING_LEDGER)


def has_pending_ledger(base: str) -> bool:
    """True once the append planner has ever written a ledger for this
    tree. While true, eager updates must settle the ledger (they route
    through the planner with force_flush) or pending counts drift.

    The ledger (like every level manifest here) is LOCAL-filesystem
    I/O: on a remote base (hdfs://, s3a://) os.path.exists would
    silently return False and this invariant would degrade to the old
    bypass behavior — fail loudly instead; a remote deployment fronts
    these json sidecars with a shared metadata store."""
    import os

    if "://" in base:
        raise ValueError(
            f"tree checkpoint base {base!r} is not a local path — the "
            "append-planner ledger and level manifests are local-FS "
            "sidecars (see has_pending_ledger docstring)"
        )
    return os.path.exists(_pending_path(base))


def _read_collapsed(spark: SparkSession, base: str, top: int) -> DataFrame:
    """The collapsed node table: union of every checkpointed level."""
    from raptor_rag_spark.operators.tree import read_level

    out = read_level(spark, base, 0)
    for layer in range(1, top + 1):
        out = out.unionByName(read_level(spark, base, layer))
    return out


def read_pending(base: str) -> dict:
    """The append planner's ledger: per-base-cell pending-leaf counts
    (leaves already in level 0 whose parents have NOT been recomputed),
    the append ids already counted (retry dedup), and the flush
    history. Lives next to the level manifests."""
    import json
    import os

    path = _pending_path(base)
    if not os.path.exists(path):
        return {
            "resolution": None,
            "cells": {},
            "sizes": {},
            "applied": [],
            "flushes": [],
        }
    with open(path) as fh:
        led = json.load(fh)
    led.setdefault("sizes", {})
    return led


def incremental_update_planned(
    spark: SparkSession,
    checkpoint_base: str,
    new_leaves: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    start_resolution: int = 4,
    max_layers: int = 8,
    embed_dim: int | None = None,
    min_pending_per_cell: int = 4,
    min_pending_frac: float = 0.1,
    force_flush: bool = False,
) -> DataFrame:
    """Append planner for SCATTERED crawl batches — the amortized form
    of :func:`incremental_update`.

    A uniform daily batch (the common case: a day of crawl touches
    ~every base cell with a few leaves each) makes eager affected-cell
    maintenance degenerate to ~a full parent rebuild per day (measured
    recompute fraction 0.62 for a uniform 1% append vs 0.079
    clustered). The planner decouples LANDING leaves from RECOMPUTING
    parents:

    1. the batch appends to level 0 exactly once (same staging as
       incremental_update — new leaves are immediately part of the
       corpus and of collapsed retrieval over level 0);
    2. per layer-1 base cell, a pending-leaf counter accrues in a
       ledger (``pending_appends.json``, atomic write, append-id
       dedup so a retried batch never double-counts);
    3. a cell recomputes only when its RECOMPUTE DEBT is worth paying:
       pending >= max(min_pending_per_cell,
       min_pending_frac * the cell's current leaf count). The relative
       test is the load-bearing one — a cell's recompute cost is
       proportional to its size, so flushing at a fixed pending SHARE
       makes the amortized cost per ingested leaf a constant
       (~eager_frac * min_pending_frac per batch at a uniform 1%/day
       drip, vs 0.62 eager) regardless of how dense the corpus is;
       the absolute floor only stops tiny cells from churning. ONE
       recompute absorbs all days' leaves since the cell last flushed.
       Cell sizes live in the ledger (seeded from a one-time level-0
       per-cell count on the first planned call, incremented per
       append — no recurring corpus scan).

    Trade-off (explicit): between flushes, a pending cell's PARENT
    summaries don't yet reflect its newest leaves — the leaves are
    queryable (level 0 / collapsed mode), the upper tree is bounded-
    stale (< min_pending_per_cell leaves per cell). ``force_flush``
    restores exact equality with a from-scratch build over the merged
    leaves (pytest-asserted).

    Crash-safety ordering: level-0 append commits first (content-id
    exact-once), ledger count-merge second, flush level writes third,
    ledger clear LAST — a crash anywhere re-runs idempotently (a
    re-flush of already-flushed cells recomputes the same rows from
    the same level-0 state).

    Returns the collapsed node table (all levels)."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.maintenance import write_meta_atomic
    from raptor_rag_spark.operators.tile import tile
    from raptor_rag_spark.operators.tree import (
        build_tree,
        last_complete_level,
        read_level,
    )

    if min_pending_per_cell < 1:
        raise ValueError(f"min_pending_per_cell must be >= 1, got {min_pending_per_cell}")
    if not 0.0 <= min_pending_frac <= 1.0:
        raise ValueError(f"min_pending_frac must be in [0, 1], got {min_pending_frac}")
    dim = embed_dim or cfg.embedding_dim
    top = last_complete_level(checkpoint_base)
    if top < 0:
        raise ValueError(f"no complete levels under {checkpoint_base}; build first")

    ledger = read_pending(checkpoint_base)
    if ledger["resolution"] is None:
        if new_leaves is None:
            # no ledger has ever been written and nothing is being
            # appended: nothing can be pending — skip the level-0
            # seeding scan (a defensive flush_appends() on an engine
            # that never deferred must not pay an O(level-0) job) and
            # return the collapsed table as-is
            return _read_collapsed(spark, checkpoint_base, top)
        ledger["resolution"] = int(start_resolution)
        # one-time size seed: per-base-cell leaf counts of the existing
        # level 0 (bounded by the base-cell universe; incremented per
        # append afterwards — never rescanned). Persist the seeded
        # ledger BEFORE the level-0 append commits: a crash between the
        # append and the count-merge write would otherwise re-seed from
        # a level 0 that already contains the batch and then re-add the
        # batch counts on retry, inflating sizes for the tree's
        # lifetime (sizes are never rescanned).
        ledger["sizes"] = {
            r["cell_id"]: int(r["n"])
            for r in tile(
                read_level(spark, checkpoint_base, 0).select("node_id", "x", "y"),
                start_resolution,
            )
            .groupBy("cell_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        write_meta_atomic(_pending_path(checkpoint_base), ledger)
    elif int(ledger["resolution"]) != int(start_resolution):
        raise ValueError(
            f"pending ledger tracks cells at resolution {ledger['resolution']}, "
            f"got start_resolution={start_resolution}"
        )

    if new_leaves is not None:
        lvl0_delta, append_id = _stage_level0_append(new_leaves, checkpoint_base)
        if append_id not in ledger["applied"]:
            counts = (
                tile(lvl0_delta.select("node_id", "x", "y"), start_resolution)
                .groupBy("cell_id")
                .agg(F.count("*").alias("n"))
                .collect()
            )  # bounded by the base-cell universe (4^res), not by rows
            for r in counts:
                c = r["cell_id"]
                ledger["cells"][c] = int(ledger["cells"].get(c, 0)) + int(r["n"])
                ledger["sizes"][c] = int(ledger["sizes"].get(c, 0)) + int(r["n"])
            ledger["applied"] = (ledger["applied"] + [append_id])[
                -_PENDING_APPLIED_KEEP:
            ]
            write_meta_atomic(_pending_path(checkpoint_base), ledger)

    due = sorted(
        c
        for c, n in ledger["cells"].items()
        if force_flush
        or int(n)
        >= max(
            min_pending_per_cell,
            min_pending_frac * int(ledger["sizes"].get(c, 0)),
        )
    )
    if not due:
        # no flush: collapsed table with up-to-date leaves and
        # bounded-stale parents
        return _read_collapsed(spark, checkpoint_base, top)

    stats = _propagate_affected(
        spark, checkpoint_base, cfg, start_resolution, top, dim,
        affected_l1=list(due),
    )
    for c in due:
        ledger["cells"].pop(c, None)
    # the ledger lives for the tree's LIFETIME (every later eager
    # append routes through force_flush), so the flush history must
    # not grow per append: keep the last K records for inspection and
    # fold the rest into running totals — same discipline as the
    # 'applied' retry horizon
    totals = ledger.setdefault(
        "flush_totals",
        {"flushes": 0, "cells": 0, "recomputed_parents": 0, "replaced_parents": 0},
    )
    totals["flushes"] += 1
    totals["cells"] += len(due)
    totals["recomputed_parents"] += int(stats["recomputed_parents"])
    totals["replaced_parents"] += int(stats["replaced_parents"])
    ledger["flushes"] = (
        ledger["flushes"]
        + [
            {
                "cells": len(due),
                "recomputed_parents": int(stats["recomputed_parents"]),
                "replaced_parents": int(stats["replaced_parents"]),
                "forced": bool(force_flush),
            }
        ]
    )[-_PENDING_FLUSHES_KEEP:]
    write_meta_atomic(_pending_path(checkpoint_base), ledger)
    # extend the top if the flushed cells pushed it over min_level_nodes
    return build_tree(
        spark,
        read_level(spark, checkpoint_base, 0),
        checkpoint_base,
        cfg,
        start_resolution=start_resolution,
        max_layers=max_layers,
        embed_dim=dim,
        resume=True,
    )


def dedup_stream(
    stream_df: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for the ingest path: drop rows whose key
    re-appears within the watermark window. State is BOUNDED by the
    watermark (old keys age out) — a global streaming dropDuplicates
    would grow state forever on a 10^12-page crawl; re-crawls older
    than the watermark are treated as fresh versions by design (the
    tree's incremental update replaces their cells)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
