"""RAPTOR-tree build as per-resolution tile aggregations.

Recasts the reference layer loop
(/root/reference/raptor/cluster_tree_builder.py:55-151):

- clustering (UMAP->GMM, cluster_utils.py:132-185) -> quadkey cell at
  a per-layer resolution (coarser each layer up the tree);
- oversized-cluster recursion (token sum > 3500 re-clusters,
  cluster_utils.py:166-181) -> cells over the token cap re-tile their
  members one resolution finer (driver fixed-point loop, bounded by
  max_resolution) — this same cap bounds every pandas group size;
- cluster summarization (LLM, cluster_tree_builder.py:66-85) -> a
  deterministic extractive summarizer (applyInPandas; an LLM endpoint
  drops into ``summarize_fn``);
- termination: new layer has <= min_level_nodes nodes or no reduction
  (reference cluster_tree_builder.py:95-100);
- every level checkpoints to parquet with a manifest carrying
  per-partition row counts, input lineage and timings (north_rule:
  resume mid-build) — ``build_tree`` restarts from the last complete
  level.

Node ids are allocated WITHOUT any global sort or driver round-trip:
a parent node's id encodes (layer, resolution, quadkey-as-int), which
is bijective because cell_id is unique within a layer. At 10^12 rows
a row_number()-style allocator would be a single-partition sort;
this is pure map-side arithmetic.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from raptor_rag_spark.operators.chunk import split_text
from raptor_rag_spark.operators.embed import embed_texts
from raptor_rag_spark.operators.tile import (
    cell_id_col,
    cell_key_col,
    quadkey,
    reduce_2d,
    tile,
)
from raptor_rag_spark.tokenizer import DEFAULT_TOKENIZER

NODES_SCHEMA = (
    "node_id long, layer int, cell_id string, text string, "
    "children array<long>, n_tokens int"
)


# ------------------------------------------------------- summarizer


def extractive_summary(texts: list[str], max_tokens: int, tokenizer=DEFAULT_TOKENIZER) -> str:
    """Deterministic extractive summary: member texts in node_id order,
    first sentence of each member round-robin, packed until the token
    budget. Replaces the reference's GPT summarizer
    (SummarizationModels.py:17-44) for reproducible builds."""
    sent_lists = []
    for t in texts:
        sents = [s.strip() for s in split_text(t, tokenizer, max_tokens=40)] or [t.strip()]
        sent_lists.append([s for s in sents if s])
    picked: list[str] = []
    total = 0
    for round_i in range(max(len(sl) for sl in sent_lists) if sent_lists else 0):
        for sl in sent_lists:
            if round_i >= len(sl):
                continue
            n = len(tokenizer.encode(" " + sl[round_i]))
            if total + n > max_tokens:
                return " ".join(picked) if picked else (sl[round_i][:200])
            picked.append(sl[round_i])
            total += n
    return " ".join(picked)


def http_summarize_fn(
    base_url: str,
    model: str = "gpt-3.5-turbo",
    max_retries: int = 6,
    timeout: float = 60.0,
):
    """Production-shaped ``summarize_fn`` for :func:`build_level` /
    :func:`build_tree`: POST each cell's context to an OpenAI-style
    chat-completions service, mirroring the reference's LLM summarizer
    contract —

    - context construction: member texts joined exactly like the
      reference's ``get_text`` (utils.py:181-196 — each text's lines
      space-joined, texts concatenated with NO separator, quirk
      preserved);
    - prompt shape: system "You are a helpful assistant." + user
      "Write a summary of the following, including as many key details
      as possible: {context}:" with ``max_tokens`` passed through
      (SummarizationModels.py:28-40);
    - response: ``choices[0].message.content``
      (SummarizationModels.py:42);
    - bounded exponential retries, ``stop_after_attempt(6)`` analog
      (SummarizationModels.py:22). Deliberate deviations from the
      reference's ``except: return e`` (SummarizationModels.py:43-45,
      which would write the stringified exception INTO the tree as a
      node's text): 4xx rejections raise immediately (a retry cannot
      fix a rejected payload), and an exhausted retry budget raises so
      the Spark task fails and re-schedules — a summarizer outage must
      never silently poison parent nodes.

    Transport (retry/4xx/backoff discipline) is the shared
    :func:`raptor_rag_spark.functions.httpclient.post_json_with_retries`
    — one implementation for both model seams. Stdlib-only (urllib);
    runs inside the applyInPandas worker, one HTTP call per cell.
    Returns the plug-in ``(texts, max_tokens) -> str`` callable
    ``build_level`` expects."""
    from raptor_rag_spark.functions.httpclient import post_json_with_retries

    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")
    url = base_url.rstrip("/") + "/v1/chat/completions"

    def fn(texts: list[str], max_tokens: int) -> str:
        context = "".join(" ".join(("" if t is None else str(t)).splitlines()) for t in texts)
        payload = {
            "model": model,
            "messages": [
                {"role": "system", "content": "You are a helpful assistant."},
                {
                    "role": "user",
                    "content": (
                        "Write a summary of the following, including "
                        f"as many key details as possible: {context}:"
                    ),
                },
            ],
            "max_tokens": max_tokens,
        }
        data = post_json_with_retries(
            url, payload, "summarization",
            max_retries=max_retries, timeout=timeout,
        )
        out = data["choices"][0]["message"]["content"]
        if not isinstance(out, str):
            raise ValueError(
                f"summarization service returned non-text: {type(out).__name__}"
            )
        return out

    return fn


def node_id_for_cell(layer: int):
    """Column fn: bijective parent id = layer<<48 | res<<40 | cell-as-int.

    quadkey digits are base-4; max_resolution<=14 keeps the int < 2^30."""

    def col(cell_id, resolution):
        as_int = F.conv(cell_id, 4, 10).cast("long")
        return (
            (F.lit(layer).cast("long") * F.lit(1 << 48))
            + (resolution.cast("long") * F.lit(1 << 40))
            + as_int
        ).alias("node_id")

    return col


# -------------------------------------------------------- level step


def _assign_cells_with_cap(
    nodes: DataFrame, start_res: int, cfg: EngineConfig
) -> DataFrame:
    """Tile at start_res; cells whose token sum exceeds the cap re-tile
    their members one resolution finer (C4 recast). Returns nodes +
    (resolution, cell_id).

    ONE-PASS formulation (round 4; replaces the round-by-round driver
    fixed point, which ran ~3 eager materializations per resolution):
    per-cell (token_sum, count) for the WHOLE resolution ladder comes
    from one exploded aggregation, a cell is "splittable" iff sum > cap
    AND count > 1 (singleton over-cap cells stay — reference
    single-node base case, cluster_utils.py:161-163), and each node's
    final cell is its FIRST non-splittable ancestor (min resolution,
    always defined because max_resolution is never splittable).

    Provably identical to the fixed point: quadkey nesting means a
    finer cell's members all share its coarser ancestor, so whenever
    the loop evaluated a cell at res r (ancestor chain all splittable)
    its membership there equaled the cell's GLOBAL membership — the
    global per-(res, cell) stats are exactly the loop's stats wherever
    they are consulted, and finer rows under a non-split ancestor are
    simply never the minimum. Fully lazy: no driver actions; the stats
    and the first-ancestor pick shuffle only skinny (node_id, n_tokens,
    res, cell_id) rows, and ONE hash exchange of the full rows pays for
    the node_id join back (vs the loop's R rounds x (agg + 2 joins +
    2 eager wide-row checkpoint writes) — the wide rows moved through
    local storage every round there, they move through one exchange
    here)."""
    # the input may carry (resolution, cell_id) from the level below —
    # the loop formulation overwrote them via tile()'s withColumn; the
    # cap logic must drop them first
    nodes = nodes.drop("resolution", "cell_id")
    if cfg.max_resolution <= start_res:
        # no finer resolution to split into (incl. start_res PAST the
        # max — the loop formulation tiled at start_res there, and an
        # empty ladder would otherwise build an array<void> that dies
        # with a cryptic INVALID_EXTRACT_BASE_FIELD_TYPE)
        return tile(nodes, start_res).drop("ix", "iy")
    resolutions = list(range(start_res, cfg.max_resolution + 1))
    # broadcast-vs-join switch: the splittable set is bounded by the
    # populated-cell universe of the ladder's sub-max levels; under the
    # bound it lives on the driver (same discipline as
    # tile.MAX_BROADCAST_RESOLUTION), past it the join twin runs
    universe = sum(4 ** (r + 1) for r in resolutions[:-1])
    if universe > _MAX_SPLITTABLE_BROADCAST:
        return _assign_cells_with_cap_join(nodes, resolutions, cfg)
    # the input feeds BOTH the splittable-stats collect and the final
    # map-side pick: if there is real compute behind it (an un-pinned
    # chunk/embed pipeline), pin it once so the upstream plan does not
    # evaluate twice; cheap re-scans (level files, checkpoints) are
    # left alone
    from raptor_rag_spark.functions.planutil import plan_is_bare_scan

    if not plan_is_bare_scan(nodes):
        nodes = nodes.localCheckpoint(eager=False)
    # ONE skinny aggregation (map-side combine) of the exploded ladder
    # -> the splittable (res, cell) set, collected (bounded above).
    # Morton long keys, no per-row strings in the shuffle.
    keys_arr = F.array(
        *[cell_key_col(F.col("x"), F.col("y"), r) for r in resolutions[:-1]]
    )
    splittable = {
        int(r["_k"])
        for r in nodes.select(F.col("n_tokens"), F.explode(keys_arr).alias("_k"))
        .groupBy("_k")
        .agg(F.sum("n_tokens").alias("_sum"), F.count("*").alias("_n"))
        .filter(
            (F.col("_sum") > cfg.max_tokens_in_cluster) & (F.col("_n") > 1)
        )
        .select("_k")
        .collect()
    }
    if not splittable:
        # nothing over the cap: every node stays at start_res — pure
        # JVM tiling, zero Python and zero further shuffles (the common
        # case for upper tree levels, whose token mass shrinks fast)
        return tile(nodes, start_res).drop("ix", "iy")
    # map-side pick of each node's first non-splittable ancestor — no
    # join back, no per-node shuffle; the wide row never leaves the JVM
    # (the kernel sees only x, y)
    spark = nodes.sparkSession
    b_split = spark.sparkContext.broadcast(splittable)
    base_r, max_r = resolutions[0], resolutions[-1]

    import numpy as np

    @F.pandas_udf("integer")
    def pick_res(it: "Iterator[tuple[pd.Series, pd.Series]]") -> "Iterator[pd.Series]":
        sp = b_split.value
        for xs, ys in it:
            x = xs.to_numpy(dtype=np.float64)
            y = ys.to_numpy(dtype=np.float64)
            n_pts = len(x)
            res_out = np.full(n_pts, max_r, dtype=np.int32)
            undecided = np.ones(n_pts, dtype=bool)
            for r in range(base_r, max_r):
                n = 1 << (r + 1)
                ix = np.clip(((x + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
                iy = np.clip(((y + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
                m = np.zeros(n_pts, dtype=np.int64)
                for i in range(r + 1):
                    m += ((ix >> i) & 1) << (2 * i)
                    m += ((iy >> i) & 1) << (2 * i + 1)
                key = (r << 32) + m
                sel = undecided & np.fromiter(
                    (int(k) not in sp for k in key), dtype=bool, count=n_pts
                )
                res_out[sel] = r
                undecided &= ~sel
                if not undecided.any():
                    break
            yield pd.Series(res_out)

    out = nodes.withColumn("resolution", pick_res(F.col("x"), F.col("y")))
    cell = F.coalesce(
        *[
            F.when(
                F.col("resolution") == r,
                cell_id_col(F.col("x"), F.col("y"), r),
            )
            for r in resolutions
        ]
    )
    return out.withColumn("cell_id", cell)


# splittable-set driver bound for _assign_cells_with_cap: past this
# ladder universe the set may not fit the driver — use the join twin
_MAX_SPLITTABLE_BROADCAST = 1 << 20


def _assign_cells_with_cap_join(
    nodes: DataFrame, resolutions: list[int], cfg: EngineConfig
) -> DataFrame:
    """Join-based twin of the cap-split pick for ladders whose cell
    universe exceeds the driver bound — the original round-4 one-pass
    formulation (no driver-resident state): exploded ladder stats,
    anti-join of splittable cells, per-node min-resolution pick, one
    wide join back. Identical output (the broadcast path's equivalence
    argument is the same first-non-splittable-ancestor rule)."""
    # cut upstream lineage once: `nodes` feeds BOTH the ladder stats
    # and the final join's left side — without this the upstream plan
    # (e.g. an un-pinned embed pipeline) evaluates twice per action
    nodes = nodes.localCheckpoint(eager=False)
    ladder = F.array(
        *[
            F.struct(
                F.lit(r).alias("resolution"),
                cell_id_col(F.col("x"), F.col("y"), r).alias("cell_id"),
            )
            for r in resolutions
        ]
    )
    ex = nodes.select(
        "node_id", "n_tokens", F.explode(ladder).alias("_l")
    ).select("node_id", "n_tokens", "_l.resolution", "_l.cell_id")
    splittable = (
        ex.filter(F.col("resolution") < cfg.max_resolution)
        .groupBy("resolution", "cell_id")
        .agg(F.sum("n_tokens").alias("_sum"), F.count("*").alias("_n"))
        .filter((F.col("_sum") > cfg.max_tokens_in_cluster) & (F.col("_n") > 1))
        .select("resolution", "cell_id")
    )
    chosen = (
        ex.join(splittable, ["resolution", "cell_id"], "left_anti")
        .groupBy("node_id")
        .agg(F.min(F.struct("resolution", "cell_id")).alias("_c"))
        .select(
            "node_id",
            F.col("_c.resolution").alias("resolution"),
            F.col("_c.cell_id").alias("cell_id"),
        )
    )
    return nodes.join(chosen, "node_id")


def build_level(
    nodes: DataFrame,
    layer: int,
    resolution: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    summarize_fn: Callable[[list[str], int], str] | None = None,
    with_embedding: bool = False,
    embed_dim: int | None = None,
) -> DataFrame:
    """One layer step: tile current nodes -> per-cell summarize ->
    parent nodes (node_id, layer, cell_id, text, children, n_tokens).

    Input needs: node_id, text, n_tokens, x, y.

    ``with_embedding=True`` additionally computes the parent's
    embedding (default hash embedder at ``embed_dim``) and its 2-D
    reduction (cfg.seed) INSIDE the same grouped kernel — one Python
    stage instead of three chained Arrow nodes (summarize ->
    embed_texts -> reduce_2d), with bit-identical outputs (the hash
    embedder is batch-order-independent by construction and the
    projection is the same float64 matmul reduce_2d runs). The tree
    build paths use this; the bare parent surface stays the default.
    """
    # tokenizer seam: parent n_tokens (and the extractive fallback's
    # token budget) must count in the SAME dialect the leaves were
    # chunked with — a BPE-chunked tree with regex parent counts would
    # silently mix dialects in every downstream token budget. The
    # factory runs inside the worker (per-worker cached for BPE);
    # default is the oracle-green regex tokenizer, unchanged.
    tok_factory = cfg.tokenizer_factory or (lambda: DEFAULT_TOKENIZER)
    summ = (
        summarize_fn
        or cfg.summarize_fn
        or (lambda texts, mt: extractive_summary(texts, mt, tokenizer=tok_factory()))
    )
    assigned = _assign_cells_with_cap(nodes, resolution, cfg)

    out_schema = "cell_id string, resolution int, text string, children array<long>, n_tokens int"
    max_summary = cfg.summary_max_tokens
    if with_embedding:
        from raptor_rag_spark.operators.embed import hash_embed_batch
        from raptor_rag_spark.operators.tile import projection_matrix

        dim = embed_dim or cfg.embedding_dim
        proj = projection_matrix(dim, cfg.seed)  # small, ships in closure
        out_schema += ", embedding array<float>, x double, y double"

    def summarize_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("node_id")
        texts = list(pdf["text"])
        text = summ(texts, max_summary)
        out = pd.DataFrame(
            {
                "cell_id": [key[0]],
                "resolution": [int(pdf["resolution"].iloc[0])],
                "text": [text],
                "children": [[int(v) for v in pdf["node_id"]]],
                "n_tokens": [len(tok_factory().encode(text))],
            }
        )
        if with_embedding:
            emb = hash_embed_batch(pd.Series([text]), dim)  # (1, dim) f32
            xy = emb.astype("float64") @ proj.T  # = reduce_2d's matmul
            out["embedding"] = list(emb)
            out["x"] = xy[:, 0]
            out["y"] = xy[:, 1]
        return out

    # explicit hash repartition BEFORE the grouped UDF: the summarizer
    # is CPU-bound Python, but its shuffle input is small in BYTES, so
    # AQE would coalesce the exchange to ~1 partition and serialize the
    # whole level's summarization (measured 62 s -> a few s at sf0.1).
    # A user-specified repartition on the group key satisfies the
    # required distribution (no second exchange) and AQE leaves it alone.
    par = nodes.sparkSession.sparkContext.defaultParallelism
    parents = assigned.select(
        "cell_id", "resolution", "node_id", "text", "n_tokens"
    ).repartition(par, "cell_id").groupBy("cell_id").applyInPandas(
        summarize_cell, out_schema
    )

    mk_id = node_id_for_cell(layer)
    extra = ("embedding", "x", "y") if with_embedding else ()
    return parents.select(
        mk_id(F.col("cell_id"), F.col("resolution")),
        F.lit(layer).alias("layer"),
        "cell_id",
        "text",
        "children",
        "n_tokens",
        *extra,
    )


# ------------------------------------------------- checkpointed build


def _manifest_path(base: str, layer: int) -> str:
    return os.path.join(base, f"level={layer}", "_MANIFEST.json")


def _level_path(base: str, layer: int) -> str:
    return os.path.join(base, f"level={layer}", "nodes.parquet")


def write_level(
    df: DataFrame,
    base: str,
    layer: int,
    lineage: dict,
    partition_prefix_len: int | None = None,
) -> dict:
    """Atomic level checkpoint: parquet + manifest with per-partition
    row counts, lineage and timings. The manifest is written AFTER the
    parquet commit — its presence marks the level complete.

    ``partition_prefix_len``: physically partition the level by the
    first N quadkey digits of cell_id (``cell_pfx=...`` dirs). N =
    level_resolution+1 makes each start-resolution cell its own
    partition — exactly the closed recompute unit of incremental
    maintenance, so an append overwrites ONLY affected partitions
    (dynamic partition overwrite) instead of rewriting the level."""
    t0 = time.time()
    path = _level_path(base, layer)
    if partition_prefix_len and "cell_id" in df.columns:
        (
            df.withColumn(
                "cell_pfx",
                F.coalesce(
                    F.substring("cell_id", 1, partition_prefix_len), F.lit("_")
                ),
            )
            .write.mode("overwrite")
            .partitionBy("cell_pfx")
            .parquet(path)
        )
    else:
        partition_prefix_len = None
        df.write.mode("overwrite").parquet(path)
    return refresh_manifest(
        df.sparkSession, base, layer, lineage, partition_prefix_len, t0=t0
    )


def storage_partition_counts(path: str, by_cell_pfx: bool) -> dict[str, int]:
    """Per-partition row counts straight from the parquet FOOTERS of a
    just-written level — a driver-side metadata walk, no Spark job.
    The previous formulation re-read the whole level through a Spark
    count (full scan + scheduling); the footer walk reads O(files)
    metadata pages, which is strictly cheaper at every scale (the scan
    had to list the same files before reading any data). Keys: the
    ``cell_pfx=`` dir value for prefix-partitioned levels (what
    update_manifest_delta needs), else the write-task index parsed
    from the part file name. Zero-row files are skipped, matching the
    old groupBy (which emitted no row for an empty partition)."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    if by_cell_pfx:
        for entry in sorted(os.listdir(path)):
            if not entry.startswith("cell_pfx="):
                continue
            n = 0
            d = os.path.join(path, entry)
            for fn in sorted(os.listdir(d)):
                if fn.startswith("part-") and not fn.endswith(".crc"):
                    n += pq.ParquetFile(os.path.join(d, fn)).metadata.num_rows
            if n:
                counts[entry.split("=", 1)[1]] = n
    else:
        for fn in sorted(os.listdir(path)):
            if not fn.startswith("part-") or fn.endswith(".crc"):
                continue
            n = pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows
            if n:
                # part-00042-<uuid>... -> write task 42
                try:
                    key = str(int(fn.split("-")[1]))
                except (IndexError, ValueError):
                    key = fn
                counts[key] = counts.get(key, 0) + n
    return counts


def refresh_manifest(
    spark: SparkSession,
    base: str,
    layer: int,
    lineage: dict,
    partition_prefix_len: int | None = None,
    t0: float | None = None,
) -> dict:
    """(Re)write a level's manifest from what is on storage (footer
    metadata walk — see storage_partition_counts; no data re-scan).
    Prefix-partitioned levels key the per-partition counts by cell_pfx
    (the physical partition), so incremental maintenance can later
    update them ARITHMETICALLY from the write delta
    (update_manifest_delta) without rescanning."""
    t0 = time.time() if t0 is None else t0
    per_part = storage_partition_counts(
        _level_path(base, layer), bool(partition_prefix_len)
    )
    manifest = {
        "layer": layer,
        "rows": int(sum(per_part.values())),
        "partitions": {k: int(v) for k, v in per_part.items()},
        "partitions_by": "cell_pfx" if partition_prefix_len else "partition_id",
        "partition_prefix_len": partition_prefix_len,
        "lineage": lineage,
        "wall_sec": round(time.time() - t0, 3),
        "written_at_epoch": int(time.time()),
    }
    with open(_manifest_path(base, layer), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def update_manifest_delta(
    base: str,
    layer: int,
    replaced_counts: dict[str, int] | list[str],
    recomputed_counts: dict[str, int],
    lineage: dict,
    t0: float | None = None,
) -> dict:
    """Arithmetic manifest update after a dynamic-partition-overwrite:
    drop the affected cell_pfx entries, insert the recomputed counts,
    re-derive the row total — NO storage scan (the 100 TB path: an
    append's manifest cost is O(affected partitions), not O(level)).
    Requires a manifest with partitions keyed by cell_pfx."""
    t0 = time.time() if t0 is None else t0
    manifest = read_manifest(base, layer)
    if manifest.get("partitions_by") != "cell_pfx":
        raise ValueError(
            f"level {layer} manifest partitions keyed by "
            f"{manifest.get('partitions_by')!r}, need 'cell_pfx'"
        )
    parts = dict(manifest["partitions"])
    for pfx in replaced_counts:
        parts.pop(pfx, None)
    parts.update({k: int(v) for k, v in recomputed_counts.items()})
    manifest.update(
        {
            "rows": int(sum(parts.values())),
            "partitions": parts,
            "lineage": lineage,
            "wall_sec": round(time.time() - t0, 3),
            "written_at_epoch": int(time.time()),
        }
    )
    with open(_manifest_path(base, layer), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_level(spark: SparkSession, base: str, layer: int) -> DataFrame:
    """Level checkpoint reader: drops the physical partition column
    (cell_pfx) when the level was written prefix-partitioned, so every
    consumer sees the same logical schema regardless of layout."""
    df = spark.read.parquet(_level_path(base, layer))
    return df.drop("cell_pfx") if "cell_pfx" in df.columns else df


def read_level_pruned(
    spark: SparkSession, base: str, layer: int, prefixes: list[str]
) -> DataFrame:
    """Partition-pruned read of a prefix-partitioned level: only the
    ``cell_pfx=`` directories matching ``prefixes`` (exactly, or by
    quadkey-prefix when the given strings are SHORTER than the level's
    partition key) are listed and read — the O(affected) I/O path of
    incremental maintenance. Two details matter:

    - the partition column is read through an EXPLICIT schema as a
      STRING: default partition-type inference parses '01230' as the
      integer 1230, silently merging distinct quadkeys (the same
      inference caused the round-5 manifest drift);
    - the predicate is on the partition column only, so Catalyst
      evaluates it against directory values during listing
      (PartitionFilters in the scan — no data files outside the
      affected dirs are opened).

    Returns the level WITHOUT cell_pfx, like read_level. Caller must
    know the level is prefix-partitioned (manifest
    partition_prefix_len)."""
    from pyspark.sql import types as T

    path = _level_path(base, layer)
    inferred = spark.read.parquet(path).schema
    fields = [
        T.StructField("cell_pfx", T.StringType()) if f.name == "cell_pfx" else f
        for f in inferred.fields
    ]
    df = spark.read.schema(T.StructType(fields)).parquet(path)
    if not prefixes:
        return df.drop("cell_pfx").limit(0)
    plen = len(prefixes[0])
    pred = F.substring("cell_pfx", 1, plen).isin(list(prefixes))
    return df.filter(pred).drop("cell_pfx")


def read_manifest(base: str, layer: int) -> dict:
    with open(_manifest_path(base, layer)) as f:
        return json.load(f)


def last_complete_level(base: str) -> int:
    """Highest layer with a manifest; -1 if none."""
    lvl = -1
    while os.path.exists(_manifest_path(base, lvl + 1)):
        lvl += 1
    return lvl


def build_tree(
    spark: SparkSession,
    leaves: DataFrame,
    checkpoint_base: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    start_resolution: int = 4,
    max_layers: int = 8,
    embed_dim: int | None = None,
    resume: bool = True,
    summarize_fn: Callable[[list[str], int], str] | None = None,
) -> DataFrame:
    """Full tree: leaves (node_id, text, n_tokens, embedding) -> all
    levels, checkpointed per level, resumable mid-build.

    ``summarize_fn`` threads through to every :func:`build_level` call
    (e.g. :func:`http_summarize_fn` for a live LLM endpoint); default
    is the deterministic extractive summarizer.

    Returns the union of all levels (the collapsed-tree node table:
    node_id, layer, cell_id, text, children, n_tokens, embedding, x, y).
    """
    dim = embed_dim or cfg.embedding_dim
    os.makedirs(checkpoint_base, exist_ok=True)

    done = last_complete_level(checkpoint_base) if resume else -1
    if done < 0:
        lvl0 = (
            leaves.withColumn("layer", F.lit(0))
            .withColumn("cell_id", F.lit(None).cast("string"))
            .withColumn("children", F.array().cast("array<long>"))
        )
        lvl0 = reduce_2d(lvl0, dim=dim, seed=cfg.seed)
        write_level(
            lvl0.select(
                "node_id", "layer", "cell_id", "text", "children", "n_tokens", "embedding", "x", "y"
            ),
            checkpoint_base,
            0,
            {"input": "leaves"},
        )
        done = 0

    layer = done
    # level row counts come from the manifests — never a separate
    # count() action (each used to re-execute the whole level pipeline;
    # measured as ~2 extra actions per layer in the tree-build bench)
    n_current = read_manifest(checkpoint_base, layer)["rows"]
    while layer < max_layers:
        if n_current <= cfg.min_level_nodes:
            break
        current = read_level(spark, checkpoint_base, layer)
        res = max(start_resolution - layer, 0)
        parents = build_level(
            current, layer + 1, res, cfg, summarize_fn=summarize_fn,
            with_embedding=True, embed_dim=dim,
        )
        parents = parents.select(
            "node_id", "layer", "cell_id", "text", "children", "n_tokens", "embedding", "x", "y"
        )
        manifest = write_level(
            parents,
            checkpoint_base,
            layer + 1,
            {"input": _level_path(checkpoint_base, layer), "resolution": res},
            partition_prefix_len=res + 1,
        )
        n_parents = manifest["rows"]
        if n_parents >= n_current:
            # no reduction — retract the identity layer and stop
            # (avoids infinite identity layers; the parquet dir stays,
            # but without a manifest the level does not exist)
            os.remove(_manifest_path(checkpoint_base, layer + 1))
            break
        layer += 1
        n_current = n_parents
        if n_parents <= cfg.min_level_nodes:
            break

    levels = []
    lvl = 0
    while os.path.exists(_manifest_path(checkpoint_base, lvl)):
        levels.append(read_level(spark, checkpoint_base, lvl))
        lvl += 1
    out = levels[0]
    for more in levels[1:]:
        out = out.unionByName(more)
    return out
