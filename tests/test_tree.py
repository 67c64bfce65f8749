"""Tree build: level loop, checkpoint manifests, resume, structure
properties (reference semantics: cluster_tree_builder.py:55-151)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.config import EngineConfig
from raptor_rag_spark.datagen import synthetic_pages
from raptor_rag_spark.operators.chunk import chunk_documents
from raptor_rag_spark.operators.embed import embed_texts
from raptor_rag_spark.operators.tree import (
    build_tree,
    extractive_summary,
    last_complete_level,
)

CFG = EngineConfig(embedding_dim=32, min_level_nodes=4)


@pytest.fixture(scope="module")
def leaves(spark):
    pages = synthetic_pages(spark, n=120, seed=42)
    docs = pages.select(F.col("page_id").alias("doc_id"), "text")
    chunks = chunk_documents(docs, max_tokens=60)
    return (
        embed_texts(chunks, dim=32)
        .withColumnRenamed("chunk_id", "node_id")
        .select("node_id", "text", "n_tokens", "embedding")
        .cache()
    )


def test_extractive_summary_deterministic():
    texts = ["First point. Second point.", "Another doc here. More text!"]
    s1 = extractive_summary(texts, 30)
    s2 = extractive_summary(texts, 30)
    assert s1 == s2 and len(s1) > 0


def test_build_checkpoints_and_structure(spark, leaves, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tree"))
    nodes = build_tree(spark, leaves, base, CFG, start_resolution=3, embed_dim=32)
    layers = {r["layer"]: r["n"] for r in nodes.groupBy("layer").agg(F.count("*").alias("n")).collect()}
    assert 0 in layers and len(layers) >= 2, layers
    # monotone shrink above the leaves
    sizes = [layers[k] for k in sorted(layers)]
    assert all(a > b for a, b in zip(sizes, sizes[1:])), sizes

    # manifests: per-level lineage + row counts match
    lvl = last_complete_level(base)
    assert lvl == max(layers)
    for layer in sorted(layers):
        with open(os.path.join(base, f"level={layer}", "_MANIFEST.json")) as f:
            man = json.load(f)
        assert man["rows"] == layers[layer]
        assert sum(man["partitions"].values()) == man["rows"]
        assert "lineage" in man and "wall_sec" in man

    # every non-leaf child id exists in a LOWER layer exactly
    parents = nodes.filter(F.col("layer") > 0).select(
        "layer", F.explode("children").alias("child_id")
    )
    ids = nodes.select(F.col("node_id").alias("child_id"), F.col("layer").alias("child_layer"))
    joined = parents.join(ids, "child_id", "left")
    assert joined.filter(F.col("child_layer").isNull()).count() == 0
    assert joined.filter(F.col("child_layer") != F.col("layer") - 1).count() == 0

    # every leaf reachable: union of layer-1 children covers all leaves
    covered = (
        nodes.filter(F.col("layer") == 1)
        .select(F.explode("children").alias("node_id"))
        .distinct()
    )
    n_leaves = nodes.filter(F.col("layer") == 0).count()
    assert covered.count() == n_leaves


def test_resume_mid_build_identical(spark, leaves, tmp_path_factory):
    full_base = str(tmp_path_factory.mktemp("tree_full"))
    nodes_full = build_tree(spark, leaves, full_base, CFG, start_resolution=3, embed_dim=32)

    # simulate a crash after level 1: copy levels 0..1, then resume
    resumed_base = str(tmp_path_factory.mktemp("tree_resumed"))
    import shutil

    for lvl in (0, 1):
        shutil.copytree(
            os.path.join(full_base, f"level={lvl}"),
            os.path.join(resumed_base, f"level={lvl}"),
        )
    assert last_complete_level(resumed_base) == 1
    nodes_resumed = build_tree(spark, leaves, resumed_base, CFG, start_resolution=3, embed_dim=32)

    a = sorted(map(tuple, nodes_full.select("node_id", "layer", "cell_id", "text").collect()))
    b = sorted(map(tuple, nodes_resumed.select("node_id", "layer", "cell_id", "text").collect()))
    assert a == b


def test_node_ids_unique(spark, leaves, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tree_ids"))
    nodes = build_tree(spark, leaves, base, CFG, start_resolution=3, embed_dim=32)
    assert nodes.count() == nodes.select("node_id").distinct().count()


def test_incremental_update_matches_scratch(spark, leaves, tmp_path_factory):
    """SURVEY §2.10: append new pages -> re-run AFFECTED levels only.
    The incrementally maintained tree must equal a from-scratch build
    over the merged leaves, while recomputing fewer cells than a full
    level rebuild (manifest lineage proves it)."""
    import json as _json

    from raptor_rag_spark.operators.tile import reduce_2d
    from raptor_rag_spark.streaming.incremental import incremental_update

    base_inc = str(tmp_path_factory.mktemp("tree_inc"))
    base_all = str(tmp_path_factory.mktemp("tree_all"))
    old = leaves.filter(F.col("node_id") % 5 != 0)
    new = leaves.filter(F.col("node_id") % 5 == 0)
    build_tree(spark, old, base_inc, CFG, start_resolution=3, embed_dim=32)
    new_xy = reduce_2d(new, dim=32, seed=CFG.seed)
    got = incremental_update(
        spark, base_inc, new_xy, CFG, start_resolution=3, embed_dim=32
    )
    want = build_tree(
        spark, leaves, base_all, CFG, start_resolution=3, embed_dim=32, resume=False
    )
    cols = ["node_id", "layer", "cell_id", "text", "n_tokens"]
    g = sorted(tuple(r) for r in got.select(*cols).collect())
    w = sorted(tuple(r) for r in want.select(*cols).collect())
    assert g == w
    gc = {r["node_id"]: sorted(r["children"]) for r in got.select("node_id", "children").collect()}
    wc = {r["node_id"]: sorted(r["children"]) for r in want.select("node_id", "children").collect()}
    assert gc == wc
    # affected-only recompute: level 1 rebuilt fewer parents than exist
    with open(os.path.join(base_inc, "level=1", "_MANIFEST.json")) as fh:
        man = _json.load(fh)
    assert man["lineage"]["input"] == "incremental"
    assert 0 < man["lineage"]["recomputed_parents"] < man["rows"]
    # level 0 was appended, not rewritten
    with open(os.path.join(base_inc, "level=0", "_MANIFEST.json")) as fh:
        man0 = _json.load(fh)
    assert man0.get("appends") and man0["appends"][0]["rows"] > 0


def test_incremental_partial_partition_overwrite(spark, leaves, tmp_path_factory):
    """Prefix-partitioned levels + dynamic partition overwrite: an
    append must physically rewrite ONLY the affected cell_pfx
    directories — untouched partitions keep the same files (same
    names, sizes, mtimes). This is the 100 TB maintenance invariant:
    kept rows are never read or written."""
    import glob

    from raptor_rag_spark.operators.tile import reduce_2d
    from raptor_rag_spark.streaming.incremental import incremental_update

    base = str(tmp_path_factory.mktemp("tree_ppo"))
    old = leaves.filter(F.col("node_id") % 5 != 0)
    new = leaves.filter(F.col("node_id") % 5 == 0).limit(3)
    build_tree(spark, old, base, CFG, start_resolution=3, embed_dim=32)

    def snapshot(level):
        out = {}
        for d in glob.glob(
            os.path.join(base, f"level={level}", "nodes.parquet", "cell_pfx=*")
        ):
            out[os.path.basename(d)] = {
                os.path.basename(f): (os.path.getsize(f), os.path.getmtime(f))
                for f in glob.glob(os.path.join(d, "*.parquet"))
            }
        return out

    assert snapshot(1), "level 1 should be prefix-partitioned"
    before = snapshot(1)
    new_xy = reduce_2d(new, dim=32, seed=CFG.seed)
    incremental_update(spark, base, new_xy, CFG, start_resolution=3, embed_dim=32)
    after = snapshot(1)
    untouched = [p for p in before if after.get(p) == before[p]]
    changed = [p for p in after if after[p] != before.get(p)]
    assert changed, "the append must touch at least one partition"
    assert untouched, "some partition must be carried over physically"
    # manifest records the dynamic-overwrite path
    import json as _json

    with open(os.path.join(base, "level=1", "_MANIFEST.json")) as fh:
        man = _json.load(fh)
    assert man["lineage"].get("write") == "dynamic-partition-overwrite"
    # arithmetic (no-rescan) manifest update must agree with storage
    assert man.get("partitions_by") == "cell_pfx"
    actual = spark.read.parquet(os.path.join(base, "level=1", "nodes.parquet")).count()
    assert man["rows"] == actual
    assert sum(man["partitions"].values()) == actual


def test_cap_assign_start_res_beyond_max_resolution(spark):
    """start_resolution past cfg.max_resolution must tile at start_res
    (the loop formulation's behavior) — the one-pass ladder would
    otherwise build an empty array<void> and die with a cryptic
    INVALID_EXTRACT_BASE_FIELD_TYPE AnalysisException."""
    from raptor_rag_spark.config import EngineConfig
    from raptor_rag_spark.operators.tree import _assign_cells_with_cap

    cfg = EngineConfig(embedding_dim=8, max_resolution=6)
    nodes = spark.createDataFrame(
        [(i, "t", 3, i / 10.0 - 0.5, i / 20.0 - 0.2) for i in range(8)],
        "node_id long, text string, n_tokens int, x double, y double",
    )
    out = _assign_cells_with_cap(nodes, start_res=8, cfg=cfg).collect()
    assert len(out) == 8
    assert all(r["resolution"] == 8 and len(r["cell_id"]) == 9 for r in out)
