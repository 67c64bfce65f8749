"""Incremental / Structured Streaming ingestion."""

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.datagen import synthetic_pages
from raptor_rag_spark.streaming import (
    incremental_level0,
    read_stream_level0,
    stream_pages,
)


def test_incremental_level0_batch(spark):
    pages = synthetic_pages(spark, n=32, seed=5)
    nodes = incremental_level0(pages, dim=32)
    rows = nodes.collect()
    assert rows
    cols = set(nodes.columns)
    assert {"node_id", "text", "n_tokens", "embedding", "x", "y"} <= cols
    assert all(abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-5 for r in rows)


def test_stream_pages_available_now(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    chk = str(tmp_path_factory.mktemp("stream_chk"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    synthetic_pages(spark, n=24, seed=6).write.mode("overwrite").parquet(src)

    q = stream_pages(spark, src, chk, out)
    q.awaitTermination(120)
    got = read_stream_level0(spark, out)
    n1 = got.count()
    assert n1 > 0
    assert got.select(F.min(F.size("embedding"))).first()[0] == 64

    # append a second batch of pages -> only the new rows are processed
    synthetic_pages(spark, n=12, seed=7).withColumn(
        "page_id", F.col("page_id") + 1000
    ).write.mode("append").parquet(src)
    q2 = stream_pages(spark, src, chk, out)
    q2.awaitTermination(120)
    n2 = read_stream_level0(spark, out).count()
    assert n2 > n1


def test_stateful_sessionize_across_microbatches(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: a session spanning two
    micro-batches keeps ONE session index (per-batch windows cannot do
    this), and the full streamed assignment equals the batch gap-window
    computation over the same events."""
    import datetime as dt

    from raptor_rag_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path_factory.mktemp("sess_src"))
    chk = str(tmp_path_factory.mktemp("sess_chk"))

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def rows(specs):
        return [
            (uid, eid, t0 + dt.timedelta(seconds=off)) for uid, eid, off in specs
        ]

    schema = "user_id long, event_id long, ts timestamp"
    # batch 1: user 1 two events 10 min apart (one session, still open);
    # user 2 one event
    spark.createDataFrame(
        rows([(1, 1, 0), (1, 2, 600), (2, 10, 0)]), schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2 (separate file): user 1 event 10 min after batch 1 (SAME
    # session across the batch boundary) then one 2 h later (new
    # session); user 2 event 3 h later (new session)
    spark.createDataFrame(
        rows([(1, 3, 1200), (1, 4, 1200 + 7200), (2, 11, 10800)]), schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_sec=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert len(got) == 6
    # user 1: events 1,2,3 one session (3 crosses the micro-batch
    # boundary), event 4 a new one
    assert got[(1, 1)] == got[(1, 2)] == got[(1, 3)]
    assert got[(1, 4)] == got[(1, 1)] + 1
    # user 2: second event past the gap -> new session
    assert got[(2, 11)] == got[(2, 10)] + 1


def test_windowed_agg_with_watermark_drops_late_rows(spark, tmp_path_factory):
    """Structured Streaming event-time tumbling window + watermark:
    the watermark persists in the checkpoint across availableNow runs,
    finalized windows are emitted (append mode, file sink) once the
    watermark passes their end, and a row arriving behind the watermark
    is DROPPED. Three runs — file order inside one run is not
    guaranteed, so each phase is its own run: (1) two windows of
    events, (2) an event far ahead that advances the watermark,
    (3) a late row for the first window."""
    import datetime as dt

    src = str(tmp_path_factory.mktemp("wm_src"))
    chk = str(tmp_path_factory.mktemp("wm_chk"))
    out = str(tmp_path_factory.mktemp("wm_out"))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, value double"

    def rows(specs):
        return [(eid, t0 + dt.timedelta(seconds=off), v) for eid, off, v in specs]

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "2 minutes")
            .groupBy(F.window("ts", "1 minute").alias("win"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .select(F.col("win.start").cast("long").alias("ws"), "n", "s")
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["ws"]: (r["n"], r["s"]) for r in spark.read.parquet(out).collect()
        }

    spark.createDataFrame(
        rows([(1, 0, 1.0), (2, 30, 2.0), (3, 90, 3.0)]), schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    out1 = run()
    assert out1 == {}  # nothing finalized yet (watermark lags a batch)

    spark.createDataFrame(rows([(4, 3600, 4.0)]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()  # advances the persisted watermark past both windows

    spark.createDataFrame(rows([(5, 10, 99.0)]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = run()

    import calendar

    w0 = calendar.timegm(t0.timetuple())
    # both early windows finalized WITHOUT the late row (eid 5 dropped)
    assert got[w0] == (2, 3.0), got
    assert got[w0 + 60] == (1, 3.0), got


def test_streamed_pages_feed_incremental_tree_update(spark, tmp_path_factory):
    """The full §2.10 ingest story end-to-end: pages arrive via
    Structured Streaming (stream_pages -> level-0 rows), then
    incremental_update folds them into an existing checkpointed tree —
    and the result equals a from-scratch build over the merged leaves."""
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import build_tree
    from raptor_rag_spark.streaming.incremental import incremental_update

    src = str(tmp_path_factory.mktemp("e2e_src"))
    chk = str(tmp_path_factory.mktemp("e2e_chk"))
    out = str(tmp_path_factory.mktemp("e2e_out"))
    base = str(tmp_path_factory.mktemp("e2e_tree"))
    base_all = str(tmp_path_factory.mktemp("e2e_tree_all"))

    initial = synthetic_pages(spark, n=48, seed=11)
    leaves0 = incremental_level0(initial)
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, start_resolution=3)

    # 12 new pages arrive through the stream
    synthetic_pages(spark, n=12, seed=12).withColumn(
        "page_id", F.col("page_id") + 5000
    ).write.mode("overwrite").parquet(src)
    q = stream_pages(spark, src, chk, out)
    q.awaitTermination(120)
    new_leaves = read_stream_level0(spark, out)
    assert new_leaves.count() > 0

    got = incremental_update(spark, base, new_leaves, DEFAULT_CONFIG, start_resolution=3)

    # from-scratch oracle over the merged leaves
    want = build_tree(
        spark, leaves0.unionByName(new_leaves), base_all, DEFAULT_CONFIG,
        start_resolution=3, resume=False,
    )
    cols = ["node_id", "layer", "cell_id", "text", "n_tokens"]
    g = sorted(tuple(r) for r in got.select(*cols).collect())
    w = sorted(tuple(r) for r in want.select(*cols).collect())
    assert g == w


def test_manifest_rows_match_storage_after_incremental_update(
    spark, tmp_path_factory
):
    """Regression (round 6): after an incremental update, EVERY level's
    manifest row count must equal what is actually on storage. The old
    arithmetic manifest update read partition keys through a Spark scan
    whose partition-column type inference stripped leading zeros from
    quadkey prefixes ('01230' -> 1230), so replaced entries were never
    popped and manifests drifted ABOVE storage (observed +2 rows/level
    at sf0.01) — silently inflating every recompute-fraction
    denominator. The footer-walk counts key by the literal dir name."""
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import (
        _level_path,
        _manifest_path,
        build_tree,
        read_manifest,
    )
    from raptor_rag_spark.streaming.incremental import incremental_update

    import os

    base = str(tmp_path_factory.mktemp("mani_tree"))
    pages = synthetic_pages(spark, n=48, seed=21)
    leaves0 = incremental_level0(pages)
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, start_resolution=3)

    delta = incremental_level0(
        synthetic_pages(spark, n=8, seed=22).withColumn(
            "page_id", F.col("page_id") + 7000
        )
    )
    incremental_update(spark, base, delta, DEFAULT_CONFIG, start_resolution=3)

    lvl = 0
    while os.path.exists(_manifest_path(base, lvl)):
        m = read_manifest(base, lvl)
        actual = spark.read.parquet(_level_path(base, lvl)).count()
        assert m["rows"] == actual, (
            f"level {lvl}: manifest says {m['rows']} rows, storage has {actual}"
        )
        # per-partition counts + append-ledger rows must add up to the
        # total (appends extend "rows" without touching "partitions")
        appended = sum(int(a["rows"]) for a in m.get("appends", []))
        assert sum(m["partitions"].values()) + appended == m["rows"]
        lvl += 1


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path_factory):
    """Streaming exact dedup: a url recrawled within the watermark is
    dropped (state-bounded dropDuplicatesWithinWatermark), across
    micro-batch boundaries."""
    import datetime as dt

    from raptor_rag_spark.streaming.incremental import dedup_stream

    root = tmp_path_factory.mktemp("sdedup")
    in_dir, out_dir, ck = str(root / "in"), str(root / "out"), str(root / "ck")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [("http://a/1", base, "x"), ("http://a/2", base, "y")]
    rows2 = [("http://a/2", base + dt.timedelta(minutes=5), "y2"),
             ("http://a/3", base + dt.timedelta(minutes=5), "z")]
    schema = "url string, warc_ts timestamp, text string"
    spark.createDataFrame(rows1, schema).write.parquet(f"{in_dir}/b1")
    spark.createDataFrame(rows2, schema).write.parquet(f"{in_dir}/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    q = (
        dedup_stream(stream, key_cols=("url",), watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    urls = sorted(r["url"] for r in got.select("url").collect())
    assert urls == ["http://a/1", "http://a/2", "http://a/3"]

    # batch equivalence (the COVERAGE.md exemption's backing claim):
    # within the watermark window the streaming dedup keeps exactly the
    # first row per key — identical to the batch first-per-key window
    from pyspark.sql import Window

    batch = spark.createDataFrame(rows1 + rows2, schema)
    w = Window.partitionBy("url").orderBy("warc_ts")
    want = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "warc_ts", "text")
    )
    assert sorted(map(tuple, got.select("url", "warc_ts", "text").collect())) == sorted(
        map(tuple, want.collect())
    )


def test_append_level_idempotent_under_retry(spark, tmp_path_factory):
    """Crash-safety of the level-0 ingest append (round-3 advice):
    (a) a retry with the same append_id after a SUCCESSFUL commit is a
    no-op; (b) a retry after a crash between the data rename and the
    manifest commit scrubs the orphaned part files and applies exactly
    once — no duplicate node_id rows in either case."""
    import glob
    import json
    import os

    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import (
        _level_path,
        _manifest_path,
        build_tree,
        read_manifest,
    )
    from raptor_rag_spark.streaming.incremental import append_level

    base = str(tmp_path_factory.mktemp("append_retry_tree"))
    leaves0 = incremental_level0(synthetic_pages(spark, n=24, seed=21))
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, start_resolution=3)
    rows0 = int(read_manifest(base, 0)["rows"])

    delta = incremental_level0(
        synthetic_pages(spark, n=6, seed=22).withColumn(
            "page_id", F.col("page_id") + 9000
        )
    ).withColumn("layer", F.lit(0)).withColumn(
        "cell_id", F.lit(None).cast("string")
    ).withColumn("children", F.array().cast("array<long>")).select(
        "node_id", "layer", "cell_id", "text", "children", "n_tokens",
        "embedding", "x", "y",
    ).localCheckpoint(eager=True)
    n_delta = delta.count()

    # (a) successful apply, then an identical retry
    m1 = append_level(delta, base, 0, {"input": "t"}, append_id="batch-1")
    m2 = append_level(delta, base, 0, {"input": "t"}, append_id="batch-1")
    assert m1["rows"] == m2["rows"] == rows0 + n_delta
    lvl = spark.read.parquet(_level_path(base, 0))
    assert lvl.count() == rows0 + n_delta
    assert lvl.select("node_id").distinct().count() == rows0 + n_delta

    # (b) simulate a crash AFTER the part-file renames but BEFORE the
    # manifest commit: roll the manifest back by hand, leaving the
    # batch-2 part files orphaned in the level dir
    append_level(delta.withColumn("node_id", F.col("node_id") + 10_000_000),
                 base, 0, {"input": "t"}, append_id="batch-2")
    m = read_manifest(base, 0)
    m["rows"] -= n_delta
    m["appends"] = [a for a in m["appends"] if a.get("id") != "batch-2"]
    with open(_manifest_path(base, 0), "w") as fh:
        json.dump(m, fh)
    orphans = glob.glob(os.path.join(_level_path(base, 0), "part-inflight-batch-2-*"))
    assert orphans  # the crash left visible rows the manifest undercounts
    m3 = append_level(delta.withColumn("node_id", F.col("node_id") + 10_000_000),
                      base, 0, {"input": "t"}, append_id="batch-2")
    assert m3["rows"] == rows0 + 2 * n_delta
    lvl = spark.read.parquet(_level_path(base, 0))
    assert lvl.count() == rows0 + 2 * n_delta
    assert lvl.select("node_id").distinct().count() == rows0 + 2 * n_delta


def test_streamed_pages_feed_ann_index_append(spark, tmp_path_factory):
    """Crawl-scale ingest story for the ANN index: pages arrive via
    Structured Streaming (stream_pages -> level-0 node rows), then
    TileAnnIndex.append folds them in — equal to an index rebuilt from
    scratch over the merged corpus (the FAISS-add analog, without the
    reference's full rebuild)."""
    from raptor_rag_spark.operators.similarity import TileAnnIndex

    src = str(tmp_path_factory.mktemp("ann_src"))
    chk = str(tmp_path_factory.mktemp("ann_chk"))
    out = str(tmp_path_factory.mktemp("ann_out"))

    initial = incremental_level0(synthetic_pages(spark, n=40, seed=31)).select(
        "node_id", "embedding"
    ).localCheckpoint(eager=True)
    kw = dict(
        id_col="node_id", dim=64, seeds=(224,), base_resolution=2,
        max_occupancy=64, max_resolution=7,
    )
    idx = TileAnnIndex(initial, **kw)

    synthetic_pages(spark, n=10, seed=32).withColumn(
        "page_id", F.col("page_id") + 7000
    ).write.mode("overwrite").parquet(src)
    q = stream_pages(spark, src, chk, out)
    q.awaitTermination(120)
    streamed = spark.read.parquet(out).select("node_id", "embedding").localCheckpoint(
        eager=True
    )
    assert streamed.count() > 0
    idx.append(streamed)

    merged = initial.unionByName(streamed)
    full = TileAnnIndex(merged, **kw)
    a = sorted(map(tuple, idx.views[0][2].collect()))
    b = sorted(map(tuple, full.views[0][2].collect()))
    assert a == b
    queries = merged.limit(8).select(
        F.col("node_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["node_id"], r["rank"]) for r in df.collect()
    )
    assert key(idx.search(queries, k=5, ring=2)) == key(full.search(queries, k=5, ring=2))


def test_crawl_day_end_to_end(spark, tmp_path_factory):
    """The whole §2.10 ingest story in one pipeline: a day's crawl
    arrives via Structured Streaming WITH a planted recrawl duplicate →
    dedup_stream drops it inside the watermark → level-0 rows feed BOTH
    the tree (incremental_update, affected cells only) and the
    persisted ANN index (append_persisted, affected partitions only) →
    retrieval and index search both see the new content and agree with
    from-scratch rebuilds."""
    import datetime as dt

    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.similarity import TileAnnIndex
    from raptor_rag_spark.operators.tree import build_tree
    from raptor_rag_spark.streaming.incremental import dedup_stream, incremental_update

    root = tmp_path_factory.mktemp("crawlday")
    src, ck, out = str(root / "src"), str(root / "ck"), str(root / "out")
    tree_base, tree_all = str(root / "tree"), str(root / "tree_all")
    idx_path = str(root / "idx")

    # yesterday's corpus: tree + persisted ANN index
    initial_pages = synthetic_pages(spark, n=40, seed=51)
    leaves0 = incremental_level0(initial_pages).localCheckpoint(eager=True)
    build_tree(spark, leaves0, tree_base, DEFAULT_CONFIG, start_resolution=3)
    kw = dict(
        id_col="node_id", dim=64, seeds=(224,), base_resolution=2,
        max_occupancy=64, max_resolution=7,
    )
    TileAnnIndex(leaves0.select("node_id", "embedding"), **kw).save(idx_path)

    # today's crawl: 8 fresh pages + 1 recrawl of an existing url
    # + 1 FUZZY near-dup (new url, near-identical text) that the
    # exact-url watermark dedup cannot catch
    # seed 5200: datagen seeds rows by (seed + page_id), so seed 52
    # ids 0-7 would EQUAL seed-51 ids 1-8 (exact text copies the fuzzy
    # stage below would rightly drop); 5200 is outside 51+[0,40)
    fresh = (
        synthetic_pages(spark, n=8, seed=5200)
        .withColumn("page_id", F.col("page_id") + 8000)
        # datagen urls are /p/{pid} over zipf-skewed domains — fresh
        # pids 0-7 collide with initial urls often enough to die in the
        # left_anti below; re-key them unambiguously
        .withColumn("url", F.concat(F.lit("https://fresh.test/p/"), F.col("page_id")))
    )
    recrawl = initial_pages.limit(1).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES")
    )
    neardup = initial_pages.limit(1).select(
        (F.col("page_id") + 9000).alias("page_id"),
        F.concat(F.col("url"), F.lit("?v=2")).alias("url"),
        "warc_ts",
        "html",
        F.concat(F.col("text"), F.lit(" tiny tail")).alias("text"),
        "lang",
    )
    batch = (
        fresh.unionByName(initial_pages.limit(1))
        .unionByName(recrawl)
        .unionByName(neardup)
    )
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        dedup_stream(stream, key_cols=("url",), watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    deduped = spark.read.parquet(out)
    # the recrawl was dropped; the url survives once; the fuzzy
    # near-dup sails through (different url)
    assert deduped.count() == 10
    new_pages = deduped.join(
        initial_pages.select("url"), "url", "left_anti"
    ).localCheckpoint(eager=True)
    assert new_pages.count() == 9

    # fuzzy stage: the persisted minhash store (built on yesterday's
    # corpus) drops the near-identical-text page the url dedup missed
    from raptor_rag_spark.operators.minhash_store import MinHashSignatureStore

    mh = MinHashSignatureStore.build(
        spark, initial_pages, str(root / "mh"),
        id_col="page_id", text_col="text", n_buckets=4,
    )
    new_pages = mh.ingest(new_pages, threshold=0.8).localCheckpoint(eager=True)
    assert new_pages.count() == 8
    assert new_pages.filter(F.col("page_id") >= 9000).count() == 0
    for _t in mh.meta["tables"].values():
        spark.sql(f"DROP TABLE IF EXISTS {_t}")

    new_leaves = incremental_level0(new_pages).localCheckpoint(eager=True)
    got_tree = incremental_update(
        spark, tree_base, new_leaves, DEFAULT_CONFIG, start_resolution=3
    )
    want_tree = build_tree(
        spark, leaves0.unionByName(new_leaves), tree_all, DEFAULT_CONFIG,
        start_resolution=3, resume=False,
    )
    cols = ["node_id", "layer", "cell_id", "text", "n_tokens"]
    assert sorted(map(tuple, got_tree.select(*cols).collect())) == sorted(
        map(tuple, want_tree.select(*cols).collect())
    )

    idx = TileAnnIndex.load(spark, idx_path)
    idx.append_persisted(idx_path, new_leaves.select("node_id", "embedding"))
    merged = leaves0.select("node_id", "embedding").unionByName(
        new_leaves.select("node_id", "embedding")
    )
    full = TileAnnIndex(merged, **kw)
    queries = new_leaves.limit(4).select(
        F.col("node_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["node_id"], r["rank"]) for r in df.collect()
    )
    got_k = key(idx.search(queries, k=5, ring=2))
    assert got_k == key(full.search(queries, k=5, ring=2))
    # new content is findable: each new-chunk query's rank-1 is itself
    assert {qid for qid, _, r in [(a, b, c) for a, b, c in got_k] if r == 1} == {
        r["query_id"] for r in queries.select("query_id").collect()
    }


def test_stream_sink_replayed_epoch_is_exactly_once(spark, tmp_path_factory):
    """foreachBatch is at-least-once: a crash between the sink write and
    the streaming checkpoint commit replays the micro-batch. The epoch-
    partitioned sink must absorb the replay (REPLACE its partition, not
    append a duplicate) — the exactly-once half of the ingest story."""
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.streaming.incremental import _epoch_sink

    out = str(tmp_path_factory.mktemp("epoch_sink_out"))
    sink = _epoch_sink(out, DEFAULT_CONFIG)
    batch = synthetic_pages(spark, n=10, seed=31)
    sink(batch, 0)
    first = sorted(
        map(tuple, read_stream_level0(spark, out).select("node_id").collect())
    )
    assert len(first) > 0
    sink(batch, 0)  # the replay
    replayed = sorted(
        map(tuple, read_stream_level0(spark, out).select("node_id").collect())
    )
    assert replayed == first
    # a genuinely new epoch still lands next to it
    sink(synthetic_pages(spark, n=5, seed=32).withColumn(
        "page_id", F.col("page_id") + 900
    ), 1)
    assert read_stream_level0(spark, out).count() > len(first)


def test_two_streams_one_store_do_not_clobber(spark, tmp_path_factory):
    """Epoch ids are only unique per streaming checkpoint: two streams
    (distinct checkpoint dirs) feeding one out_dir must not overwrite
    each other's epoch-0 partitions — the sink namespaces the partition
    key by checkpoint."""
    src1 = str(tmp_path_factory.mktemp("ns_src1"))
    src2 = str(tmp_path_factory.mktemp("ns_src2"))
    out = str(tmp_path_factory.mktemp("ns_out"))
    synthetic_pages(spark, n=8, seed=41).write.mode("overwrite").parquet(src1)
    synthetic_pages(spark, n=6, seed=42).withColumn(
        "page_id", F.col("page_id") + 7000
    ).write.mode("overwrite").parquet(src2)
    q1 = stream_pages(spark, src1, str(tmp_path_factory.mktemp("ns_chk1")), out)
    q1.awaitTermination(120)
    n1 = read_stream_level0(spark, out).count()
    q2 = stream_pages(spark, src2, str(tmp_path_factory.mktemp("ns_chk2")), out)
    q2.awaitTermination(120)
    n2 = read_stream_level0(spark, out).count()
    assert n1 > 0
    assert n2 > n1  # stream 2's epoch 0 landed NEXT TO stream 1's


def test_stream_composes_scrub_and_quality(spark, tmp_path_factory):
    """The webtext map-only ops (PII scrub, quality metrics columns,
    lang-id) compose directly into a streaming ingest: readStream ->
    scrub_pii -> quality/lang columns -> sink, across micro-batches —
    no stateful operator involved, so the plan stays watermark-free
    and per-batch map-only (the 100 TB ingest shape: scrub at first
    touch, before anything persists)."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.pii import scrub_pii
    from raptor_rag_spark.operators.textstats import lang_id

    root = tmp_path_factory.mktemp("scompose")
    in_dir, out_dir, ck = str(root / "in"), str(root / "out"), str(root / "ck")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "the cat and the dog went to the market for a mail a@b.io")], schema
    ).write.parquet(f"{in_dir}/b1")
    spark.createDataFrame(
        [(2, "der und die das ist nicht ein ip 10.0.0.1 mit auf zu")], schema
    ).write.parquet(f"{in_dir}/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    cleaned = scrub_pii(stream).withColumn("lang", lang_id(F.col("text")))
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["text"]
    assert got[2]["n_ipv4"] == 1 and "<IP>" in got[2]["text"]
    assert got[1]["lang"] == "en" and got[2]["lang"] == "de"


def test_incremental_update_planned_defers_counts_and_flushes_exact(
    spark, tmp_path_factory
):
    """Append planner end-to-end: (a) a scattered batch below the
    per-cell threshold lands in level 0 but DEFERS parent recompute
    (ledger counts it, parents byte-identical); (b) a retried batch
    neither duplicates leaves nor double-counts; (c) a later batch
    pushes cells over the threshold -> due cells flush and clear;
    (d) force_flush restores exact equality with a from-scratch build
    over the merged leaves (the eager incremental==scratch property,
    extended to deferred cells)."""
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import build_tree, read_level
    from raptor_rag_spark.streaming.incremental import (
        incremental_update_planned,
        read_pending,
    )

    root = tmp_path_factory.mktemp("planned")
    base, base_all = str(root / "tree"), str(root / "tree_all")
    kw = dict(start_resolution=3, max_layers=4)

    leaves0 = incremental_level0(synthetic_pages(spark, n=40, seed=61)).localCheckpoint(
        eager=True
    )
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, **kw)
    parents_before = sorted(
        map(tuple, read_level(spark, base, 1).select("node_id", "text").collect())
    )
    n_lvl0 = read_level(spark, base, 0).count()

    def batch(seed, offset):
        pages = synthetic_pages(spark, n=8, seed=seed).withColumn(
            "page_id", F.col("page_id") + offset
        ).withColumn(
            "url", F.concat(F.lit(f"https://b{offset}.test/p/"), F.col("page_id"))
        )
        return incremental_level0(pages).localCheckpoint(eager=True)

    b1 = batch(6100, 10_000)
    # (a) high threshold: no cell flushes
    incremental_update_planned(
        spark, base, b1, DEFAULT_CONFIG, min_pending_per_cell=10**6, **kw
    )
    led = read_pending(base)
    assert sum(led["cells"].values()) == b1.count()
    assert len(led["applied"]) == 1 and not led["flushes"]
    assert read_level(spark, base, 0).count() == n_lvl0 + b1.count()
    assert (
        sorted(map(tuple, read_level(spark, base, 1).select("node_id", "text").collect()))
        == parents_before
    )

    # (b) retry: same batch again — no new leaves, no double counts
    incremental_update_planned(
        spark, base, b1, DEFAULT_CONFIG, min_pending_per_cell=10**6, **kw
    )
    led2 = read_pending(base)
    assert led2["cells"] == led["cells"] and len(led2["applied"]) == 1
    assert read_level(spark, base, 0).count() == n_lvl0 + b1.count()

    # ledger tracks cell sizes (seeded from level 0 + batch increments)
    assert sum(led["sizes"].values()) == n_lvl0 + b1.count()
    assert all(led["sizes"][c] >= n for c, n in led["cells"].items())

    # (c) second batch with absolute threshold 1 and the relative test
    # disabled: every pending cell flushes
    b2 = batch(6200, 20_000)
    incremental_update_planned(
        spark, base, b2, DEFAULT_CONFIG,
        min_pending_per_cell=1, min_pending_frac=0.0, **kw
    )
    led3 = read_pending(base)
    assert not led3["cells"] and len(led3["flushes"]) == 1
    assert led3["flushes"][0]["recomputed_parents"] > 0
    parents_flushed = sorted(
        map(tuple, read_level(spark, base, 1).select("node_id", "text").collect())
    )
    assert parents_flushed != parents_before

    # (d) third deferred batch, then force_flush == from-scratch build
    b3 = batch(6300, 30_000)
    incremental_update_planned(
        spark, base, b3, DEFAULT_CONFIG, min_pending_per_cell=10**6, **kw
    )
    assert read_pending(base)["cells"]  # b3 pending
    got = incremental_update_planned(
        spark, base, None, DEFAULT_CONFIG, force_flush=True, **kw
    )
    assert not read_pending(base)["cells"]
    merged = leaves0.unionByName(b1).unionByName(b2).unionByName(b3)
    want = build_tree(spark, merged, base_all, DEFAULT_CONFIG, resume=False, **kw)
    cols = ["node_id", "layer", "cell_id", "text", "n_tokens"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_planner_seed_persists_before_append_no_double_count(
    spark, tmp_path_factory, monkeypatch
):
    """Crash-retry on the FIRST planned call must not double-count the
    batch in the ledger's sizes: the seeded ledger persists BEFORE the
    level-0 append commits, so a retry that re-presents the batch after
    a crash between the append and the count-merge write merges the
    counts exactly once (sizes total == pre-append leaves + batch)."""
    from raptor_rag_spark import operators
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.maintenance import write_meta_atomic
    from raptor_rag_spark.operators.tree import build_tree, read_level
    from raptor_rag_spark.streaming.incremental import (
        incremental_update_planned,
        read_pending,
    )

    root = tmp_path_factory.mktemp("planned_crash")
    base = str(root / "tree")
    kw = dict(start_resolution=3, max_layers=4)
    leaves0 = incremental_level0(synthetic_pages(spark, n=30, seed=71)).localCheckpoint(
        eager=True
    )
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, **kw)
    n_lvl0 = read_level(spark, base, 0).count()

    pages = synthetic_pages(spark, n=8, seed=7100).withColumn(
        "page_id", F.col("page_id") + 40_000
    ).withColumn("url", F.concat(F.lit("https://crash.test/p/"), F.col("page_id")))
    b1 = incremental_level0(pages).localCheckpoint(eager=True)

    # crash between the level-0 append and the ledger count-merge:
    # the first write (the seed) succeeds, the second (count merge) dies
    calls = {"n": 0}

    def dying_write(path, obj):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before count-merge write")
        return write_meta_atomic(path, obj)

    monkeypatch.setattr(
        operators.maintenance, "write_meta_atomic", dying_write
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_update_planned(
            spark, base, b1, DEFAULT_CONFIG, min_pending_per_cell=10**6, **kw
        )
    monkeypatch.undo()
    # the append committed, the seed persisted, the counts did not
    assert read_level(spark, base, 0).count() == n_lvl0 + b1.count()
    led = read_pending(base)
    assert led["resolution"] is not None and not led["cells"]
    assert sum(led["sizes"].values()) == n_lvl0  # pre-append seed

    # retry: append dedups on the content id; counts merge exactly once
    incremental_update_planned(
        spark, base, b1, DEFAULT_CONFIG, min_pending_per_cell=10**6, **kw
    )
    led2 = read_pending(base)
    assert read_level(spark, base, 0).count() == n_lvl0 + b1.count()
    assert sum(led2["cells"].values()) == b1.count()
    assert sum(led2["sizes"].values()) == n_lvl0 + b1.count()  # no inflation


def test_planner_noop_flush_skips_seeding_scan(spark, tmp_path_factory):
    """flush_appends()/planner with nothing to append on a tree that
    never deferred: returns the collapsed table WITHOUT creating (or
    scanning for) a ledger — a defensive flush before every export must
    not pay an O(level-0) job each time."""
    import os

    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import build_tree
    from raptor_rag_spark.streaming.incremental import (
        _pending_path,
        incremental_update_planned,
    )

    root = tmp_path_factory.mktemp("planned_noop")
    base = str(root / "tree")
    kw = dict(start_resolution=3, max_layers=4)
    leaves0 = incremental_level0(synthetic_pages(spark, n=25, seed=81)).localCheckpoint(
        eager=True
    )
    want = build_tree(spark, leaves0, base, DEFAULT_CONFIG, **kw)
    got = incremental_update_planned(
        spark, base, None, DEFAULT_CONFIG, force_flush=True, **kw
    )
    assert not os.path.exists(_pending_path(base))  # no ledger materialized
    cols = ["node_id", "layer", "text"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_flush_history_bounded_with_running_totals(
    spark, tmp_path_factory, monkeypatch
):
    """The ledger lives for the tree's lifetime (every later eager
    append force-flushes through it), so the flush history must not
    grow per append: the list is capped at _PENDING_FLUSHES_KEEP while
    flush_totals keeps exact running counters."""
    from raptor_rag_spark import streaming
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import build_tree
    from raptor_rag_spark.streaming.incremental import (
        incremental_update_planned,
        read_pending,
    )

    monkeypatch.setattr(streaming.incremental, "_PENDING_FLUSHES_KEEP", 2)
    root = tmp_path_factory.mktemp("flush_cap")
    base = str(root / "tree")
    kw = dict(start_resolution=3, max_layers=4)
    leaves0 = incremental_level0(synthetic_pages(spark, n=25, seed=91)).localCheckpoint(
        eager=True
    )
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, **kw)

    for day in range(3):  # min_pending_per_cell=1 => every batch flushes
        pages = synthetic_pages(spark, n=4, seed=9100 + day).withColumn(
            "page_id", F.col("page_id") + 50_000 + 1_000 * day
        ).withColumn(
            "url", F.concat(F.lit(f"https://cap.test/{day}/p/"), F.col("page_id"))
        )
        batch = incremental_level0(pages).localCheckpoint(eager=True)
        incremental_update_planned(
            spark, base, batch, DEFAULT_CONFIG, min_pending_per_cell=1,
            min_pending_frac=0.0, **kw
        )

    led = read_pending(base)
    assert len(led["flushes"]) == 2  # capped at the monkeypatched keep
    assert led["flush_totals"]["flushes"] == 3  # totals remember all
    assert led["flush_totals"]["cells"] >= 3
    assert led["flush_totals"]["recomputed_parents"] > 0


def test_direct_eager_update_settles_pending_ledger(spark, tmp_path_factory):
    """Calling incremental_update DIRECTLY (not via the api facade) on
    a tree with a pending ledger must settle the ledger, not bypass it
    — the invariant lives in the streaming module, at every call site."""
    from raptor_rag_spark.config import DEFAULT_CONFIG
    from raptor_rag_spark.operators.tree import build_tree
    from raptor_rag_spark.streaming.incremental import (
        incremental_update,
        incremental_update_planned,
        read_pending,
    )

    root = tmp_path_factory.mktemp("direct_settle")
    base = str(root / "tree")
    kw = dict(start_resolution=3, max_layers=4)
    leaves0 = incremental_level0(synthetic_pages(spark, n=25, seed=92)).localCheckpoint(
        eager=True
    )
    build_tree(spark, leaves0, base, DEFAULT_CONFIG, **kw)

    p1 = synthetic_pages(spark, n=5, seed=9200).withColumn(
        "page_id", F.col("page_id") + 60_000
    ).withColumn("url", F.concat(F.lit("https://direct.test/a/"), F.col("page_id")))
    b1 = incremental_level0(p1).localCheckpoint(eager=True)
    incremental_update_planned(
        spark, base, b1, DEFAULT_CONFIG, min_pending_per_cell=10**6, **kw
    )
    assert read_pending(base)["cells"]  # b1 deferred

    p2 = synthetic_pages(spark, n=4, seed=9300).withColumn(
        "page_id", F.col("page_id") + 70_000
    ).withColumn("url", F.concat(F.lit("https://direct.test/b/"), F.col("page_id")))
    b2 = incremental_level0(p2).localCheckpoint(eager=True)
    got = incremental_update(spark, base, b2, DEFAULT_CONFIG, **kw)

    led = read_pending(base)
    assert not led["cells"]  # settled, not bypassed
    assert led["flushes"] and led["flushes"][-1]["forced"]
    assert got.filter("layer = 0").count() == leaves0.count() + b1.count() + b2.count()
