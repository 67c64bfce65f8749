"""Persisted span-fingerprint store — incremental ExactSubstr dedup
for crawl ingest.

`dedup.remove_duplicate_spans` is the whole-corpus batch form of Lee
et al. 2021; at crawl scale the corpus is ingested in batches and the
published suffix-array tool would rebuild its index per snapshot. This
store makes span dedup incremental: it persists the corpus's k-window
fingerprint COUNTS once, then each new batch is scrubbed against
(store + batch) counts and appended in O(new).

Semantics vs the batch op (stated, not hidden): a batch token drops
when its window's total occurrence count — everything ever ingested
plus the batch itself — reaches `min_count`. Already-ingested copies
are NOT revisited, so the store keeps the FIRST-seen copy of every
span (the batch op drops all copies, matching the released
suffix-array tool; first-copy-kept is the variant that tool documents
as an open problem — incremental ingest gives it for free). Appends
count the batch's RAW windows (dedup means "seen before", even when
the earlier copy itself was scrubbed on ingest).

Scale shape:
- The counts table is a Spark BUCKETED table on `_fp`
  (`bucketBy(n, "_fp").sortBy("_fp")`, the `sources/bucketed.py`
  pattern): per-batch scrubbing semi-joins and aggregates the store
  WITHOUT EVER SHUFFLING IT — the store side plans zero Exchanges
  (plan-asserted in tests); only the batch's distinct fingerprints
  (O(batch)) shuffle, into the bucket layout. Fingerprints are
  uniform, so no partition pruning is possible by construction — a
  linear store SCAN per batch is the honest floor for exact dedup
  without a point-lookup service, and it streams (no shuffle, no
  driver state). The store is O(corpus tokens) rows of 24 bytes —
  the same asymptotics as the suffix array it replaces.
- Appends land as new partial-count rows tagged with a content-derived
  `_aid` (one saveAsTable append job, O(new)); the read path
  aggregates partials per (fp, aid) FIRST — `first(cnt)` — so a
  replayed append (crash after the data commit, before the meta
  commit) self-heals instead of double-counting; the meta ledger
  (`applied_appends`, committed LAST, `functions/staging.py`
  discipline) makes clean retries no-ops without a scan.
- `compact()` folds partials into one row per fingerprint (sum is
  associative) via the single-dir swap protocol
  (`maintenance.heal_compaction` windows), preserving the ledger so
  retries of merged appends still no-op.

The catalog entry is session-scoped (in-memory catalog): `load()`
re-registers the external bucketed table by DDL (`CLUSTERED BY ...
LOCATION`); the bucket ids live in the part-file names, so a fresh
session inherits the layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_rag_spark.functions.staging import content_append_id
from raptor_rag_spark.operators.dedup import (
    scrub_from_dup_windows,
    span_token_table,
    window_fingerprints,
)
from raptor_rag_spark.operators.maintenance import (
    heal_compaction,
    swap_live_dir,
    write_meta_atomic,
)

_COUNTS = "counts"


class SpanFingerprintStore:
    """See module docstring. Construct via `build` or `load`."""

    def __init__(
        self, spark: SparkSession, path: str, meta: dict
    ) -> None:
        self.spark = spark
        self.path = path
        self.meta = meta

    # ------------------------------------------------------------ wiring

    @property
    def k(self) -> int:
        return int(self.meta["k"])

    @property
    def table(self) -> str:
        return self.meta["table"]

    @property
    def _counts_dir(self) -> str:
        return os.path.join(self.path, _COUNTS)

    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def _commit_meta(self) -> None:
        write_meta_atomic(self._meta_path(), self.meta)

    def _heal(self) -> None:
        heal_compaction(self._counts_dir)

    def _register(self) -> None:
        """(Re-)register the external bucketed table in this session's
        catalog — metadata is session-scoped, the files are not."""
        if self.spark.catalog.tableExists(self.table):
            return
        n = int(self.meta["n_buckets"])
        self.spark.sql(
            f"CREATE TABLE {self.table} (_fp BIGINT, cnt BIGINT, _aid STRING) "
            f"USING PARQUET CLUSTERED BY (_fp) SORTED BY (_fp) "
            f"INTO {n} BUCKETS LOCATION '{self._counts_dir}'"
        )

    def _counts(self) -> DataFrame:
        """Self-healing read: collapse replayed (fp, aid) partials
        before summing. Both aggregations plan zero Exchanges on the
        bucketed scan (grouping keys ⊇ the bucket key)."""
        self._register()
        return (
            self.spark.table(self.table)
            .groupBy("_fp", "_aid")
            .agg(F.first("cnt").alias("cnt"))
        )

    @staticmethod
    def _batch_counts(
        batch: DataFrame, id_col: str, text_col: str, k: int, aid: str
    ) -> DataFrame:
        wins = window_fingerprints(span_token_table(batch, id_col, text_col), id_col, k)
        return wins.groupBy("_fp").agg(
            F.count("*").cast("long").alias("cnt"), F.lit(aid).alias("_aid")
        )

    # ------------------------------------------------------------ lifecycle

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        k: int = 8,
        n_buckets: int = 32,
        table: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "SpanFingerprintStore":
        """One-time bucketed write of the corpus's window-fingerprint
        counts (the analogue of building the suffix array)."""
        import hashlib

        from raptor_rag_spark.operators.minhash_store import _validate_store_path
        from raptor_rag_spark.sources.bucketed import write_bucketed

        _validate_store_path(path)
        if table is None:  # stable across processes (hash() is salted)
            digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()
            table = f"span_fp_{digest[:12]}"
        os.makedirs(path, exist_ok=True)
        counts = cls._batch_counts(docs, id_col, text_col, k, "base")
        write_bucketed(
            counts, table, ("_fp",), n_buckets, sort_cols=("_fp",),
            path=os.path.join(path, _COUNTS),
        )
        meta = {
            "k": int(k),
            "n_buckets": int(n_buckets),
            "table": table,
            "id_col": id_col,
            "text_col": text_col,
            "applied_appends": ["base"],
            "compactions": [],
        }
        store = cls(spark, path, meta)
        store._commit_meta()
        return store

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SpanFingerprintStore":
        from raptor_rag_spark.operators.minhash_store import _validate_store_path

        _validate_store_path(path)
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        store = cls(spark, path, meta)
        store._heal()  # recover a crashed compaction before any read
        store._register()
        return store

    # ------------------------------------------------------------ ingest

    def append(
        self,
        batch: DataFrame,
        append_id: str | None = None,
        id_col: str | None = None,
        text_col: str | None = None,
    ) -> str:
        """O(new): append the batch's raw window counts as partial rows
        tagged with a content-derived append id. Ledger-committed last;
        a clean retry no-ops, a replay after a lost meta write
        self-heals at read time (see `_counts`)."""
        id_col = id_col or self.meta["id_col"]
        text_col = text_col or self.meta["text_col"]
        self._heal()
        aid = append_id or "a-" + content_append_id(batch, [id_col, text_col])
        if aid in self.meta["applied_appends"]:
            return "already_applied"
        self._register()
        counts = self._batch_counts(batch, id_col, text_col, self.k, aid)
        (
            counts.write.mode("append")
            .format("parquet")
            .bucketBy(int(self.meta["n_buckets"]), "_fp")
            .sortBy("_fp")
            .saveAsTable(self.table)
        )
        self.meta["applied_appends"].append(aid)
        self._commit_meta()
        self.spark.catalog.refreshTable(self.table)
        return aid

    def scrub_batch(
        self,
        batch: DataFrame,
        min_count: int = 2,
        return_text: bool = False,
        id_col: str | None = None,
        text_col: str | None = None,
        count_batch: bool = True,
    ) -> DataFrame:
        """Remove from BATCH docs every token covered by a k-window
        whose store+batch occurrence count reaches `min_count`. Same
        output shape as `dedup.remove_duplicate_spans`; the store side
        plans zero Exchanges (bucketed semi-join + partial-collapse
        agg), only batch fingerprints shuffle.

        LAZINESS: the returned plan reads the LIVE table at action
        time — evaluate (or write) it before appending this same batch
        or the batch counts against itself and everything scrubs; use
        `ingest()` for the safe composed call. `count_batch=False`
        skips adding the batch's own window counts — correct exactly
        when they are ALREADY in the store (the ingest path)."""
        if min_count < 2:
            raise ValueError(f"min_count must be >= 2, got {min_count}")
        id_col = id_col or self.meta["id_col"]
        text_col = text_col or self.meta["text_col"]
        self._heal()
        toks = span_token_table(batch, id_col, text_col)
        wins = window_fingerprints(toks, id_col, self.k)
        bcnt = wins.groupBy("_fp").agg(F.count("*").alias("_bcnt"))
        scnt = (
            self._counts()
            .join(bcnt.select("_fp"), "_fp", "left_semi")
            .groupBy("_fp")
            .agg(F.sum("cnt").alias("_scnt"))
        )
        total = F.coalesce(F.col("_scnt"), F.lit(0)) + (
            F.col("_bcnt") if count_batch else F.lit(0)
        )
        dup_fp = (
            bcnt.join(scnt, "_fp", "left")
            .filter(total >= F.lit(min_count))
            .select("_fp")
        )
        dupw = wins.join(dup_fp, "_fp").select(id_col, "pos")
        return scrub_from_dup_windows(
            toks, dupw, id_col, text_col, self.k, return_text
        )

    def ingest(
        self, batch: DataFrame, return_text: bool = True, min_count: int = 2
    ) -> DataFrame:
        """The per-crawl-day call: append the batch's raw counts FIRST,
        then scrub against store-only counts (`count_batch=False`) —
        algebraically identical to scrub-then-append (post-append store
        = prior + batch), but the returned plan stays lazily SAFE: it
        reads a table that already contains the batch. Evaluate each
        ingest's result before the next ingest — a later batch's counts
        would inflate overlapping windows of an unevaluated plan."""
        self.append(batch)
        return self.scrub_batch(
            batch, min_count=min_count, return_text=return_text,
            count_batch=False,
        )

    # ------------------------------------------------------------ upkeep

    def compact(self) -> dict:
        """Fold partial-count rows into one row per fingerprint (sum is
        associative; scrub results are identical by construction —
        pytest-pinned). Single-dir swap under the heal protocol; the
        append ledger survives, so retries of merged appends still
        no-op. Returns {'rows_before', 'rows_after'}."""
        from raptor_rag_spark.sources.bucketed import write_bucketed

        self._heal()
        self._register()
        token = "c%d" % (len(self.meta["compactions"]) + 1)
        agg = self.spark.table(self.table).agg(
            F.count("*").alias("rows"),
            F.countDistinct("_fp").alias("fps"),
        ).first()
        before, before_fps = agg["rows"], agg["fps"]
        merged = (
            self._counts()
            .groupBy("_fp")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .withColumn("_aid", F.lit("compact-" + token))
        )
        tmp_table = self.table + "_compacting"
        write_bucketed(
            merged, tmp_table, ("_fp",), int(self.meta["n_buckets"]),
            sort_cols=("_fp",), path=self._counts_dir + ".compacting",
        )
        after = self.spark.table(tmp_table).count()
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        if after != before_fps:  # refuse to swap in a lossy rewrite
            import shutil

            shutil.rmtree(self._counts_dir + ".compacting", ignore_errors=True)
            raise RuntimeError(
                f"compaction row mismatch: {after} merged rows vs "
                f"{before_fps} distinct fingerprints — not swapping"
            )
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        swap_live_dir(self._counts_dir)
        self.meta["compactions"].append(token)
        self._commit_meta()
        self._register()
        return {"rows_before": before, "rows_after": after}
