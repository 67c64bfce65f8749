"""Persisted MinHash signature store — incremental fuzzy dedup for
crawl ingest.

`dedup.minhash_dedup_pairs` is the whole-corpus batch form (reference
scope: the RAPTOR corpus is rebuilt per run, `raptor/tree_builder.py`
re-embeds everything); at crawl scale dedup is batch-vs-corpus and the
published MinHash pipelines (RefinedWeb, Dolma — public writeups)
re-sign the full corpus per snapshot. This store persists each
document's minhash signature and LSH band keys ONCE; every new crawl
batch is then matched against everything ever ingested in O(batch):

- signatures: the Arrow minhash kernel over the batch only.
- candidates: the batch's band keys equi-join the store's BUCKETED
  band table — the store side plans ZERO Exchanges (bucketed on the
  band key, the `sources/bucketed.py` pattern; plan-asserted); only
  O(batch x bands) key rows shuffle into the bucket layout.
- verify: est-Jaccard (fraction of agreeing signature slots) via the
  store's signature table, bucketed on the doc id — again only the
  candidate rows shuffle. The store holds NO text: verification is
  the 64-hash ESTIMATE (std <= sqrt(J(1-J)/64) ~ 0.063), not exact
  Jaccard — stated, not hidden. The batch family keeps the exact
  shingle verify when text is at hand; incremental crawl dedup trades
  it for an O(corpus-signatures) store, 8 bytes x n_hashes per doc.

Ingest follows the span store's append-FIRST discipline
(`span_store.py`): the batch's signatures land with a content-derived
`_aid` before matching, and matching EXCLUDES rows of that `_aid` —
so the returned scrub plan is lazily safe (it reads tables that
already contain the batch) and the store keeps the first-seen copy of
every near-dup cluster while later copies drop. Scrubbed docs'
signatures stay in the store on purpose: content seen once must keep
matching future copies even though the early copy was itself dropped.

Self-healing reads: a replayed append (crash after the data commit,
before the meta commit) duplicates rows with the SAME (id, _aid);
both tables deduplicate per (key, _aid) at read time — grouping keys
contain the bucket key, so the heal costs no Exchange. A doc id
legitimately re-appended in a later batch (recrawl with new text) has
a DIFFERENT `_aid` and keeps both signatures; pair scoring takes the
max estimate across them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_rag_spark.functions.staging import content_append_id
from raptor_rag_spark.operators.dedup import make_minhash_udf
from raptor_rag_spark.operators.maintenance import heal_compaction, swap_live_dir, write_meta_atomic

_SIGS = "sigs"
_BANDS = "bands"


def band_keys(sig_df: DataFrame, n_hashes: int, bands: int, id_col: str = "id") -> DataFrame:
    """(id, _bh) — one 64-bit LSH band key per (doc, band): xxhash64 of
    (band index, the band's signature slice). The band index inside the
    hash keeps equal slices of DIFFERENT bands from colliding."""
    rows_per_band = n_hashes // bands
    cols = [
        F.xxhash64(F.lit(bi), F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band))
        for bi in range(bands)
    ]
    return sig_df.select(F.col(id_col).alias("id"), F.explode(F.array(*cols)).alias("_bh"))


def _validate_store_path(path: str) -> str:
    """The store path is interpolated into CREATE TABLE ... LOCATION
    '<path>' DDL at every register; a quote/backtick/newline would make
    each fresh-session load fail (or mis-target another location), and
    a BACKSLASH is an escape sequence to Spark's SQL parser (default
    escapedStringLiterals=false: '\\n' in the literal becomes a real
    newline), silently registering the table at a different location
    than the parquet files. Reject all of them at build/load time
    instead of at first read."""
    if any(c in path for c in ("'", "`", "\\", "\n", "\r")):
        raise ValueError(
            "store path must not contain quotes/backticks/backslashes/"
            f"newlines: {path!r}"
        )
    return path


class MinHashSignatureStore:
    """See module docstring. Construct via `build` or `load`."""

    def __init__(self, spark: SparkSession, path: str, meta: dict) -> None:
        self.spark = spark
        self.path = path
        self.meta = meta

    # ------------------------------------------------------------ wiring

    @property
    def n_hashes(self) -> int:
        return int(self.meta["n_hashes"])

    @property
    def bands(self) -> int:
        return int(self.meta["bands"])

    def _dir(self, which: str) -> str:
        return os.path.join(self.path, which)

    def _table(self, which: str) -> str:
        return self.meta["tables"][which]

    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def _commit_meta(self) -> None:
        write_meta_atomic(self._meta_path(), self.meta)

    def _heal(self) -> None:
        for which in (_SIGS, _BANDS):
            heal_compaction(self._dir(which))

    def _register(self) -> None:
        """(Re-)register both external bucketed tables — catalog
        metadata is session-scoped, the bucketed files are not. The id
        column's type comes from meta (recorded at build): a store
        built over string/int ids must re-register with the type the
        parquet files actually hold, or every fresh-session read fails
        schema conversion."""
        n = int(self.meta["n_buckets"])
        idt = self.meta.get("id_type", "bigint")
        ddl = {
            _SIGS: (f"(id {idt}, sig ARRAY<BIGINT>, _aid STRING)", "id"),
            _BANDS: (f"(_bh BIGINT, id {idt}, _aid STRING)", "_bh"),
        }
        for which, (schema, key) in ddl.items():
            if self.spark.catalog.tableExists(self._table(which)):
                continue
            self.spark.sql(
                f"CREATE TABLE {self._table(which)} {schema} "
                f"USING PARQUET CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {n} BUCKETS LOCATION '{self._dir(which)}'"
            )

    def _sigs(self) -> DataFrame:
        """Replay-healed signature table: one row per (id, _aid)."""
        self._register()
        return (
            self.spark.table(self._table(_SIGS))
            .groupBy("id", "_aid")
            .agg(F.first("sig").alias("sig"))
        )

    def _bands(self) -> DataFrame:
        """Replay-healed band table: one row per (_bh, id, _aid)."""
        self._register()
        return self.spark.table(self._table(_BANDS)).groupBy("_bh", "id", "_aid").agg(
            F.lit(1).alias("_one")
        ).drop("_one")

    def _sign(self, batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
        kernel = make_minhash_udf(self.n_hashes, int(self.meta["shingle_n"]))
        return batch.select(
            F.col(id_col).alias("id"), kernel(F.col(text_col)).alias("sig")
        ).filter(F.col("sig").isNotNull())

    # ------------------------------------------------------------ lifecycle

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        n_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        n_buckets: int = 32,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "MinHashSignatureStore":
        """One-time bucketed write of the corpus's signatures + band
        keys (the analogue of signing the full corpus once)."""
        import hashlib

        from raptor_rag_spark.sources.bucketed import write_bucketed

        if n_hashes % bands:
            raise ValueError(f"bands={bands} must divide n_hashes={n_hashes}")
        _validate_store_path(path)
        digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
        meta = {
            "n_hashes": int(n_hashes),
            "bands": int(bands),
            "shingle_n": int(shingle_n),
            "n_buckets": int(n_buckets),
            "id_col": id_col,
            "id_type": docs.schema[id_col].dataType.simpleString(),
            "text_col": text_col,
            "tables": {_SIGS: f"mh_sigs_{digest}", _BANDS: f"mh_bands_{digest}"},
            "applied_appends": ["base"],
            "compactions": [],
        }
        os.makedirs(path, exist_ok=True)
        store = cls(spark, path, meta)
        sig = store._sign(docs, id_col, text_col).withColumn("_aid", F.lit("base"))
        # localCheckpoint: band_keys re-reads sig; one kernel pass
        sig = sig.localCheckpoint(eager=False)
        write_bucketed(
            sig.select("id", "sig", "_aid"), meta["tables"][_SIGS], ("id",),
            n_buckets, sort_cols=("id",), path=store._dir(_SIGS),
        )
        bk = band_keys(sig, n_hashes, bands).withColumn("_aid", F.lit("base"))
        write_bucketed(
            bk.select("_bh", "id", "_aid"), meta["tables"][_BANDS], ("_bh",),
            n_buckets, sort_cols=("_bh",), path=store._dir(_BANDS),
        )
        store._commit_meta()
        return store

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MinHashSignatureStore":
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
        _sig: DataFrame | None = None,
    ) -> str:
        """O(new): append the batch's signatures and band keys tagged
        with a content-derived append id. Ledger committed LAST; a
        clean retry no-ops; a replay after a lost meta write self-heals
        at read time (see `_sigs` / `_bands`). ``_sig``: a precomputed
        checkpointed (id, sig) frame — ingest() signs the batch ONCE
        and threads it through append/match/within-batch so the Arrow
        kernel (the dominant CPU cost) runs a single pass."""
        id_col = id_col or self.meta["id_col"]
        text_col = text_col or self.meta["text_col"]
        self._heal()
        aid = append_id or "a-" + content_append_id(batch, [id_col, text_col])
        if aid in self.meta["applied_appends"]:
            return "already_applied"
        self._register()
        base = _sig if _sig is not None else self._sign(batch, id_col, text_col)
        sig = base.withColumn("_aid", F.lit(aid))
        if _sig is None:
            sig = sig.localCheckpoint(eager=False)
        (
            sig.select("id", "sig", "_aid").write.mode("append").format("parquet")
            .bucketBy(int(self.meta["n_buckets"]), "id").sortBy("id")
            .saveAsTable(self._table(_SIGS))
        )
        bk = band_keys(sig, self.n_hashes, self.bands).withColumn("_aid", F.lit(aid))
        (
            bk.select("_bh", "id", "_aid").write.mode("append").format("parquet")
            .bucketBy(int(self.meta["n_buckets"]), "_bh").sortBy("_bh")
            .saveAsTable(self._table(_BANDS))
        )
        self.meta["applied_appends"].append(aid)
        self._commit_meta()
        for which in (_SIGS, _BANDS):
            self.spark.catalog.refreshTable(self._table(which))
        return aid

    def match_batch(
        self,
        batch: DataFrame,
        threshold: float = 0.8,
        exclude_aids: set[str] | None = None,
        id_col: str | None = None,
        text_col: str | None = None,
        _sig: DataFrame | None = None,
    ) -> DataFrame:
        """(batch_id, store_id, est_jaccard) — batch docs whose
        signature agrees with a stored signature on >= threshold of
        slots, via LSH band-bucket candidates. `exclude_aids` skips
        store rows of those appends (the ingest path excludes the
        batch's own freshly-appended rows). A doc id present in both
        batch and store matches itself at 1.0 — a recrawl carrying
        identical content IS a duplicate of the stored copy."""
        id_col = id_col or self.meta["id_col"]
        text_col = text_col or self.meta["text_col"]
        self._heal()
        bsig = _sig if _sig is not None else self._sign(
            batch, id_col, text_col
        ).localCheckpoint(eager=False)  # kernel runs once
        bb = band_keys(bsig, self.n_hashes, self.bands)
        sb, ss = self._bands(), self._sigs()
        if exclude_aids:
            ex = sorted(exclude_aids)
            sb = sb.filter(~F.col("_aid").isin(ex))
            ss = ss.filter(~F.col("_aid").isin(ex))
        cand = (
            sb.join(bb.withColumnRenamed("id", "batch_id"), "_bh")
            .select(F.col("id").alias("store_id"), "batch_id")
            .distinct()
        )
        est = (
            cand.join(ss.withColumnRenamed("id", "store_id"), "store_id")
            .join(
                bsig.select(F.col("id").alias("batch_id"), F.col("sig").alias("_bsig")),
                "batch_id",
            )
            .withColumn(
                "est_jaccard",
                F.size(F.filter(F.zip_with("sig", "_bsig", lambda x, y: x == y), lambda v: v))
                / F.lit(float(self.n_hashes)),
            )
            # max across multiple store sigs of a re-appended id;
            # threshold the UNROUNDED max (matching est_pairs_from_sigs'
            # order of operations) — rounding first can flip boundary
            # pairs whenever k/n_hashes doesn't terminate in 6 decimals.
            # The returned est_jaccard is the UNROUNDED value too, so
            # `est_jaccard >= threshold` holds row-for-row on the output
            # (re-applying the filter downstream is a no-op); the
            # oracle-pinned est_pairs_from_sigs rounds its output for
            # cross-engine hash stability, which is why its boundary
            # rows can DISPLAY below the threshold that admitted them.
            .groupBy("batch_id", "store_id")
            .agg(F.max("est_jaccard").alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
        )
        return est

    def scrub_batch(
        self,
        batch: DataFrame,
        threshold: float = 0.8,
        exclude_aids: set[str] | None = None,
        within_batch: bool = False,
        id_col: str | None = None,
        text_col: str | None = None,
        _sig: DataFrame | None = None,
    ) -> DataFrame:
        """Batch rows whose content is NOT a near-duplicate of anything
        already in the store (est_jaccard >= threshold). With
        `within_batch=True`, a batch doc matching a SMALLER-id batch
        doc also drops (greedy keep-min-id — one LSH pass via the
        shared `dedup.est_pairs_from_sigs` stage, not a full transitive
        clustering; `graph.connected_components` exists for canonical
        cluster collapse when needed).

        LAZINESS: the plan reads the LIVE tables at action time —
        evaluate it before the next append/ingest or later batches'
        rows inflate the match set; `ingest()` is the safe composed
        call (append first, then exclude the batch's own aid)."""
        from raptor_rag_spark.operators.dedup import est_pairs_from_sigs

        id_col = id_col or self.meta["id_col"]
        text_col = text_col or self.meta["text_col"]
        if _sig is None and within_batch:  # one kernel pass for both uses
            _sig = self._sign(batch, id_col, text_col).localCheckpoint(eager=False)
        drops = self.match_batch(
            batch, threshold, exclude_aids, id_col, text_col, _sig=_sig
        ).select(F.col("batch_id").alias(id_col)).distinct()
        if within_batch:
            inner = (
                est_pairs_from_sigs(_sig, self.n_hashes, self.bands, threshold)
                .select(F.col("id_b").alias(id_col))
                .distinct()
            )
            drops = drops.unionByName(inner).distinct()
        return batch.join(drops, id_col, "left_anti")

    def ingest(
        self, batch: DataFrame, threshold: float = 0.8, within_batch: bool = True
    ) -> DataFrame:
        """The per-crawl-day call: append the batch's signatures FIRST
        (so the returned plan is lazily safe), then scrub against
        store-minus-this-batch. Evaluate each ingest's result before
        the next ingest. Returns the surviving batch rows.

        The exclusion aid is computed HERE (not taken from append's
        return): on a clean retry append() reports already_applied,
        and excluding nothing would let the batch's own earlier-
        appended rows self-match at 1.0 and scrub every doc — a retry
        must return the same survivors as the first call. The batch is
        signed ONCE (checkpointed) and the frame threads through
        append, the store match, and the within-batch pass."""
        id_col, text_col = self.meta["id_col"], self.meta["text_col"]
        aid = "a-" + content_append_id(batch, [id_col, text_col])
        sig = self._sign(batch, id_col, text_col).localCheckpoint(eager=False)
        self.append(batch, append_id=aid, _sig=sig)
        return self.scrub_batch(
            batch, threshold, exclude_aids={aid},
            within_batch=within_batch, _sig=sig,
        )

    # ------------------------------------------------------------ upkeep

    def compact(self) -> dict:
        """Fold replay-duplicated rows into one row per (key, _aid) and
        the accumulated append files into the bucketed layout's one
        file set per table. Each table swaps independently under the
        heal protocol — safe, because compaction never changes logical
        content (there is no cross-table invariant to tear). The append
        ledger survives, so retries of merged appends still no-op."""
        from raptor_rag_spark.sources.bucketed import write_bucketed

        self._heal()
        self._register()
        token = "c%d" % (len(self.meta["compactions"]) + 1)
        stats = {}
        plans = {
            _SIGS: (self._sigs().select("id", "sig", "_aid"), ("id",)),
            _BANDS: (self._bands().select("_bh", "id", "_aid"), ("_bh",)),
        }
        for which, (merged, key) in plans.items():
            table = self._table(which)
            before = self.spark.table(table).count()
            want = merged.count()
            tmp = table + "_compacting"
            write_bucketed(
                merged, tmp, key, int(self.meta["n_buckets"]),
                sort_cols=key, path=self._dir(which) + ".compacting",
            )
            after = self.spark.table(tmp).count()
            self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
            if after != want:  # refuse to swap in a lossy rewrite
                import shutil

                shutil.rmtree(self._dir(which) + ".compacting", ignore_errors=True)
                raise RuntimeError(
                    f"{which} compaction row mismatch: {after} vs {want} — not swapping"
                )
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
            swap_live_dir(self._dir(which))
            stats[which] = {"rows_before": before, "rows_after": after}
        self.meta["compactions"].append(token)
        self._commit_meta()
        self._register()
        return stats
