"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its corpus is one document); these are
the engine-side additions a 100 TB web-text pipeline needs. All
candidate generation is equi-join shaped (hash-partitionable, AQE
skew-split applies); Python appears only in the minhash/simhash
signature kernels (Arrow-batched).

Scale notes:
- exact dedup = groupBy(hash) — map-side partial agg, one shuffle.
- minhash-LSH: signatures are a batch-vectorized Arrow kernel (one
  fnv1a_64_batch + reduceat per batch); band buckets shuffle once on
  (band_idx, band_hash); candidate pairs are verified with the exact
  shingle-set Jaccard (texts joined per candidate), never all-pairs.
- ngram-jaccard: pure JVM (shingle explode + self-equi-join);
  hot shingles (stopword runs) are the skew risk — we cap posting
  lists (drop shingles appearing in > max_df docs, standard practice).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raptor_rag_spark.tokenizer import _TOKEN_RE

# ---------------------------------------------------------------- exact

# explicit whitespace class: Java \s includes \x0B, RE2 (DuckDB) \s does
# not — spelled out so Spark and the oracle normalize identically
# (same trap the tokenizer guards against, tokenizer.py TOKEN_PATTERN)
WS_CLASS = r"[ \t\n\r\f\x0B]"


def normalized_text(col: Column) -> Column:
    """lower + collapse runs of whitespace + trim — the usual exact-dup
    canonical form."""
    return F.trim(F.regexp_replace(F.lower(col), WS_CLASS + "+", " "))


def _norm_key(norm: Column) -> Column:
    """Shuffle key for exact dedup: a 160-bit hash (md5 + xxhash64 + len)
    of the normalized text instead of the text itself — at 100 TB the
    group key would otherwise BE the document. Collision probability at
    10^12 docs is ~10^-15; the composite key keeps it negligible."""
    return F.struct(
        F.md5(norm).alias("h128"),
        F.xxhash64(norm).alias("h64"),
        F.length(norm).alias("len"),
    )


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(norm_text groups) -> keep_id = min id, n_dups. One shuffle of
    (hash-key, id) pairs — the document text never enters the shuffle."""
    return (
        df.select(
            F.col(id_col), _norm_key(normalized_text(F.col(text_col))).alias("_k")
        )
        .groupBy("_k")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rows whose id is the group representative (min id per norm text)."""
    keep = (
        df.select(
            F.col(id_col), _norm_key(normalized_text(F.col(text_col))).alias("_k")
        )
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ------------------------------------------------------------- shingles


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of word n-grams — pure JVM (split + sequence + transform).
    Docs shorter than n words yield the whole text as one shingle:
    F.get (0-based) returns NULL past the array end even under ANSI
    mode (element_at would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT on
    any short doc) and concat_ws skips NULLs.

    NOTE: Catalyst evaluates higher-order functions INTERPRETED (no
    codegen) — measured ~10 s for 260k shingles at sf0.1, dwarfing the
    md5 + 64-way min aggregate downstream. Hot paths use
    make_word_shingles_udf (Arrow kernel, byte-identical output,
    equality pytest-asserted); this expression stays as the reference
    semantics and for oracle documentation."""
    words = F.split(normalized_text(col), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    arr = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get(words, (i + j).cast("int")) for j in range(n)]
        ),
    )
    # NULL text -> NULL array (not ['']): explode then drops the doc,
    # matching the Arrow kernel, minhash_signatures_jvm's null-sig left
    # join, and the DuckDB oracle's NULL propagation
    return F.when(col.isNotNull(), arr)


def make_word_shingles_udf(n: int = 3):
    """Arrow twin of :func:`word_shingles` — same output bytes, ~10x
    faster (plain Python string ops beat interpreted Catalyst HOFs).
    Mirrors normalized_text exactly: lower, collapse [ \\t\\n\\r\\f\\x0B]
    runs to one space, strip SPACES only (JVM trim strips ' ' only, so
    .strip(' ') here, not .strip()), split on single space."""
    import re

    ws_run = re.compile(r"[ \t\n\r\f\x0B]+")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def sh(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            out = []
            for t in series:
                if t is None:
                    out.append(None)
                    continue
                words = ws_run.sub(" ", t.lower()).strip(" ").split(" ")
                k = max(len(words) - (n - 1), 1)
                out.append([" ".join(words[i : i + n]) for i in range(k)])
            yield pd.Series(out)

    return sh


DEFAULT_MAX_DF = 5000


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """All pairs (a < b) with word-n-gram Jaccard >= threshold.

    Pure JVM: distinct shingles explode -> self-equi-join on shingle ->
    |A∩B| per pair -> Jaccard. ``max_df`` drops shingles occurring in
    more than that many docs (stopword-run skew guard: ONE shingle in D
    docs yields D^2/2 candidate pairs, so the cap is on by default —
    pass None to disable; note a pair sharing only dropped shingles is
    then missed, the standard cap trade-off).
    """
    shingler = make_word_shingles_udf(n)  # Arrow kernel: HOFs are interpreted
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingler(F.col(text_col)))).alias("sh"))
        .distinct()
    )
    if max_df is not None:
        # document frequency as a whole-partition window count: ONE
        # shuffle on sh (vs a groupBy-count pass + a semi-join back,
        # which evaluates the shingle explode twice)
        from pyspark.sql import Window

        sh = (
            sh.withColumn("_df", F.count("*").over(Window.partitionBy("sh")))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", F.round("jaccard", 6).alias("jaccard"))


# -------------------------------------------------------------- minhash

_P31 = (1 << 31) - 1


def _minhash_params(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(1234)
    a = rng.randint(1, _P31, size=n_hashes).astype(np.uint64)
    b = rng.randint(0, _P31, size=n_hashes).astype(np.uint64)
    return a, b


def _shingle_set(text: str, n: int) -> list[str]:
    words = normalized_words(text)
    if len(words) <= n:
        return [" ".join(words)] if words else [""]
    return list({" ".join(words[i : i + n]) for i in range(len(words) - n + 1)})


def normalized_words(text: str) -> list[str]:
    return [w for w in text.lower().split() if w]


def make_minhash_udf(n_hashes: int = 64, shingle_n: int = 3):
    """Minhash signature kernel, vectorized across the WHOLE Arrow
    batch: every document's shingles are hashed in one fnv1a_64_batch
    call (byte-position-vectorized FNV), the universal-family matrix is
    one (n_shingles x n_hashes) numpy expression, and per-document mins
    come from np.minimum.reduceat over the flat matrix — no per-row
    Python beyond shingling itself."""
    from raptor_rag_spark.functions.hashing import fnv1a_64_batch

    a, b = _minhash_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            texts = series.tolist()
            sh_lists = [
                None if t is None else _shingle_set(t, shingle_n) for t in texts
            ]
            flat = [s for lst in sh_lists if lst is not None for s in lst]
            out: list = [None] * len(texts)
            if flat:
                base = fnv1a_64_batch(flat) % np.uint64(_P31)
                M = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_P31)
                counts = [len(lst) for lst in sh_lists if lst is not None]
                offs = np.zeros(len(counts), dtype=np.int64)
                np.cumsum(counts[:-1], out=offs[1:])
                mins = np.minimum.reduceat(M, offs, axis=0)
                k = 0
                for i, lst in enumerate(sh_lists):
                    if lst is None:
                        continue
                    out[i] = [int(v) for v in mins[k]]
                    k += 1
            yield pd.Series(out)

    return minhash


def make_exact_jaccard_udf(shingle_n: int = 3):
    """(text_a, text_b) -> exact shingle-set Jaccard, Arrow-batched.
    Used to verify LSH candidate pairs — candidates are rare, so
    shipping the two texts to one kernel is cheap."""

    @F.pandas_udf(T.DoubleType())
    def jacc(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(ta, tb):
            if a is None or b is None:
                out.append(None)
                continue
            sa, sb = set(_shingle_set(a, shingle_n)), set(_shingle_set(b, shingle_n))
            union = len(sa | sb)
            out.append(len(sa & sb) / union if union else 0.0)
        return pd.Series(out, dtype="float64")

    return jacc


def est_pairs_from_sigs(
    sig: DataFrame, n_hashes: int, bands: int, min_est: float
) -> DataFrame:
    """(id_a, id_b, est_jaccard) with id_a < id_b and est >= min_est —
    the LSH candidate + signature-agreement estimate stage over a
    precomputed (id, sig) frame. The ONE implementation of this shape:
    minhash_dedup_pairs wraps it for whole-corpus batch dedup and
    MinHashSignatureStore uses it for within-batch drops at ingest, so
    the band/estimate logic cannot drift between them."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for bi in range(bands):
        band = F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
        band_cols.append(F.struct(F.lit(bi).alias("band_idx"), F.hash(band).alias("band_hash")))
    banded = sig.select("id", F.explode(F.array(*band_cols)).alias("b")).select(
        "id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band_idx", "band_hash"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sig_a = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
            / F.lit(float(n_hashes)),
        )
        .filter(F.col("est_jaccard") >= min_est)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    verify: bool = True,
    prefilter_slack: float = 0.15,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: sign -> band -> bucket equi-join ->
    verify. With ``verify=True`` (default) candidate pairs are checked
    with the EXACT shingle-set Jaccard (texts joined back per pair —
    candidates are rare, so this is cheap) and filtered on the true
    value; ``est_jaccard`` (fraction of agreeing signature hashes) is
    kept alongside. With ``verify=False`` the output is the LSH
    ESTIMATE only, filtered on est_jaccard.

    ``prefilter_slack``: before the (text-join) exact verify,
    candidates with est_jaccard < threshold - slack are dropped — the
    estimator's std at 64 hashes is ~sqrt(J(1-J)/64) <= 0.063, so 0.15
    (~2.4 sigma) cuts the verify fan-in with negligible recall effect;
    pass float('inf')-like slack (e.g. 1.0) to disable."""
    texts = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
    sig = df.select(
        F.col(id_col).alias("id"),
        make_minhash_udf(n_hashes, shingle_n)(F.col(text_col)).alias("sig"),
    ).filter(F.col("sig").isNotNull())
    if not verify:
        return est_pairs_from_sigs(sig, n_hashes, bands, threshold)
    # pre-filter BEFORE the two text joins: est is already computed, so
    # this costs one comparison and saves the text shuffle for the
    # (majority) band-collision pairs far below threshold
    est = est_pairs_from_sigs(sig, n_hashes, bands, threshold - prefilter_slack)
    jacc = make_exact_jaccard_udf(shingle_n)
    verified = (
        est.join(texts.select(F.col("id").alias("id_a"), F.col("_txt").alias("_ta")), "id_a")
        .join(texts.select(F.col("id").alias("id_b"), F.col("_txt").alias("_tb")), "id_b")
        .withColumn("jaccard", F.round(jacc(F.col("_ta"), F.col("_tb")), 6))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "est_jaccard", "jaccard")


# -------------------------------------------------------------- simhash


def make_simhash_udf():
    """Per-row (shuffle-free) simhash kernel, vectorized across the
    Arrow batch: all tokens hashed in one fnv1a_64_batch call, the
    (n_tokens x 64) ±1 bit matrix reduced per document with
    np.add.reduceat, signs packed with one dot product. (The JVM
    aggregate variant textstats.simhash_signatures is the oracle-able
    twin; this one never shuffles tokens.)"""
    from raptor_rag_spark.functions.hashing import fnv1a_64_batch

    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)

    @F.pandas_udf(T.LongType())
    def simhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            texts = series.tolist()
            tok_lists = [
                None if t is None else _TOKEN_RE.findall(t.lower()) for t in texts
            ]
            out: list = [None] * len(texts)
            flat = [tok for lst in tok_lists if lst for tok in lst]
            accs = None
            if flat:
                h = fnv1a_64_batch(flat)
                bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                pm = bits * 2 - 1  # ±1 per bit
                counts = [len(lst) for lst in tok_lists if lst]
                offs = np.zeros(len(counts), dtype=np.int64)
                np.cumsum(counts[:-1], out=offs[1:])
                accs = np.add.reduceat(pm, offs, axis=0)
            k = 0
            for i, lst in enumerate(tok_lists):
                if lst is None:
                    continue
                if not lst:  # no tokens: acc all zeros -> value 0
                    out[i] = 0
                    continue
                val = int((accs[k] > 0).astype(np.uint64) @ weights)
                k += 1
                out[i] = val - (1 << 64) if val >= 1 << 63 else val
            yield pd.Series(out, dtype="Int64")

    return simhash


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup: 64-bit signature; candidates share at least one
    of ``blocks`` 16-bit blocks (pigeonhole: hamming <= blocks-1
    guarantees a shared block); verify with exact popcount."""
    sig = df.select(
        F.col(id_col).alias("id"), make_simhash_udf()(F.col(text_col)).alias("sig")
    ).filter(F.col("sig").isNotNull())
    width = 64 // blocks
    mask = (1 << width) - 1
    block_cols = [
        F.struct(
            F.lit(bi).alias("block_idx"),
            F.shiftrightunsigned(F.col("sig"), bi * width).bitwiseAND(F.lit(mask)).alias("block_val"),
        )
        for bi in range(blocks)
    ]
    blocked = sig.select("id", "sig", F.explode(F.array(*block_cols)).alias("b")).select(
        "id", "sig", F.col("b.block_idx").alias("block_idx"), F.col("b.block_val").alias("block_val")
    )
    cand = (
        blocked.alias("l")
        .join(blocked.alias("r"), ["block_idx", "block_val"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


SIMHASH_MAX_BLOCK_DF = 1000


def simhash_pairs_jvm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    max_block_df: int = SIMHASH_MAX_BLOCK_DF,
    precomputed_sig: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) near-dup pairs over the pure-JVM 48-bit
    simhash (textstats.simhash_signatures, md5-prefix hash) — the
    oracle-able twin of simhash_pairs (whose FNV kernel DuckDB can't
    reproduce). Pigeonhole: with ``blocks`` equal-width blocks, any
    pair at hamming <= blocks-1 shares at least one block, so the
    candidate join on (block_idx, block_val) is exhaustive for
    max_hamming <= blocks-1. ``max_block_df`` caps hot buckets (e.g.
    simhash 0 from empty docs) exactly like ngram max_df — the skew
    guard that keeps the self-join from going quadratic on a 100 TB
    corpus; the oracle mirrors the cap."""
    from pyspark.sql.window import Window

    from raptor_rag_spark.operators.textstats import SIMHASH_BITS, simhash_signatures

    if max_hamming > blocks - 1:
        raise ValueError("pigeonhole requires max_hamming <= blocks-1")
    # materialize signatures ONCE: the 48-column bit-sum aggregate
    # otherwise re-executes on BOTH sides of the candidate self-join
    # (plus the bucket-count window) — measured 60 s -> ~5 s at sf0.1.
    # ``precomputed_sig`` lets a caller that already materialized the
    # signature table (e.g. the contract query's sig branch) share it.
    sig = (
        precomputed_sig
        if precomputed_sig is not None
        else simhash_signatures(df, id_col=id_col, text_col=text_col).localCheckpoint(
            eager=False
        )
    )
    width = SIMHASH_BITS // blocks
    mask = (1 << width) - 1
    block_cols = [
        F.struct(
            F.lit(bi).alias("block_idx"),
            F.shiftrightunsigned(F.col("simhash"), bi * width)
            .bitwiseAND(F.lit(mask))
            .alias("block_val"),
        )
        for bi in range(blocks)
    ]
    blocked = (
        sig.select(
            F.col(id_col).alias("id"),
            F.col("simhash"),
            F.explode(F.array(*block_cols)).alias("b"),
        )
        .select("id", "simhash", F.col("b.block_idx").alias("block_idx"),
                F.col("b.block_val").alias("block_val"))
        .withColumn(
            "_c", F.count("*").over(Window.partitionBy("block_idx", "block_val"))
        )
        .filter(F.col("_c") <= max_block_df)
        .drop("_c")
    )
    cand = (
        blocked.alias("l")
        .join(blocked.alias("r"), ["block_idx", "block_val"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sig_a"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ----------------------------------------------- embedding near-dup


_NEARDUP_SCHEMA = "id_a long, id_b long, cosine double"


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    min_cosine: float = 0.95,
    n_blocks: int | None = None,
) -> DataFrame:
    """ALL pairs (a < b) with cosine similarity >= min_cosine — exact,
    fully distributed (no driver collect anywhere in the plan).

    Physical strategy — blocked all-pairs: rows are hashed into
    ``n_blocks`` blocks; each row is replicated once per counterpart
    block, keyed by the unordered block pair (i<=j), and one
    ``applyInPandas`` group per block pair does a chunked BLAS matmul
    between the two blocks, emitting only qualifying pairs. Shuffle
    volume is N * n_blocks rows; executor memory per group is two
    blocks (N/n_blocks rows each) plus a bounded sims chunk — pick
    n_blocks so a block fits in executor memory (N=10^9 x 64-dim f64 at
    n_blocks=1024 is ~500 MB/block). A Catalyst higher-order-fn cosine
    over the crossJoin is ~1000x slower per pair (measured; see
    NOTES_r1.md §2) and the crossJoin itself is O(N^2) rows — this
    never materializes non-qualifying pairs. For metric-pruned (not
    all-pairs-exact) search at scale, see
    similarity.self_similarity_pairs, which prunes by tile co-location.
    """
    if n_blocks is None:
        # enough block pairs (~b^2/2) to cover the cluster's cores
        par = df.sparkSession.sparkContext.defaultParallelism
        n_blocks = max(4, int((2.5 * par) ** 0.5))
    b = int(n_blocks)

    # the id is cast to long for the numpy kernel: a non-integral id
    # column would silently cast to NULL, collapse every row into the
    # xxhash64(NULL) block, and crash the kernel on None ids — fail
    # loudly up front instead
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"embedding_neardup_pairs needs an integral id column; "
            f"{id_col!r} is {id_type}. Derive one first, e.g. "
            f"xxhash64({id_col}) or row_number, and join back after."
        )

    base = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(emb_col).alias("_emb")
    ).withColumn("_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(b)).cast("int"))
    # replicate each row once per counterpart block; key = unordered pair
    rep = base.withColumn(
        "_other", F.explode(F.array(*[F.lit(i) for i in range(b)]))
    ).select(
        F.least("_blk", "_other").alias("_ka"),
        F.greatest("_blk", "_other").alias("_kb"),
        "_id",
        "_emb",
        "_blk",
    )

    def pair_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ka, kb = int(key[0]), int(key[1])
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["_emb"]), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        blk = pdf["_blk"].to_numpy(dtype=np.int64)
        if ka == kb:
            a_idx = b_idx = np.arange(len(ids))
        else:
            a_idx = np.nonzero(blk == ka)[0]
            b_idx = np.nonzero(blk == kb)[0]
        out_a, out_b, out_c = [], [], []
        # chunk the matmul so the sims slab stays ~256 MB regardless of
        # block size
        chunk = max(1, (1 << 25) // max(len(b_idx), 1))
        idb, matb, nrmb = ids[b_idx], mat[b_idx], nrm[b_idx]
        for s in range(0, len(a_idx), chunk):
            sel = a_idx[s : s + chunk]
            sims = (mat[sel] @ matb.T) / np.outer(nrm[sel], nrmb)
            mask = sims >= min_cosine
            if ka == kb:
                # same block on both sides: keep each unordered pair once
                mask &= ids[sel][:, None] < idb[None, :]
            ii, jj = np.nonzero(mask)
            if len(ii):
                ia, ib = ids[sel][ii], idb[jj]
                # blocks are disjoint when ka != kb: the full cross
                # covers each unordered pair exactly once, in either
                # id order — canonicalize to id_a < id_b
                out_a.append(np.minimum(ia, ib))
                out_b.append(np.maximum(ia, ib))
                out_c.append(np.round(sims[ii, jj], 6))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return rep.groupBy("_ka", "_kb").applyInPandas(pair_kernel, _NEARDUP_SCHEMA)


def minhash_signatures_jvm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) — pure JVM minhash over the md5-prefix60
    base hash: distinct shingles explode (word_shingles), one hash
    aggregate with ``n_hashes`` min() columns of the universal family
    ((base % P) * a_i + b_i) % P. Exactly mirrorable in DuckDB SQL
    (the Arrow-kernel variant make_minhash_udf is the no-shuffle twin
    on the FNV base hash; same family parameters). Products stay under
    2^62, so ANSI-safe."""
    from raptor_rag_spark.operators.textstats import md5_prefix60

    a, b = _minhash_params(n_hashes)
    shingler = make_word_shingles_udf(shingle_n)  # Arrow twin of word_shingles
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingler(F.col(text_col)))).alias("_sh"),
    ).withColumn("_h", md5_prefix60(F.col("_sh")) % F.lit(_P31))
    aggs = [
        F.min((F.col("_h") * F.lit(int(a[i])) + F.lit(int(b[i]))) % F.lit(_P31)).alias(
            f"_m{i}"
        )
        for i in range(n_hashes)
    ]
    acc = sh.groupBy(id_col).agg(*aggs)
    sig = F.array(*[F.col(f"_m{i}") for i in range(n_hashes)])
    out = acc.select(F.col(id_col), sig.alias("sig"))
    # NULL-text docs have no shingle rows: keep them with a null sig
    return df.select(id_col).join(out, id_col, "left")


def shingle_sets_jvm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """(id, shingles array<string>) — DISTINCT word n-grams per doc as
    one JVM array column (word_shingles + array_distinct). The exact-
    Jaccard verify over candidate pairs is then pure array_intersect
    arithmetic, bit-identical to DuckDB's list_intersect."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(make_word_shingles_udf(shingle_n)(F.col(text_col))).alias("shingles"),
    )


def minhash_dedup_pairs_jvm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    prefilter_slack: float = 0.15,
    precomputed_sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, every stage pure JVM and hence
    mirrorable in ANSI-ish SQL (the DuckDB oracle for the
    ``minhash_pairs`` contract query): md5-prefix60 signatures
    (minhash_signatures_jvm) -> value-banding (band key = the band's
    literal values, NOT an engine hash, so both engines bucket
    identically) -> bucket equi-join -> est_jaccard pre-filter ->
    EXACT shingle-set Jaccard via array_intersect.

    Same shuffle shape as minhash_dedup_pairs (the Arrow-kernel twin
    used in production): bands explode once, candidates equi-join on
    the band key, exact verify touches only surviving pairs. The band
    key here is rows_per_band longs instead of one 32-bit hash —
    slightly wider shuffle rows, bought for oracle portability.
    """
    rows_per_band = n_hashes // bands
    sig = (
        precomputed_sig
        if precomputed_sig is not None
        else minhash_signatures_jvm(df, id_col, text_col, n_hashes, shingle_n)
    )
    # pin the signatures: the n_hashes-column min() aggregate otherwise
    # re-executes on the banding pass AND both sides of the est join
    # (3x the most expensive stage; same discipline as simhash_pairs_jvm)
    sig = sig.filter(F.col("sig").isNotNull()).select(
        F.col(id_col).alias("id"), "sig"
    ).localCheckpoint(eager=False)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band).alias("band_key"),
        )
        for bi in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_cols)).alias("b")).select(
        "id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band_idx", "band_key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    est = (
        pairs.join(sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
            / F.lit(float(n_hashes)),
        )
        .filter(F.col("est_jaccard") >= threshold - prefilter_slack)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        # pinned: est drives the verify stage twice (the _sa and _sb
        # joins) AND bounds the doc set whose shingles are computed
        .localCheckpoint(eager=False)
    )
    # compute verify shingles ONLY for docs that appear in a candidate
    # pair — the semi join runs below the shingle projection, so the
    # (expensive) shingling touches surviving pairs' texts instead of
    # the whole corpus, twice
    pair_ids = (
        est.select(F.col("id_a").alias(id_col))
        .unionByName(est.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = shingle_sets_jvm(
        df.join(pair_ids, id_col, "left_semi"), id_col, text_col, shingle_n
    )
    verified = (
        est.join(sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("_sa")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("_sb")), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("_sa", "_sb")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("_sa") + F.size("_sb") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "est_jaccard", "n_common", "jaccard")


# ------------------------------------------------- decontamination

def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose text covers
    >= ``threshold`` of some benchmark item's word n-grams — the
    standard train/test-overlap check for LLM training corpora
    (n-gram collision method, public: GPT-3 App. C / PaLM App. — both
    use 8-13-word n-gram overlap against eval sets).

    Returns one row per contaminated (doc, bench) pair:
    (doc_id, bench_id, n_common, sz_bench, overlap_frac), where
    overlap_frac = |shingles(doc) ∩ shingles(bench)| / |shingles(bench)|.

    Scale shape (100 TB corpus, eval sets ~10^3..10^6 items): the
    benchmark's distinct-shingle table is tiny next to the corpus, so
    it BROADCASTS — the corpus side explodes shingles map-side and the
    probe is a broadcast hash join with NO corpus shuffle; the only
    shuffle is the (doc_id, bench_id) partial-agg count, whose rows
    exist only where a doc actually shares an n-gram. n >= 8 keeps
    shingles near-unique (no hot-key caps needed, mirroring the
    published method); shorter n reintroduces stopword-run skew — use
    ngram_jaccard_pairs' max_df approach if you must go short.
    """
    shingler = make_word_shingles_udf(n)
    # (id, sh) rows are unique by construction: array_distinct dedups
    # within an item and ids are unique per row (caller contract, same
    # as every dedup op here) — no global distinct, which would shuffle
    # the full corpus shingle stream before the broadcast join
    bench_sh = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(shingler(F.col(bench_text_col)))).alias("sh"),
    )
    # |shingles(bench)| in one map pass — no explode/shuffle
    sizes = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.size(F.array_distinct(shingler(F.col(bench_text_col))))
        .cast("long")
        .alias("sz_bench"),
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
        sizes = F.broadcast(sizes)
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingler(F.col(text_col)))).alias("sh"),
    )
    hits = (
        doc_sh.join(bench_sh, "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        hits.join(sizes, "bench_id")
        .withColumn(
            "overlap_frac", F.col("n_common") / F.col("sz_bench").cast("double")
        )
        .filter(F.col("overlap_frac") >= threshold)
    )
    return out.select(
        "doc_id",
        "bench_id",
        "n_common",
        "sz_bench",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )


# --------------------------------------------------- recrawl collapse

def keep_latest(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Recrawl collapse: keep the newest row per key (url) — the
    web-crawl ingest dedup that precedes content dedup (a url crawled
    K times contributes ONE page, the latest fetch).

    Window row_number over (key) ordered by ts DESC then ``tie_cols``
    ASC (deterministic under equal timestamps). Plan: one hash shuffle
    on the key + WindowGroupLimit — Spark pushes the rank<=1 limit
    map-side (partial top-1 per key before the shuffle), so the
    shuffle carries at most one row per (key, input partition), never
    the full recrawl history. No global sort.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).desc()] + [F.col(c).asc() for c in (tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    rn = "_rn"
    while rn in df.columns:  # never clobber a caller column
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_text: bool = False,
) -> DataFrame:
    """C4-style corpus-wide exact paragraph (line) dedup: every
    non-blank line that occurs anywhere else in the corpus is kept
    ONLY at its first occurrence — first = smallest (id, line_idx) —
    and dropped everywhere else; blank lines never participate (they
    are layout, not content). The public C4 pipeline (Raffel et al.
    2020, §2.2) removes repeated three-sentence spans the same way;
    lines are the Dolma/RefinedWeb variant.

    Output: one row per input doc with non-NULL text — (id_col,
    n_lines, n_kept, text_md5) where text_md5 hashes the doc rebuilt
    from its kept lines joined with "\\n" (NULL when every line was
    dropped). NULL-text docs yield no lines and are absent from the
    output entirely (same as the SQL mirror: split(NULL) explodes to
    nothing) — filter or impute NULLs upstream if they must survive.

    Scale shape (three partial-agg shuffles, no all-pairs, text
    shuffles at line granularity):
      1. winner per distinct line: groupBy(line) -> min(struct(id,
         idx)). Map-side combine reduces each partition to one row per
         DISTINCT line before the exchange, so the corpus's boilerplate
         skew (one hot nav-bar line in 10^9 docs) shuffles as one row
         per partition, not 10^9.
      2. kept-marking join on the line value — same key as (1), and
         the winner side carries (line, id, idx) only. A corpus-hot
         line makes this key skewed on the CONTENT side; it is an
         inner shuffle join with one winner row per key, exactly the
         shape AQE's skew-join split handles (the single winner row
         replicates across the split partitions) — keep
         spark.sql.adaptive.skewJoin enabled at scale.
      3. per-doc reassembly agg on id_col (sort_array over struct
         (idx, line) -> concat_ws), partial too.
    """
    lines = _explode_lines(df, id_col, text_col)
    blank = F.trim(F.col("line")) == ""
    content = lines.filter(~blank)
    winners = content.groupBy("line").agg(
        F.min(F.struct(F.col(id_col), F.col("line_idx"))).alias("_first")
    )
    kept_content = (
        content.join(winners, "line")
        .filter(
            (F.col(f"_first.{id_col}") == F.col(id_col))
            & (F.col("_first.line_idx") == F.col("line_idx"))
        )
        .drop("_first")
    )
    kept = kept_content.unionByName(lines.filter(blank))
    return _reassemble_lines(lines, kept, id_col, return_text, text_col)


_FRAC_DEFAULT = object()  # sentinel: min_docs overrides the default frac


def drop_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float | None = _FRAC_DEFAULT,  # type: ignore[assignment]
    min_docs: int | None = None,
    return_text: bool = False,
) -> DataFrame:
    """Document-frequency boilerplate removal (the RefinedWeb/Dolma
    complement of `dedup_paragraphs`): a non-blank line appearing in at
    least `min_docs` distinct docs (or `min_doc_frac` of the corpus) is
    template chrome — nav bars, footers, cookie banners — and is
    dropped from EVERY doc, first occurrence included (first-occurrence
    dedup would still train on one copy per distinct banner). Blank
    lines never participate. Same output shape (and NULL-text-doc
    absence) as dedup_paragraphs.

    Scale shape: line doc-frequency = two partial-agg shuffles — the
    (line, id) distinct collapses a hot line to one row per (doc,
    partition) map-side, then the per-line count is one row per
    distinct line; the threshold scalar is a 1-row broadcast (no
    driver collect); kept-marking joins on the line key; reassembly as
    in dedup_paragraphs. No all-pairs anywhere; the hot-line skew this
    op exists for is exactly what the partial aggs absorb.
    """
    if min_doc_frac is _FRAC_DEFAULT:
        min_doc_frac = None if min_docs is not None else 0.05
    if (min_doc_frac is None) == (min_docs is None):
        raise ValueError("pass exactly one of min_doc_frac / min_docs")
    lines = _explode_lines(df, id_col, text_col)
    blank = F.trim(F.col("line")) == ""
    content = lines.filter(~blank)
    doc_freq = (
        content.select("line", id_col)
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("_ndocs"))
    )
    if min_docs is not None:
        if min_docs < 2:
            raise ValueError(f"min_docs must be >= 2, got {min_docs}")
        thr = F.lit(int(min_docs))
        freq_thr = doc_freq.withColumn("_thr", thr)
    else:
        if not (0.0 < min_doc_frac <= 1.0):
            raise ValueError(f"min_doc_frac must be in (0, 1], got {min_doc_frac}")
        total = df.select(F.countDistinct(id_col).alias("_total"))
        freq_thr = doc_freq.join(F.broadcast(total)).withColumn(
            "_thr",
            F.greatest(F.ceil(F.col("_total") * F.lit(min_doc_frac)), F.lit(2)),
        )
    boiler = freq_thr.filter(F.col("_ndocs") >= F.col("_thr")).select("line")
    kept_content = content.join(boiler, "line", "left_anti")
    kept = kept_content.unionByName(lines.filter(blank))
    return _reassemble_lines(lines, kept, id_col, return_text, text_col)


def _explode_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )


def _reassemble_lines(
    lines: DataFrame,
    kept: DataFrame,
    id_col: str,
    return_text: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """(id, n_lines, n_kept, text_md5 | text): docs rebuilt from kept
    lines in line order. Default emits md5 of the rebuilt text (the
    compact contract/evidence shape); return_text=True emits the
    rebuilt `text` itself (the pipeline shape — downstream stages keep
    processing the cleaned doc). Both are NULL when every line was
    dropped."""
    rebuilt_text = F.concat_ws(
        "\n",
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("line_idx"), F.col("line")))
            ),
            lambda s: s["line"],
        ),
    )
    out_col = (
        rebuilt_text.alias(text_col)
        if return_text
        else F.md5(rebuilt_text).alias("text_md5")
    )
    rebuilt = kept.groupBy(id_col).agg(F.count("*").alias("n_kept"), out_col)
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        text_col if return_text else "text_md5",
    )


# ------------------------------------------- exact duplicate spans


def span_tokens(col: Column) -> Column:
    """Case-preserving token stream for span dedup: collapse whitespace
    runs to one space, trim, split on the space. Unlike
    `normalized_text` this keeps case — removal rebuilds readable text
    from the kept tokens, so the stream must stay faithful (the only
    lossy step is whitespace collapsing, stated in the output
    contract)."""
    return F.split(F.trim(F.regexp_replace(col, WS_CLASS + "+", " ")), " ")


def _dup_windows(
    df: DataFrame, id_col: str, text_col: str, k: int, min_count: int
) -> tuple[DataFrame, DataFrame]:
    """Shared detection stage: returns (toks, dupw) where toks =
    (id_col, _toks array) for every non-NULL-text doc and dupw =
    (id_col, pos) of every length-k token window whose fingerprint
    occurs >= min_count times corpus-wide (total occurrences — a
    window repeated within one doc counts, matching ExactSubstr).

    Scale shape — the doc text NEVER shuffles in detection:
      1. windows are fingerprinted in place (xxhash64 of the k-token
         join inside a JVM transform; transform index == start pos, so
         posexplode yields (pos, fp) directly) — the exploded stream
         carries (id, pos, 8-byte fp), never the window text;
      2. dup fingerprints = groupBy(fp) count — partial agg, so a
         boilerplate window hot in 10^9 docs shuffles one row per map
         partition;
      3. membership = equi-join on fp (the hot-fp skew is exactly
         AQE skew-join shape).
    Fingerprint collisions (~n^2/2^65) can only over-mark a window as
    duplicated; at 10^12 windows that is ~2^15 spurious windows
    corpus-wide — negligible for training-data hygiene, noted here for
    honesty (the suffix-array reference tool is exact)."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    toks = span_token_table(df, id_col, text_col)
    wins = window_fingerprints(toks, id_col, k)
    dup_fp = (
        wins.groupBy("_fp")
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("_fp")
    )
    dupw = wins.join(dup_fp, "_fp").select(id_col, "pos")
    return toks, dupw


def span_token_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id_col, _toks): the whitespace-collapsed token array per
    non-NULL-text doc — the shared input of window fingerprinting and
    kept-token rebuild."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), span_tokens(F.col(text_col)).alias("_toks")
    )


def window_fingerprints(toks: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id_col, pos, _fp): xxhash64 of every length-k token window,
    fingerprinted in place (JVM transform; transform index == start
    pos) so the exploded stream never carries window text. Docs with
    fewer than k tokens yield no rows."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    n = F.size(F.col("_toks"))
    fps = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda p: F.xxhash64(F.array_join(F.slice(F.col("_toks"), p + 1, k), " ")),
    )
    return toks.filter(n >= k).select(
        F.col(id_col), F.posexplode(fps).alias("pos", "_fp")
    )


def _merge_spans(dupw: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands over duplicated window starts: windows at pos
    p cover tokens [p, p+k); two windows merge when the next start is
    <= prev + k (overlapping or back-to-back covered runs). Both
    shuffles here carry only duplicated windows (id, pos) — a small
    filtered subset, not the token stream."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    return (
        dupw.withColumn("_isl", F.sum(brk).over(w))
        .groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end", "n_windows")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicate-span detection (the ExactSubstr family — Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better", §4.1): find every maximal token span of length >= k that
    occurs at least `min_count` times corpus-wide (the published tool
    uses a monolithic suffix array; the distributed equivalence is
    window-cover — a >=k-token substring occurs twice iff every one of
    its k-windows does, so the union of duplicated k-windows IS the
    duplicated-span set at token granularity).

    Output: (id_col, span_start, span_end, n_windows) — token index
    ranges [start, end) over `span_tokens`, one row per maximal span.
    Positions index the WHITESPACE-COLLAPSED token stream.
    """
    toks, dupw = _dup_windows(df, id_col, text_col, k, min_count)
    return _merge_spans(dupw, id_col, k)


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    return_text: bool = False,
) -> DataFrame:
    """ExactSubstr removal: drop every token covered by a duplicated
    >=k-token span (ALL copies drop, matching Lee et al.'s released
    tool — keeping one canonical copy is a known open problem there)
    and rebuild the doc from the kept tokens joined with single
    spaces (the token stream is whitespace-collapsed, so rebuilt text
    normalizes runs of whitespace — stated contract).

    Output: one row per non-NULL-text doc — (id_col, n_tokens,
    n_kept, text_md5 | text); text/md5 are NULL when every token was
    covered. NULL-text docs are absent (same convention as
    dedup_paragraphs).

    Scale shape: detection as in `_dup_windows` (text never shuffles);
    spans collapse to a per-doc array (rows = maximal spans only);
    the ONLY text movement is the final join of span arrays onto the
    token-array table on id_col — one doc-granularity shuffle,
    the same budget as dedup_paragraphs' reassembly — and the kept
    filter runs as a JVM higher-order function, map-side."""
    toks, dupw = _dup_windows(df, id_col, text_col, k, min_count)
    return scrub_from_dup_windows(toks, dupw, id_col, text_col, k, return_text)


def scrub_from_dup_windows(
    toks: DataFrame,
    dupw: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    return_text: bool,
) -> DataFrame:
    """Shared rebuild stage: given the token table and the duplicated
    window starts, merge windows into maximal spans, drop covered
    tokens with a JVM higher-order filter (map-side), and emit
    (id, n_tokens, n_kept, text_md5 | text)."""
    spans = _merge_spans(dupw, id_col, k)
    arrs = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = toks.join(arrs, id_col, "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(F.col("_toks"), lambda t, i: ~covered(i))
    )
    rebuilt = F.array_join(kept, " ")
    n_kept = F.size(kept).cast("long")
    out_col = (
        F.when(n_kept > 0, rebuilt).alias(text_col)
        if return_text
        else F.when(n_kept > 0, F.md5(rebuilt)).alias("text_md5")
    )
    return joined.select(
        F.col(id_col),
        F.size(F.col("_toks")).cast("long").alias("n_tokens"),
        n_kept.alias("n_kept"),
        out_col,
    )
