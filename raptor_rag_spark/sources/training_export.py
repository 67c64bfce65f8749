"""Deterministic training-order export (global corpus shuffle).

Training runs read the corpus in a pseudo-random order that must be
REPRODUCIBLE (resume mid-epoch, re-run byte-identical, ablate on the
same order) and must not require a global sort of 100 TB. The standard
scale recipe (public — e.g. the shard-shuffle used by webtext pipeline
writeups and MapReduce-era "distributed shuffle" folklore):

1. key every row with a seeded hash of its id — a fixed pseudo-random
   permutation, independent of input partitioning or arrival order;
2. route rows to `shards` output shards by a modulus of that key
   (hash-partition exchange: the ONLY shuffle, no range sampling —
   `repartitionByRange` draws random range boundaries at runtime, so
   its file split points are NOT run-reproducible);
3. sort WITHIN each shard by the key (map-side sort, no global sort)
   and write one directory per shard (`_shard=<k>/`).

Reading shard dirs in shard order then rows in file order replays the
same global permutation every run, on any cluster size. Epochs = new
seeds. Scale: one hash exchange + per-partition sort; shard count
bounds the max open-file fan-in for trainer workers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shuffled_export_plan(
    df: DataFrame,
    seed: int,
    shards: int,
    id_col: str = "doc_id",
    key_col: str = "_shuffle_key",
    shard_col: str = "_shard",
) -> DataFrame:
    """The shuffle plan without the write: rows keyed by
    xxhash64(id, seed), routed to `shards` shard ids, ordered by
    (shard, key, id). The id tie-break makes the order total even if
    two ids collide in xxhash64 (~10^-9 at 10^5 rows, but an export
    order must be total, not almost-total)."""
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    key = F.xxhash64(F.col(id_col), F.lit(seed))
    out = df.withColumn(key_col, key).withColumn(
        shard_col, F.pmod(F.col(key_col), F.lit(shards)).cast("int")
    )
    # ONE hash exchange on the shard id; sortWithinPartitions is a
    # map-side sort. A partition may hold several shard ids (hash of
    # the shard value, not identity) — the write's partitionBy splits
    # them into their own dirs, and the within-partition sort leading
    # with shard_col keeps every shard's rows contiguous and ordered.
    return out.repartition(shards, shard_col).sortWithinPartitions(
        shard_col, key_col, id_col
    )


def write_shuffled_export(
    df: DataFrame,
    out_dir: str,
    seed: int,
    shards: int = 64,
    id_col: str = "doc_id",
) -> None:
    """Write the deterministic training order to `out_dir/_shard=k/`.

    The shuffle key column is KEPT in the output: it is the resume
    cursor (a trainer restarting mid-shard seeks to the last consumed
    key) and the re-verification handle (any reader can re-derive it
    from the id and check the order)."""
    plan = shuffled_export_plan(df, seed=seed, shards=shards, id_col=id_col)
    plan.write.mode("overwrite").partitionBy("_shard").parquet(out_dir)


def read_shuffled_export(
    spark: SparkSession, out_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """Read an export in its global training order (shard, key, id).

    ``id_col`` must be the id the export was written with — it is the
    key-collision tie-break, so a different column would replay a
    different order than the on-disk file order exactly in the case
    the tie-break exists for. The ORDER BY here is for consumers that
    want one ordered stream through Spark; a trainer normally reads
    shard dirs directly in shard order (each file is already sorted)
    and never pays a sort.
    """
    df = spark.read.parquet(out_dir)
    if id_col not in df.columns:
        raise ValueError(
            f"id_col {id_col!r} not in export columns {df.columns} — pass the "
            "id the export was written with"
        )
    return df.orderBy("_shard", "_shuffle_key", id_col)


def export_shard_paths(out_dir: str) -> list[str]:
    """Shard directories in replay order."""
    shard_dirs = [d for d in os.listdir(out_dir) if d.startswith("_shard=")]
    return [
        os.path.join(out_dir, d)
        for d in sorted(shard_dirs, key=lambda d: int(d.split("=", 1)[1]))
    ]
