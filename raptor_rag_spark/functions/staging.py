"""Shared exact-once parquet staging + content-derived append ids.

One implementation for every crash-safe append surface (tree level
appends in streaming/incremental.py, persisted ANN node appends in
operators/similarity.py) — the stage/scrub/rename/refresh discipline
is correctness-critical and must not drift between copies.
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_append_id(df: DataFrame, cols: Sequence[str]) -> str:
    """Content-derived idempotency id: row count + order-independent
    sum of xxhash64 over ``cols``. Include the VALUE columns (text,
    embedding, ...), not just ids — a retry presenting the same ids
    with DIFFERENT content (e.g. a re-embedded repair batch) must read
    as a NEW append, not silently no-op against the applied-ids ledger.
    One tiny aggregation; runs before the append's own execution."""
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(1 << 31))
        ).alias("h"),
    ).first()
    return f"n{agg['n']}h{agg['h'] or 0}"


def stage_parquet_append(
    df: DataFrame, live_dir: str, append_id: str, part_prefix: str
) -> None:
    """Exact-once append of ``df``'s rows into a live parquet dir:
    write to an ``_inflight_<id>`` subdir (invisible to readers — the
    leading underscore hides it from Spark/Hadoop listings), rename the
    part files into ``live_dir`` under ``part-<prefix>-<id>-NNNNN``
    names, scrubbing leftovers of a crashed earlier attempt of the SAME
    id first, then refresh Spark's path cache (the renames bypass the
    write path, so cached file listings would keep serving the old
    files). The CALLER commits its metadata (manifest / meta.json)
    AFTER this returns — commit-last means a retry either no-ops on the
    ledger or replays through here and lands the rows exactly once."""
    for leftover in glob.glob(
        os.path.join(live_dir, f"part-{part_prefix}-{append_id}-*")
    ):
        os.remove(leftover)
    inflight = os.path.join(live_dir, f"_inflight_{append_id}")
    shutil.rmtree(inflight, ignore_errors=True)
    df.write.mode("overwrite").parquet(inflight)
    for i, src in enumerate(sorted(glob.glob(os.path.join(inflight, "part-*")))):
        bn = os.path.basename(src)
        ext = bn[bn.index(".") :] if "." in bn else ".parquet"
        os.replace(
            src,
            os.path.join(live_dir, f"part-{part_prefix}-{append_id}-{i:05d}{ext}"),
        )
    shutil.rmtree(inflight, ignore_errors=True)
    df.sparkSession.catalog.refreshByPath(live_dir)
