"""Explicit skew handling: hot-key detection + salted two-phase
aggregation and salted joins (north_rule: "skew from hot cells
(popular domains/languages) is handled with salted repartitioning").

The adaptive quadtree (tile.py) removes most cell-occupancy skew
structurally; these operators cover the remaining cases — aggregations
keyed by inherently hot values (domain, lang, shingle) and joins whose
build side has hot keys — where AQE's skew-join split helps reads but
not stragglers inside a single groupBy key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def detect_hot_keys(
    df: DataFrame, key_cols: list[str], threshold_ratio: float = 4.0, sample: float = 0.1
) -> DataFrame:
    """Keys whose (sampled) frequency exceeds threshold_ratio * mean —
    one cheap pass over a sample; returns the hot-key dimension table
    (small; meant for broadcast)."""
    s = df.sample(fraction=sample, seed=7) if sample < 1.0 else df
    counts = s.groupBy(*key_cols).agg(F.count("*").alias("_n"))
    mean = counts.agg(F.avg("_n")).first()[0] or 1.0
    return counts.filter(F.col("_n") > threshold_ratio * mean).select(*key_cols)


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[Column],
    merge_aggs: list[Column],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase salted aggregation: phase 1 groups on (key, salt) —
    a hot key's rows spread over ``salt`` reducers — phase 2 merges the
    partials on the key alone (tiny input).

    ``aggs`` compute the partials (aliased), ``merge_aggs`` combine
    them (referencing the partial aliases). Algebraic aggregates only
    (sum/count/min/max/avg-via-sum+count).
    """
    salted = df.withColumn("_salt", (F.rand(seed=13) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def salted_count_sum(
    df: DataFrame, key_cols: list[str], sum_col: str | None = None, salt: int = DEFAULT_SALT
) -> DataFrame:
    """The common case: count(*) (+ optional sum) per key, salted.
    Result is identical to a plain groupBy — only the physical shuffle
    distribution changes — so a plain-SQL oracle verifies it."""
    aggs = [F.count("*").alias("_pc")]
    merge = [F.sum("_pc").alias("n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_ps"))
        merge.append(F.sum("_ps").alias(f"sum_{sum_col}"))
    return salted_agg(df, key_cols, aggs, merge, salt)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big (probe) side gets a random salt,
    the small (build) side is exploded x salt so every salted partition
    finds its match. Use when AQE's skew split can't help (e.g. the
    build side itself must co-locate). Result identical to a plain
    join on ``key``.

    Supported ``how``: inner, left (+ left_outer), left_semi,
    left_anti — all big-side-preserving joins are salt-safe because
    every salt value of a matching key exists on the exploded small
    side, and unmatched big rows carry their salt through to a null
    (or are kept/dropped wholesale for semi/anti). right/full would
    duplicate UNMATCHED small rows once per salt — not supported; put
    the preserved side on the left."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} "
            "(right/full would duplicate unmatched build rows per salt)"
        )
    big_s = big.withColumn("_salt", (F.rand(seed=13) * salt).cast("int"))
    small_s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
