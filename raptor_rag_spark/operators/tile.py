"""Hierarchical tiling of embedding space (H3/S2-style quadtree).

Recasts the reference's UMAP->GMM clustering
(/root/reference/raptor/cluster_utils.py:23-123) as a deterministic
pipeline: a seeded orthonormal 2-D projection of the unit-norm
embedding (replaces UMAP, which the reference runs UNSEEDED — its
builds are not reproducible, cluster_utils.py:31-42 — so determinism
here is by design, see SURVEY.md §2.9), then per-resolution quadkey
cells (replace GMM clusters; the parent/child subdivision replaces the
reference's global/local two-phase clustering, cluster_utils.py:69-123).

Cell scheme: resolution r quantizes [-1,1]^2 into 2^(r+1) x 2^(r+1)
bins; cell_id is the (r+1)-digit base-4 quadkey (y-bit, x-bit
interleave) => a child cell id is prefixed by its parent cell id.
|x|,|y| <= 1 is guaranteed: projection rows are unit-norm and
embeddings are unit-norm (Cauchy-Schwarz).

GMM soft multi-membership (prob > 0.1 joins several clusters,
cluster_utils.py:60-66,:139) is recast as border-band multi-assignment:
a point within ``soft_eps`` * cell_width of a cell border is also
assigned to the adjacent cell(s), emitted via explode with
``is_soft = true``.

Everything after the 2-projection-dot-products is pure JVM Spark
expressions (bit ops + concat) — no Python in the quantization path.
The projection itself is a vectorized numpy matmul inside a pandas
UDF (the right shape for 1024-dim vectors at 10^12 rows: one BLAS
matmul per Arrow batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raptor_rag_spark.config import DEFAULT_CONFIG


def projection_matrix(dim: int, seed: int = DEFAULT_CONFIG.seed) -> np.ndarray:
    """(2, dim) orthonormal rows, deterministic from seed."""
    rng = np.random.RandomState(seed)
    m = rng.randn(2, dim)
    # Gram-Schmidt
    m[0] /= np.linalg.norm(m[0])
    m[1] -= m[0] * np.dot(m[0], m[1])
    m[1] /= np.linalg.norm(m[1])
    return m


def projection_literals(dim: int, seed: int = DEFAULT_CONFIG.seed) -> tuple[list[float], list[float]]:
    """The projection rows as plain doubles — for DuckDB oracle SQL."""
    m = projection_matrix(dim, seed)
    return [float(v) for v in m[0]], [float(v) for v in m[1]]


_XY_SCHEMA = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)


def make_reduce_udf(dim: int, seed: int = DEFAULT_CONFIG.seed):
    proj = projection_matrix(dim, seed)  # captured; small, ships in closure

    @F.pandas_udf(_XY_SCHEMA)
    def reduce_xy(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in batches:
            mat = np.array(list(series), dtype=np.float64)
            if mat.size == 0:
                yield pd.DataFrame({"x": [], "y": []})
                continue
            xy = mat @ proj.T  # (n, 2) double matmul
            yield pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1]})

    return reduce_xy


def reduce_2d(
    df: DataFrame,
    emb_col: str = "embedding",
    dim: int | None = None,
    seed: int = DEFAULT_CONFIG.seed,
) -> DataFrame:
    """Adds double columns x, y = projection of the embedding."""
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    xy = make_reduce_udf(dim, seed)(F.col(emb_col))
    return df.withColumn("_xy", xy).withColumn("x", F.col("_xy.x")).withColumn(
        "y", F.col("_xy.y")
    ).drop("_xy")


def grid_index(coord: Column, resolution: int) -> Column:
    """Quantize coord in [-1,1] to int bin at this resolution (clamped)."""
    n = 1 << (resolution + 1)
    raw = F.floor((coord + F.lit(1.0)) / F.lit(2.0) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("int")


def quadkey(ix: Column, iy: Column, resolution: int) -> Column:
    """(r+1)-digit base-4 quadkey from grid indices — pure JVM concat.

    digit_i = 2*bit(iy, r-i) + bit(ix, r-i) for i in 0..r; child cell
    ids are prefixed by parent ids across resolutions.
    """
    digits = []
    for i in range(resolution + 1):
        shift = resolution - i
        d = (F.shiftright(iy, shift) % 2) * 2 + (F.shiftright(ix, shift) % 2)
        digits.append(d.cast("string"))
    return F.concat(*digits)


def cell_id_col(x: Column, y: Column, resolution: int) -> Column:
    return quadkey(grid_index(x, resolution), grid_index(y, resolution), resolution)


def tile(df: DataFrame, resolution: int, x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Adds ix, iy, cell_id (home cell) at one resolution."""
    ix = grid_index(F.col(x_col), resolution)
    iy = grid_index(F.col(y_col), resolution)
    return (
        df.withColumn("ix", ix)
        .withColumn("iy", iy)
        .withColumn("resolution", F.lit(resolution))
        .withColumn("cell_id", quadkey(F.col("ix"), F.col("iy"), resolution))
    )


def tile_soft(
    df: DataFrame,
    resolution: int,
    soft_eps: float = DEFAULT_CONFIG.soft_eps,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Home cell + border-band neighbor cells (is_soft flag).

    Emits (dx, dy) offsets in {-1,0,1}^2 where the point sits within
    soft_eps of that border; pure JVM (explode over a literal array,
    filtered) — the explode amplification is bounded by 4x (corner).
    """
    n = 1 << (resolution + 1)
    d = df.withColumn("ix", grid_index(F.col(x_col), resolution)).withColumn(
        "iy", grid_index(F.col(y_col), resolution)
    )
    fx = (F.col(x_col) + 1.0) / 2.0 * n - F.col("ix")
    fy = (F.col(y_col) + 1.0) / 2.0 * n - F.col("iy")
    d = d.withColumn("_fx", fx).withColumn("_fy", fy)

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    eps = F.lit(float(soft_eps))
    d = d.withColumn("_off", F.explode(offs))
    dx, dy = F.col("_off.dx"), F.col("_off.dy")
    keep_x = (
        (dx == 0)
        | ((dx == -1) & (F.col("_fx") < eps) & (F.col("ix") > 0))
        | ((dx == 1) & (F.col("_fx") > 1 - eps) & (F.col("ix") < n - 1))
    )
    keep_y = (
        (dy == 0)
        | ((dy == -1) & (F.col("_fy") < eps) & (F.col("iy") > 0))
        | ((dy == 1) & (F.col("_fy") > 1 - eps) & (F.col("iy") < n - 1))
    )
    d = d.filter(keep_x & keep_y)
    d = (
        d.withColumn("ix", F.col("ix") + dx)
        .withColumn("iy", F.col("iy") + dy)
        .withColumn("is_soft", (dx != 0) | (dy != 0))
        .drop("_off", "_fx", "_fy")
    )
    return d.withColumn("resolution", F.lit(resolution)).withColumn(
        "cell_id", quadkey(F.col("ix"), F.col("iy"), resolution)
    )


def tile_assignments(
    df: DataFrame,
    id_col: str,
    resolutions: list[int],
    soft_eps: float = DEFAULT_CONFIG.soft_eps,
) -> DataFrame:
    """Long-format (id, resolution, cell_id, is_soft) over a resolution
    ladder — the engine's parity surface ("tile assignments")."""
    parts = [
        tile_soft(df, r, soft_eps).select(
            F.col(id_col), "resolution", "cell_id", "is_soft"
        )
        for r in resolutions
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def neighbor_cells(resolution: int, ring: int, ix_col: str = "ix", iy_col: str = "iy"):
    """Returns a Column: array of cell_ids within Chebyshev distance
    <= ring of (ix, iy), bounds-clamped — used for kNN ring expansion.
    Pure JVM: flatten/transform over sequence literals."""
    n = 1 << (resolution + 1)
    cells = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            nx = F.col(ix_col) + dx
            ny = F.col(iy_col) + dy
            ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
            cells.append(F.when(ok, quadkey(nx, ny, resolution)))
    return F.array_compact(F.array(*cells))
