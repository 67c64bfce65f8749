"""Tiling properties: quadkey hierarchy, bounds, soft assignment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.tile import (
    projection_matrix,
    reduce_2d,
    tile,
    tile_assignments,
    tile_soft,
)


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 16).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(v) for v in vec]) for i, vec in enumerate(vecs)]
    df = spark.createDataFrame(rows, "node_id long, embedding array<float>")
    return reduce_2d(df, dim=16).cache()


def test_projection_orthonormal():
    m = projection_matrix(64)
    assert np.allclose(m @ m.T, np.eye(2), atol=1e-12)


def test_reduced_coords_bounded(points):
    row = points.select(F.max(F.abs(F.col("x"))), F.max(F.abs(F.col("y")))).first()
    assert row[0] <= 1.0 and row[1] <= 1.0


def test_quadkey_prefix_hierarchy(points):
    """Child cell id at resolution r+1 is prefixed by the parent id at r."""
    a = tile(points, 3).select("node_id", F.col("cell_id").alias("c3"))
    b = tile(points, 4).select("node_id", F.col("cell_id").alias("c4"))
    joined = a.join(b, "node_id")
    bad = joined.filter(~F.col("c4").startswith(F.col("c3"))).count()
    assert bad == 0
    lens = joined.select(F.length("c3").alias("l3"), F.length("c4").alias("l4")).distinct().collect()
    assert all(r["l3"] == 4 and r["l4"] == 5 for r in lens)


def test_home_cell_unique_and_soft_superset(points):
    hard = tile(points, 3).select("node_id", "cell_id")
    soft = tile_soft(points, 3)
    # every node has exactly one hard home cell
    assert hard.count() == points.count()
    # the soft set contains the home cell with is_soft = false
    home_in_soft = soft.filter(~F.col("is_soft")).select("node_id", "cell_id")
    assert home_in_soft.exceptAll(hard).count() == 0
    assert hard.exceptAll(home_in_soft).count() == 0
    # soft extras are adjacent cells only (Chebyshev distance 1)
    s = tile_soft(points, 3).alias("s")
    h = tile(points, 3).select("node_id", F.col("ix").alias("hx"), F.col("iy").alias("hy")).alias("h")
    j = s.join(h, "node_id").filter(F.col("is_soft"))
    far = j.filter(
        (F.abs(F.col("ix") - F.col("hx")) > 1) | (F.abs(F.col("iy") - F.col("hy")) > 1)
    ).count()
    assert far == 0


def test_soft_amplification_bounded(points):
    n = points.count()
    soft_n = tile_soft(points, 4, soft_eps=0.15).count()
    assert n <= soft_n <= 4 * n


def test_tile_assignments_long_format(points):
    ta = tile_assignments(points, "node_id", [0, 2, 4])
    assert ta.columns == ["node_id", "resolution", "cell_id", "is_soft"]
    per_res = {r["resolution"]: r["n"] for r in ta.groupBy("resolution").agg(F.count("*").alias("n")).collect()}
    assert set(per_res) == {0, 2, 4}
    # id length = resolution + 1
    bad = ta.filter(F.length("cell_id") != F.col("resolution") + 1).count()
    assert bad == 0


def test_cells_match_numpy_oracle(points):
    """Spark-side quantization == straight numpy quantization."""
    pdf = points.select("node_id", "x", "y").toPandas().sort_values("node_id")
    got = {
        r["node_id"]: (r["ix"], r["iy"])
        for r in tile(points, 5).select("node_id", "ix", "iy").collect()
    }
    n = 1 << 6
    for _, row in pdf.iterrows():
        ix = min(n - 1, max(0, int(np.floor((row.x + 1) / 2 * n))))
        iy = min(n - 1, max(0, int(np.floor((row.y + 1) / 2 * n))))
        assert got[row.node_id] == (ix, iy)
