"""Spatial ops: hulls, point-in-polygon, raster round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.spatial import (
    _monotone_chain,
    cluster_polygons,
    point_in_polygon_expr,
    point_in_polygon_join,
    raster_roundtrip_check,
    rasterize,
    vectorize,
)
from raptor_rag_spark.operators.tile import reduce_2d, tile
from raptor_rag_spark.plans.driver_queries import PIP_POLYGON


def test_monotone_chain_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    hull = _monotone_chain(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_pip_expr_matches_python_raycast(spark):
    rng = np.random.RandomState(3)
    pts = rng.uniform(-1, 1, size=(400, 2))
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)], "id long, x double, y double"
    )
    got = {r["id"]: r["inside"] for r in df.select(
        "id", point_in_polygon_expr(F.col("x"), F.col("y"), PIP_POLYGON).alias("inside")
    ).collect()}

    def py_pip(px, py, poly):
        inside = False
        n = len(poly)
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            if ay == by:
                continue
            if (ay > py) != (by > py) and px < (bx - ax) * (py - ay) / (by - ay) + ax:
                inside = not inside
        return inside

    for i, (x, y) in enumerate(pts):
        assert got[i] == py_pip(x, y, PIP_POLYGON)
    # sanity: the polygon is non-trivial for this sample
    assert 0 < sum(got.values()) < len(pts)


@pytest.fixture(scope="module")
def tiled_points(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(400, 16).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        "point_id long, embedding array<float>",
    )
    return tile(reduce_2d(df, dim=16), 2).cache()


def test_cluster_polygons_and_pip_join(spark, tiled_points):
    polys = cluster_polygons(tiled_points).cache()
    assert polys.filter(F.col("n_points") <= 0).count() == 0
    # total membership preserved
    assert polys.agg(F.sum("n_points")).first()[0] == tiled_points.count()

    # every point tests against its own cell's hull; points ON the hull
    # boundary can be outside by even-odd rule for degenerate (<3 pt)
    # hulls — restrict the assertion to interior-rich cells
    res = point_in_polygon_join(
        tiled_points.select("point_id", "cell_id", "x", "y"), polys
    )
    big_cells = {r["cell_id"] for r in polys.filter(F.col("n_points") >= 8).collect()}
    rows = res.collect()
    checked = [r for r in rows if r["cell_id"] in big_cells]
    assert checked, "expected some populous cells"
    inside_frac = sum(r["inside"] for r in checked) / len(checked)
    # hull vertices themselves are on the boundary (not strictly inside),
    # so expect a high-but-not-1 interior fraction
    assert inside_frac > 0.5


def test_raster_roundtrip_counts_identical(spark, tiled_points):
    chk = raster_roundtrip_check(tiled_points, delta=0.125)
    bad = chk.filter(
        F.col("n_before").isNull()
        | F.col("n_after").isNull()
        | (F.col("n_before") != F.col("n_after"))
    ).count()
    assert bad == 0


def test_vectorize_boundary_struct(spark, tiled_points):
    r = rasterize(tiled_points, 0.25)
    v = vectorize(r, 0.25)
    row = v.first()
    assert len(row["boundary"]) == 4
    assert row["n"] >= 1


def test_range_join_matches_naive(spark):
    """Cell-bucketed range join == naive all-pairs distance filter."""
    import numpy as np

    from raptor_rag_spark.operators.spatial import range_join

    rng = np.random.RandomState(17)
    pts = rng.uniform(-1, 1, size=(400, 2))
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    ).cache()
    left = df.limit(25).selectExpr("pid as query_id", "x", "y")
    right = df.selectExpr("pid as node_id", "x", "y")
    got = {
        (r["query_id"], r["node_id"])
        for r in range_join(left, right, radius=0.2).collect()
    }
    lp = left.collect()
    naive = {
        (l["query_id"], int(j))
        for l in lp
        for j in range(len(pts))
        if (l["x"] - pts[j][0]) ** 2 + (l["y"] - pts[j][1]) ** 2 <= 0.2**2
    }
    assert got == naive
    # includes self-pairs at distance 0 and is plan-shaped as one equi-join
    plan = range_join(left, right, radius=0.2)._jdf.queryExecution().executedPlan().toString()
    assert "cell_key" in plan


def test_pip_tiled_equals_plain(spark):
    """Covering-accelerated PIP == the plain unrolled ray cast, and the
    cover actually classifies cells (full + boundary non-empty)."""
    import numpy as np

    from raptor_rag_spark.operators.spatial import (
        point_in_polygon_expr,
        point_in_polygon_tiled,
        polygon_cell_cover,
    )
    from raptor_rag_spark.plans.driver_queries import PIP_POLYGON

    full, boundary = polygon_cell_cover(PIP_POLYGON, 4)
    assert full and boundary
    rng = np.random.RandomState(23)
    pts = rng.uniform(-1, 1, size=(2000, 2))
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "vec_id long, x double, y double",
    )
    tiled = {
        r["vec_id"]: r["inside"]
        for r in point_in_polygon_tiled(df, PIP_POLYGON, resolution=4).collect()
    }
    plain = {
        r["vec_id"]: r["inside"]
        for r in df.select(
            "vec_id",
            point_in_polygon_expr(F.col("x"), F.col("y"), PIP_POLYGON).alias("inside"),
        ).collect()
    }
    assert tiled == plain
    assert sum(tiled.values()) > 0
