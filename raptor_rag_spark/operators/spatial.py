"""Spatial operators over the reduced embedding plane (north_rule):
cluster-boundary polygons, point-in-polygon join, raster<->vector
density grids.

The reduced space is [-1,1]^2 (tile.py). Polygons are closed rings
``array<struct<x:double,y:double>>``. PIP uses the even-odd ray-cast
rule (public algorithm); the hull kernel is Andrew's monotone chain.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- hulls

_POLY_SCHEMA = (
    "cell_id string, resolution int, n_points long, "
    "boundary array<struct<x:double,y:double>>"
)


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Convex hull (ccw, closed not duplicated). Degenerate inputs
    (1-2 points, collinear) return what they can."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def cluster_polygons(
    tiled: DataFrame, resolution_col: str = "resolution", cell_col: str = "cell_id"
) -> DataFrame:
    """Per-cell convex hull of member points -> cluster_polygons table.

    Group sizes are bounded by the tree build's token cap (C4 recast),
    so the pandas groups stay small; the groupBy key is (resolution,
    cell) — exactly the tiles partitioning, no extra shuffle when the
    input is already hash-partitioned on it.
    """

    def hull(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[["x", "y"]].to_numpy(dtype=float)
        h = _monotone_chain(pts)
        return pd.DataFrame(
            {
                "cell_id": [key[1]],
                "resolution": [int(key[0])],
                "n_points": [len(pdf)],
                "boundary": [[{"x": float(px), "y": float(py)} for px, py in h]],
            }
        )

    return tiled.groupBy(resolution_col, cell_col).applyInPandas(hull, _POLY_SCHEMA)


# ------------------------------------------------------------- PIP


def point_in_polygon_expr(x: Column, y: Column, polygon: list[tuple[float, float]]) -> Column:
    """Even-odd ray cast against a FIXED literal polygon, unrolled to a
    pure JVM boolean expression (also expressible 1:1 in DuckDB SQL —
    the oracle for the PIP operator)."""
    inside = F.lit(False)
    n = len(polygon)
    for i in range(n):
        ax, ay = polygon[i]
        bx, by = polygon[(i + 1) % n]
        if ay == by:
            continue  # horizontal edge can't be crossed by a horizontal ray test
        cross = ((F.lit(ay) > y) != (F.lit(by) > y)) & (
            x < (F.lit(bx) - F.lit(ax)) * (y - F.lit(ay)) / (F.lit(by) - F.lit(ay)) + F.lit(ax)
        )
        inside = F.when(cross, ~inside).otherwise(inside)
    return inside


_PIP_SCHEMA = "point_id long, cell_id string, inside boolean"


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "point_id",
) -> DataFrame:
    """General PIP join: points(point_id, x, y, cell_id) x
    polygons(cell_id, boundary) -> inside flag. Candidate pruning is
    the cell equi-join (the polygon IS a cell's hull, so only points
    in/near that cell test against it — the range-join analog);
    the exact test is an Arrow-batched ray-cast kernel.
    """
    joined = points.join(polygons.select("cell_id", "boundary"), "cell_id")

    def raycast(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = []
            for px, py, boundary in zip(pdf["x"], pdf["y"], pdf["boundary"]):
                n = len(boundary)
                inside = False
                if n >= 3:
                    for i in range(n):
                        a = boundary[i]
                        b = boundary[(i + 1) % n]
                        ay, by = a["y"], b["y"]
                        if ay == by:
                            continue
                        if (ay > py) != (by > py) and px < (b["x"] - a["x"]) * (py - ay) / (by - ay) + a["x"]:
                            inside = not inside
                res.append(inside)
            yield pd.DataFrame(
                {
                    "point_id": pdf[point_id],
                    "cell_id": pdf["cell_id"],
                    "inside": res,
                }
            )

    return joined.mapInPandas(raycast, _PIP_SCHEMA)


# --------------------------------------------------- raster <-> vector


def rasterize(
    points: DataFrame, delta: float, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Density raster: groupBy floor(coord/delta) counts — one shuffle,
    map-side partial agg."""
    gx = F.floor(F.col(x_col) / F.lit(delta)).cast("int")
    gy = F.floor(F.col(y_col) / F.lit(delta)).cast("int")
    return (
        points.groupBy(gx.alias("gx"), gy.alias("gy"))
        .agg(F.count("*").alias("n"))
    )


def vectorize(raster: DataFrame, delta: float) -> DataFrame:
    """Raster cells back to vector polygons (rect rings) + centroid —
    pure JVM struct building."""
    x0 = F.col("gx") * F.lit(delta)
    y0 = F.col("gy") * F.lit(delta)
    x1 = x0 + F.lit(delta)
    y1 = y0 + F.lit(delta)

    def pt(xx, yy):
        return F.struct(xx.cast("double").alias("x"), yy.cast("double").alias("y"))

    return raster.select(
        "gx",
        "gy",
        "n",
        F.array(pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1)).alias("boundary"),
        ((x0 + x1) / 2).alias("cx"),
        ((y0 + y1) / 2).alias("cy"),
    )


def raster_roundtrip_check(points: DataFrame, delta: float) -> DataFrame:
    """vectorize(rasterize(points)) then re-rasterize the centroids
    weighted by n — counts must be identical (golden round-trip)."""
    r1 = rasterize(points, delta)
    v = vectorize(r1, delta)
    r2 = (
        v.groupBy(
            F.floor(F.col("cx") / F.lit(delta)).cast("int").alias("gx"),
            F.floor(F.col("cy") / F.lit(delta)).cast("int").alias("gy"),
        )
        .agg(F.sum("n").alias("n"))
    )
    return r1.alias("a").join(r2.alias("b"), ["gx", "gy"], "full").select(
        "gx", "gy", F.col("a.n").alias("n_before"), F.col("b.n").alias("n_after")
    )
