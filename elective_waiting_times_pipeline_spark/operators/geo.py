"""Spatial join: point-in-polygon assignment (reference J6 — `over()`
at `1c. Look for provider locations.R:454`, assigning providers to
MSOA polygons).

No Catalyst-native spatial primitive exists, so this is the documented
slow path done right: polygons are broadcast (a dimension, ~thousands
of rings), and the ray-casting test runs as a vectorized Pandas UDF
(Arrow batches, numpy inner loop) — not a row-at-a-time Python UDF.
At 100 TB the points side streams through map tasks with no shuffle.

For very large polygon sets, pre-filter with bounding boxes (done
here) or bucket both sides by geohash/H3 cell and equi-join first —
the UDF then verifies only candidates.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _point_in_ring(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: points (xs, ys) vs one ring
    [(x, y), ...]. Boundary behavior is half-open (standard even-odd)."""
    inside = np.zeros(len(xs), dtype=bool)
    x1, y1 = ring[-1]
    for x2, y2 in ring:
        cond = (y1 > ys) != (y2 > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (ys - y1) / (y2 - y1) + x1
        inside ^= cond & (xs < xint)
        x1, y1 = x2, y2
    return inside


def point_in_polygon_udf(polygons: Sequence[tuple[str, Sequence[tuple[float, float]]]]):
    """Build a pandas UDF mapping (x, y) → polygon name (first match in
    the given order, None if outside all). `polygons` is a list of
    (name, ring) pairs; closures serialize it to every executor once
    per task (an implicit broadcast — fine for dimension-sized sets)."""
    rings = [(name, np.asarray(ring, dtype="float64")) for name, ring in polygons]
    bboxes = [
        (name, r, r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max())
        for name, r in rings
    ]

    @F.pandas_udf(StringType())
    def assign(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy(dtype="float64")
        ys = y.to_numpy(dtype="float64")
        out = np.full(len(xs), None, dtype=object)
        unassigned = np.ones(len(xs), dtype=bool)
        for name, ring, xmin, xmax, ymin, ymax in bboxes:
            cand = unassigned & (xs >= xmin) & (xs <= xmax) & (ys >= ymin) & (ys <= ymax)
            if not cand.any():
                continue
            hit = np.zeros(len(xs), dtype=bool)
            hit[cand] = _point_in_ring(xs[cand], ys[cand], ring)
            out[hit] = name
            unassigned &= ~hit
        return pd.Series(out)

    return assign


def spatial_join(
    points: DataFrame,
    polygons: Sequence[tuple[str, Sequence[tuple[float, float]]]],
    x_col: str,
    y_col: str,
    out_col: str = "polygon",
) -> DataFrame:
    """Assign each point row its containing polygon's name (None if
    outside). One map-side pass; no shuffle."""
    udf = point_in_polygon_udf(polygons)
    return points.withColumn(out_col, udf(F.col(x_col).cast("double"), F.col(y_col).cast("double")))


def radius_join(
    points: DataFrame,
    radius: float,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All point pairs within `radius` (planar distance) via the
    neighbor-grid stencil — the 2-D analog of the binned range join:

      1. every point gets its grid cell (floor(x/r), floor(y/r));
      2. ONE side additionally explodes to its 3x3 neighbor cells —
         any pair within r must share a (cell, neighbor-cell) match,
         because two points closer than r differ by at most one cell
         index per axis;
      3. candidates equi-join on the cell pair (hash join, never an
         all-pairs product), then the exact squared-distance predicate
         keeps true pairs. `id_a < id_b` dedups the symmetric match.

    Cost: 9x fan-out on one side, candidate count bounded by local
    density — at 100 TB the join shuffles (cell, point) tuples, not
    the cross product. Pure arithmetic (no trig), so the result is
    engine-exact for an oracle on planar coordinates."""
    r = float(radius)
    cx = F.floor(F.col(x_col) / r).cast("long")
    cy = F.floor(F.col(y_col) / r).cast("long")
    right = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = (
        points.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).alias("xa"),
            F.col(y_col).alias("ya"),
            cx.alias("_ax"),
            cy.alias("_ay"),
        )
        .withColumn("_o", F.explode(offsets))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("_ax") + F.col("_o.dx")).alias("_cx"),
            (F.col("_ay") + F.col("_o.dy")).alias("_cy"),
        )
    )
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        left.join(right, ["_cx", "_cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(r * r)))
        .select("id_a", "id_b", F.round(F.sqrt(d2), 6).alias("dist"))
    )
