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
