"""Persistable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB story: COUNT(DISTINCT user) over an arbitrary date range
normally rescans every covered partition. Persisting one HLL sketch
per (day) partition turns any later range query into a merge of a few
KB of sketch bytes — the incremental / mergeable-aggregate pattern
(same family as the hourly rollup, but for the non-algebraic distinct
count). Estimates carry the standard HLL error (~1.6% at lgK=12);
exactness is traded for never rescanning the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """(day, sketch) — one HLL sketch of the day's distinct keys,
    map-side combinable like any aggregate. Write this next to the
    lake (binary column) and refresh per day like the hourly rollup."""
    return events.groupBy(
        F.date_format(F.date_trunc("DAY", F.col(ts_col)), "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg(F.col(key_col), lg_k).alias("sketch"))


def merged_distinct_estimate(sketches: DataFrame, days: list[str] | None = None) -> DataFrame:
    """Distinct estimate over a day range: union the few-KB sketches,
    never the fact table. `days=None` merges everything."""
    sel = sketches if days is None else sketches.filter(F.col("day").isin(list(days)))
    return sel.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("distinct_estimate"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
