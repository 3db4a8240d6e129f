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


# ---------------------------------------------------------------------------
# Count-min sketch: fixed-width frequency summaries (Cormode &
# Muthukrishnan 2005). d hash rows x w counters; cell counts are plain
# sums, so sketches MERGE by adding cells — the same persistable
# incremental shape as the HLL family above, but for "how often", not
# "how many distinct". Estimates only ever OVER-count (hash
# collisions add, never subtract), which makes the sketch a sound
# candidate generator: any key whose true count passes a threshold is
# guaranteed to pass it in the sketch too.
# ---------------------------------------------------------------------------


def count_min_cells(
    items: DataFrame,
    key_col: str = "key",
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (row, col, cnt) cell relation of a count-min sketch
    over `items[key_col]` (one occurrence per input row). One scan:
    each key explodes into its d (row, hash-col) cells, then a hash
    agg over the d·w-bounded cell grid — map-side combinable, output
    size fixed at <= d·w rows no matter the corpus. Merge two
    sketches by unioning cells and re-summing.

    `weight_col` feeds a PRE-AGGREGATED (key, count) relation: each
    row contributes `weight_col` occurrences instead of 1. Cell
    counts are plain sums, so the grid is identical to running the
    unweighted build over the expanded multiset — but the explode
    fan-out is d·distinct-keys, not d·occurrences. Weights must be
    NON-NULL and NON-NEGATIVE counts: the sum coalesces to 0 so an
    all-NULL cell cannot poison downstream arithmetic, but a negative
    weight would silently break the sketch's never-under-count
    guarantee (counts from an aggregation are always >= 1)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(r)), F.lit(w)).alias("col"),
            )
            for r in range(d)
        ]
    )
    agg = (
        F.count(F.lit(1))
        if weight_col is None
        # coalesce: a cell whose contributing rows all carry NULL
        # weight must read 0, not NULL (sum-of-NULLs)
        else F.coalesce(F.sum(F.col("_w").cast("long")), F.lit(0))
    )
    keep = [F.col(weight_col).alias("_w")] if weight_col is not None else []
    return (
        items.select(F.explode(cells).alias("c"), *keep)
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(agg.cast("long").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, cells: DataFrame, key_col: str = "key", d: int = 4, w: int = 1024
) -> DataFrame:
    """Attach `cms_est` — the count-min estimate (min over the d row
    counters) — to every row of `keys`. The cell grid collapses into
    ONE broadcast row holding a DENSE d·w array (a few KB), so
    estimation is a pure per-row expression: no join, no shuffle, and
    each lookup is O(1) positional `element_at` on the array.
    (A map<long,long> of the sparse cells reads nicer but Spark's
    ArrayBasedMapData makes `element_at(map, k)` a LINEAR scan of all
    entries — at d=4, w=1024 that's 16k comparisons per input row,
    measured 30x slower over a ×100 corpus. The map→dense-array
    transform below pays that scan once, on the single broadcast
    row.) Guarantees cms_est >= true count."""
    m = cells.groupBy().agg(
        F.map_from_entries(
            F.collect_list(
                F.struct((F.col("row") * w + F.col("col")).cast("long"), F.col("cnt"))
            )
        ).alias("_m")
    )
    dense = m.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(d * w - 1)),
            lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("long")), F.lit(0)),
        ).alias("_a")
    )
    est = F.least(
        *[
            F.element_at(
                F.col("_a"),
                (
                    F.lit(r) * w + F.pmod(F.xxhash64(F.col(key_col), F.lit(r)), F.lit(w)) + 1
                ).cast("int"),
            )
            for r in range(d)
        ]
    )
    return keys.crossJoin(F.broadcast(dense)).withColumn("cms_est", est.cast("long")).drop("_a")
