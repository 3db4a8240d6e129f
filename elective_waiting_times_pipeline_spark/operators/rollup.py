"""Continuous-aggregate maintenance: an hourly rollup lake kept fresh
by recomputing ONLY the day partitions a new batch touched (the
hypertable continuous-aggregate / materialized-view-refresh pattern,
done lake-style with dynamic partition overwrite).

Refresh contract: the rollup is ALWAYS a pure function of the base
event lake — a refresh recomputes each touched day from the base lake
(partition-pruned scan), never merges batch deltas into stored state.
That makes refreshes idempotent (re-running a day is a no-op swap) and
self-healing (a restated day just needs its day refreshed), at the
cost of re-aggregating the touched days — which is the right trade at
100 TB, where a day is a bounded slice and correctness-after-replay
beats delta bookkeeping.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.timeseries import bucket_series
from elective_waiting_times_pipeline_spark.sources.readers import overwrite_partitions


def hourly_rollup(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The rollup relation: (day, grp, bucket, n_events, sv) — one
    map-side-combinable aggregation of the events slice, `day` as a
    'yyyy-MM-dd' string partition column."""
    return bucket_series(events, group_col, ts_col, value_col).withColumn(
        "day", F.date_format("bucket", "yyyy-MM-dd")
    )


def touched_days(batch: DataFrame, ts_col: str = "ts") -> list[str]:
    """The day partitions a batch touches. A micro-batch spans a
    handful of days, so the collect is bounded by the batch's time
    span, not its row count (it reduces to a distinct of day strings
    map-side first)."""
    rows = (
        batch.select(F.date_format(F.date_trunc("HOUR", F.col(ts_col)), "yyyy-MM-dd").alias("day"))
        .distinct()
        .collect()
    )
    return sorted(r.day for r in rows)


def refresh_hourly_rollup(
    events_lake: DataFrame,
    rollup_path: str,
    days: Iterable[str],
    day_col: str = "day",
    **rollup_kwargs,
) -> None:
    """Recompute the given day partitions of the rollup from the base
    lake and swap them in with dynamic partition overwrite. When the
    base lake is partitioned by `day_col`, the literal isin filter
    prunes the scan to exactly the touched days; untouched rollup
    partitions keep their files byte-for-byte.

    Purged days (a refreshed day whose base-lake rows were ALL deleted
    — restatement, GDPR) write nothing under dynamic overwrite, so
    their stale rollup partitions are dropped explicitly via Hadoop FS
    — a classic-Spark-only dependency (py4j `_jvm` access; unavailable
    under Spark Connect, where this raises with a clear message rather
    than silently serving deleted data). The drop runs BEFORE the
    overwrite: the two partition sets are disjoint, and deleting first
    means a failure between the steps leaves purged days already gone
    (correct, just early) instead of serving deleted data until the
    next refresh. Drop + overwrite is still not one atomic commit —
    a retry of the same call converges either way."""
    days = sorted(set(days))
    if not days:
        return
    slice_df = events_lake.filter(F.col(day_col).isin(days))
    fresh = hourly_rollup(slice_df, **rollup_kwargs).localCheckpoint(eager=False)
    present = {str(r.day) for r in fresh.select("day").distinct().collect()}
    purged = [d for d in days if d not in present]
    if purged:
        spark = events_lake.sparkSession
        jvm = getattr(spark, "_jvm", None)
        jsc = getattr(spark, "_jsc", None)
        if jvm is None or jsc is None:
            raise RuntimeError(
                "refresh_hourly_rollup needs classic-Spark Hadoop FS access to drop "
                f"purged day partitions {purged}; under Spark Connect delete "
                f"{rollup_path}/day=<day> out-of-band before refreshing"
            )
        hconf = jsc.hadoopConfiguration()
        for day in purged:
            jpath = jvm.org.apache.hadoop.fs.Path(f"{rollup_path}/day={day}")
            fs = jpath.getFileSystem(hconf)
            if fs.exists(jpath):
                fs.delete(jpath, True)
    overwrite_partitions(fresh, rollup_path, partition_cols=("day",))
