"""Dense time-series operators: gap-filling (LOCF) and rolling
anomaly detection over bucketed event series.

Both operators follow the same scale discipline: the only pass over
the raw event log is ONE hash aggregation to (group, time-bucket)
rows — map-side partial agg, a shuffle of a few long columns. Every
window after that runs over the bucketed series, whose size is
|groups| x |buckets| regardless of corpus size (a year of hourly
buckets is <9k rows per group at 100 TB just as at sf0.001).

Determinism across engines (the DuckDB oracles hash-match): all
sums are scaled-long integer math (registry.sl2), per-bucket means
are snapped to integer micros with floor(x + 0.5) before any rolling
statistic, and rolling sums are therefore exact longs; the final
mean/variance/z-score arithmetic is a fixed sequence of IEEE-754
double ops on identical integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.plans.registry import sl2


def bucket_series(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly bucket aggregate: (group, bucket, n_events, sv) where
    sv is the scaled-long (x100) value sum. The one pass over the raw
    log; everything downstream is sized by the bucket grid."""
    return events.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("HOUR", F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum(sl2(value_col)).alias("sv"))


def _avg_cents() -> Column:
    """Per-bucket mean snapped to integer CENTS: floor(sv/n + .5) (sv
    is already x100). Cents — not micros — keep the rolling
    sum-of-squares far from int64 overflow: 24 * (100*mean)^2 wraps
    only past |mean| ~ 6e6 (micros would wrap at |mean| ~ 620).
    z-scores are scale-invariant, so the coarser snap costs at most
    ±0.005 of input quantization, identically in both engines."""
    return F.floor(F.col("sv") / F.col("n_events") + 0.5).cast("long")


def gapfill_locf(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series per group with last-observation-carried-
    forward fill (the hypertable `time_bucket_gapfill` + `locf`
    pattern).

    Plan: bucket agg (one shuffle) -> per-group min/max bounds (tiny)
    -> sequence() explode builds the dense grid -> left join buckets
    onto the grid -> last(ignorenulls) window carries values across
    gaps. The grid and both windows are |groups| x |hours| rows — at
    100 TB the raw log never re-shuffles and the grid stays tiny, so
    the whole fill costs one aggregation of the fact table.
    """
    # the bucket agg feeds BOTH the bounds branch and the grid join;
    # without a checkpoint Spark re-runs the fact-table scan+agg for
    # each (verified: no ReusedExchange — the branches prune different
    # columns). localCheckpoint pins the tiny bucketed series once.
    agg = bucket_series(events, group_col, ts_col, value_col).localCheckpoint(eager=False)
    bounds = agg.groupBy("grp").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    grid = bounds.select(
        "grp",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    joined = grid.join(agg, ["grp", "bucket"], "left")
    w = Window.partitionBy("grp").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    avg_value = F.when(
        F.col("n_events").isNotNull(), F.round(F.col("sv") / 100.0 / F.col("n_events"), 6)
    )
    return (
        joined.select(
            "grp",
            "bucket",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            avg_value.alias("avg_value"),
        )
        .withColumn("filled_value", F.last("avg_value", ignorenulls=True).over(w))
        .withColumn("is_gap", (F.col("n_events") == 0))
        .withColumnRenamed("grp", group_col)
    )


def rolling_zscore(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 24,
    min_buckets: int = 8,
    threshold: float = 3.0,
) -> DataFrame:
    """Bucket-level anomaly detection: each hourly bucket's mean value
    is z-scored against the trailing `lookback` buckets (current bucket
    EXCLUDED, so an anomalous hour cannot mask itself), flagged when
    |z| > threshold.

    The rolling mean/std run over the bucketed series only — exact
    long sums of the micro-snapped bucket means (sum and sum-of-squares
    fit comfortably in int64 for a 24-bucket frame), so the window
    state is two longs + a count no matter the corpus size. Buckets
    with fewer than `min_buckets` trailing observations or zero
    trailing variance get a NULL z (cold start / constant series).
    """
    agg = bucket_series(events, group_col, ts_col, value_col).withColumn("au", _avg_cents())
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(-lookback, -1)
    )
    # count observations (au non-NULL), not frame rows: an all-NULL
    # bucket would inflate n and bias mean/var downward
    n = F.count("au").over(w)
    s = F.sum("au").over(w)
    ss = F.sum(F.col("au") * F.col("au")).over(w)
    mean = s / n
    var = ss / n - mean * mean
    z = F.when(
        (n >= min_buckets) & (var > 0),
        F.round((F.col("au") - mean) / F.sqrt(var), 6),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "bucket",
        F.round(F.col("sv") / 100.0 / F.col("n_events"), 6).alias("bucket_avg"),
        z.alias("z_score"),
    ).withColumn(
        "is_anomaly",
        F.when(F.col("z_score").isNotNull(), F.abs(F.col("z_score")) > threshold).otherwise(
            F.lit(False)
        ),
    )


def dyadic_ewma(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 24,
) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2 per observed
    bucket) over the hourly series, EXACTLY deterministic across
    engines: weights are dyadic (2^i), the bucket means are
    cent-snapped longs (au << 23 stays in int64 for |mean| up to
    ~5e9), so numerator (sum of au_i << i) and
    denominator (2^L - 1) are exact integers — the only float op is
    one final division. The frame is the trailing `lookback` OBSERVED
    buckets (a gap does not decay the average; compose with
    gapfill_locf first for wall-clock decay). Window state is a
    <=`lookback`-element long array over the bucketed series, never
    the raw log."""
    agg = bucket_series(events, group_col, ts_col, value_col).withColumn("au", _avg_cents())
    w = Window.partitionBy("grp").orderBy("bucket").rowsBetween(-(lookback - 1), 0)
    # SQL-expression form: shiftleft's Column-API binding takes only a
    # literal bit count, but the SQL function accepts the lambda index.
    arr = agg.withColumn("arr", F.collect_list("au").over(w))
    num = "aggregate(transform(arr, (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)), CAST(0 AS BIGINT), (a, x) -> a + x)"
    den = "(shiftleft(CAST(1 AS BIGINT), size(arr)) - 1)"
    return arr.select(
        F.col("grp").alias(group_col),
        "bucket",
        F.round(F.col("au") / 100.0, 6).alias("bucket_avg"),
        F.round(F.expr(f"try_divide(CAST({num} AS DOUBLE), {den})") / 100.0, 6).alias("ewma"),
    )


def gapfill_interpolate(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series with LINEAR interpolation across gaps (the
    hypertable `interpolate()` companion to gapfill_locf): a gap
    bucket gets prev + (next - prev) * (t - t_prev)/(t_next - t_prev)
    from its nearest observed neighbors. Same one-fact-aggregation
    plan as gapfill_locf plus a mirrored forward-looking window; the
    interpolation weights are exact integer hour offsets, so the
    arithmetic replays identically in the oracle."""
    agg = bucket_series(events, group_col, ts_col, value_col).localCheckpoint(eager=False)
    bounds = agg.groupBy("grp").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    grid = bounds.select(
        "grp", F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    joined = grid.join(agg, ["grp", "bucket"], "left")
    avg_value = F.when(
        F.col("n_events").isNotNull(), F.round(F.col("sv") / 100.0 / F.col("n_events"), 6)
    )
    hours = (F.unix_micros("bucket") / 3_600_000_000).cast("long")
    base = joined.select(
        "grp",
        "bucket",
        hours.alias("h"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        avg_value.alias("avg_value"),
        F.when(avg_value.isNotNull(), hours).alias("h_obs"),
    )
    wb = Window.partitionBy("grp").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.partitionBy("grp").orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last("avg_value", ignorenulls=True).over(wb)
    prev_h = F.last("h_obs", ignorenulls=True).over(wb)
    next_v = F.first("avg_value", ignorenulls=True).over(wf)
    next_h = F.first("h_obs", ignorenulls=True).over(wf)
    # h_obs keys on avg_value (not n_events): a bucket whose events all
    # carry NULL values is no interpolation endpoint — advancing the
    # hour without the value would blend mismatched (value, hour)
    # pairs. try_divide still guards the single-endpoint 0/0 edge.
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        F.round(
            prev_v
            + (next_v - prev_v)
            * F.try_divide(
                (F.col("h") - prev_h).cast("double"), (next_h - prev_h).cast("double")
            ),
            6,
        )
    )
    return (
        base.withColumn("filled_value", interp)
        .withColumn("is_gap", F.col("n_events") == 0)
        .select(
            F.col("grp").alias(group_col),
            "bucket",
            "n_events",
            "avg_value",
            "filled_value",
            "is_gap",
        )
    )
