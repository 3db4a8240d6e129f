"""As-of (backward) join — an operator Spark lacks natively (SURVEY
§2.3 note: the reference approximates as-of semantics with yearly
vintage lookups, `1a.R:106-120`; the general operator is a first-class
extension here).

Composition strategy (no UDF, no merge_asof-in-pandas): tag both
sides, union, and take the running `last(right payload)` over a
per-key window ordered by the time axis — right rows sort before left
rows at equal timestamps, giving the standard inclusive (ts_right ≤
ts_left) semantics. One shuffle + sort per key; scales as a plain
window aggregation (vs a range-join blowup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: list[str],
    value_types: dict[str, str] | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right-side value_cols
    at or before its timestamp within the same `by` key (NULL if no
    prior right row). Output: left columns + value_cols.

    `value_types` maps payload column -> Spark type string; columns not
    listed keep the historical default of double (numeric telemetry),
    so existing callers are unchanged while string/date payloads (e.g.
    SCD2 attributes in a point-in-time join) ride through losslessly."""
    tmap = {c: (value_types or {}).get(c, "double") for c in value_cols}
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_vals", F.lit(None).cast(
        "struct<" + ", ".join(f"{c}: {t}" for c, t in tmap.items()) + ">"
    ))
    # a right row with NULL ts has no time position — ascending windows
    # would sort it FIRST (nulls-first) and carry its payload into
    # every early left row; it can never be a valid match, so drop it
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        by,
        ts,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).cast(t).alias(c) for c, t in tmap.items()]).alias("_vals"),
    )
    unioned = l_tag.select(by, ts, "_side", "_vals", *[c for c in left.columns if c not in (by, ts)]).unionByName(
        r_tag, allowMissingColumns=True
    )
    # Tie-break among right rows sharing (key, ts) by the payload
    # struct itself (lexicographic) — otherwise the carried value is
    # shuffle-order-dependent (SURVEY §7.5 determinism rule). Left
    # rows (NULL payload) sort last at their timestamp but after
    # the equal-ts right rows either way (_side=1 > _side=0).
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_vals").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_carry", F.last("_vals", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_vals")
    for c in value_cols:
        out = out.withColumn(c, F.when(F.col(ts).isNotNull(), F.col(f"_carry.{c}")))
    return out.drop("_carry")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Forward variant: for each left row, the NEXT right-side
    value_cols at or after its timestamp within the same `by` key
    ("what happened next" joins). Same union + running-carry plan as
    the backward form, with the window ordered DESC so the carry runs
    from the future toward each left row; right rows still outrank
    left rows at equal timestamps (inclusive ts_right >= ts_left)."""
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_vals", F.lit(None).cast(
        "struct<" + ", ".join(f"{c}: double" for c in value_cols) + ">"
    ))
    # a right row with NULL ts has no time position — ascending windows
    # would sort it FIRST (nulls-first) and carry its payload into
    # every early left row; it can never be a valid match, so drop it
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        by,
        ts,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).cast("double").alias(c) for c in value_cols]).alias("_vals"),
    )
    unioned = l_tag.select(
        by, ts, "_side", "_vals", *[c for c in left.columns if c not in (by, ts)]
    ).unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).desc(), F.col("_side").asc(), F.col("_vals").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_carry", F.last("_vals", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_vals")
    for c in value_cols:
        out = out.withColumn(c, F.when(F.col(ts).isNotNull(), F.col(f"_carry.{c}")))
    return out.drop("_carry")


def asof_join_backward_tolerance(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: list[str],
    tolerance_s: int,
    keep_match_ts: str | None = None,
) -> DataFrame:
    """Backward as-of with a max-staleness bound (pandas
    merge_asof(tolerance=...)): the carried right-side values are
    NULLed when the matched row is older than `tolerance_s` seconds —
    "use the last quote unless it's stale". Same single-window plan;
    the right-side timestamp rides inside the carry struct so the age
    check is a per-row projection afterwards. `keep_match_ts` also
    surfaces the matched right-side TIMESTAMP under that name (NULL
    when unmatched/stale) — what attribution consumers join credit to;
    `value_cols` may be empty when the match time is all you need."""
    fields = ["_rts: bigint"] + [f"{c}: double" for c in value_cols]
    payload_t = "struct<" + ", ".join(fields) + ">"
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_vals", F.lit(None).cast(payload_t)
    )
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        by,
        ts,
        F.lit(0).alias("_side"),
        F.struct(
            F.unix_micros(F.col(ts)).alias("_rts"),
            *[F.col(c).cast("double").alias(c) for c in value_cols],
        ).alias("_vals"),
    )
    unioned = l_tag.select(
        by, ts, "_side", "_vals", *[c for c in left.columns if c not in (by, ts)]
    ).unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_vals").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_carry", F.last("_vals", ignorenulls=True).over(w))
    fresh = (F.unix_micros(F.col(ts)) - F.col("_carry._rts")) <= tolerance_s * 1_000_000
    out = carried.filter(F.col("_side") == 1).drop("_side", "_vals")
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col(ts).isNotNull() & fresh, F.col(f"_carry.{c}"))
        )
    if keep_match_ts is not None:
        out = out.withColumn(
            keep_match_ts,
            F.when(F.col(ts).isNotNull() & fresh, F.timestamp_micros(F.col("_carry._rts"))),
        )
    return out.drop("_carry")
