"""Reporting / chart-data ETL layer — the reference's `3b. Descriptive
stats.R`, `3c. Maps and provider stats.R`, and `Strategy Unit
Update/Charts.R` patterns over the summary-stats lake.

Patterns covered (SURVEY §3.3):
  * monthyear label → DateType + COVID-period bucketing (3b.R:80-87);
  * grouped sums + volume-weighted means per period (3b.R:99-103);
  * grouped-mutate window totals → shares (3c.R:455-463);
  * sequential double pivot: IS sector then COVID period
    (3b.R:105-118) — composite `value.key` column naming replicated;
  * per-capita metrics against inline literal population tables
    (3c.R:432-441, 3c.R:656-658);
  * pre/post deltas via pivot-then-subtract (3b.R:119-120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.functions.labels import covid_period, monthyr_to_date

# Inline literal population tables (3c.R:432-441 / 3c.R:656-658 use
# 2020 region / IMD-quintile populations committed in code).
REGION_POP_2020 = [
    ("East Of England", 6_236_072),
    ("London", 9_002_488),
    ("Midlands", 10_704_906),
    ("North East And Yorkshire", 8_566_925),
    ("North West", 7_367_456),
    ("South East", 9_217_629),
    ("South West", 5_659_143),
]

IMD_QUINTILE_POP_2020 = [("1", 11_104_868), ("2", 11_270_923), ("3", 11_281_704), ("4", 11_344_245), ("5", 11_258_440)]


def with_period(df: DataFrame, monthyear_col: str = "monthyear") -> DataFrame:
    """Derive DateType + COVID bucket from the 'Apr20' label."""
    d = monthyr_to_date(F.col(monthyear_col))
    return df.withColumn("month_start", d).withColumn("covid_period", covid_period(F.col("month_start")))


def period_summary(
    stats: DataFrame,
    group_cols: list[str],
    value_col: str = "`total.patients`",
) -> DataFrame:
    """Grouped sums per COVID period (3b.R:99-103)."""
    return (
        with_period(stats)
        .groupBy(*group_cols, "covid_period")
        .agg(F.sum(F.expr(value_col)).cast("long").alias("total"))
    )


def add_share_within(df: DataFrame, part_cols: list[str], value_col: str = "total") -> DataFrame:
    """Window group-total → percentage share (3c.R:455-463)."""
    w = Window.partitionBy(*part_cols)
    return df.withColumn(
        "share_pct",
        F.round(100.0 * F.col(value_col) / F.sum(value_col).over(w), 1),
    )


def double_pivot(
    summary: DataFrame,
    keys: list[str],
    first_pivot: str = "independent",
    first_values: tuple[str, ...] = ("IS", "Non-IS", "All"),
    second_pivot: str = "covid_period",
    second_values: tuple[str, ...] = ("pre", "during", "post"),
    value_col: str = "total",
) -> DataFrame:
    """Sequential two-level pivot (3b.R:105-118): output columns use
    the reference's composite `value.key` naming: total.IS.pre etc.
    One groupBy+pivot pass over the combined key (no two-stage
    reshuffle): pivot on concat(first, '.', second)."""
    combined = F.concat_ws(".", F.col(first_pivot), F.col(second_pivot))
    cols = [f"{a}.{b}" for a in first_values for b in second_values]
    out = (
        summary.withColumn("_pk", combined)
        .groupBy(*keys)
        .pivot("_pk", cols)
        .agg(F.first(value_col))
    )
    renames = {c: f"{value_col}.{c}" for c in cols}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def per_capita(
    df: DataFrame,
    spark: SparkSession,
    region_col: str = "region",
    value_col: str = "total",
    per: int = 100_000,
) -> DataFrame:
    """Per-capita rate against the literal 2020 region population
    table (3c.R:432-441) — a broadcast join of a 7-row literal."""
    pop = spark.createDataFrame(REGION_POP_2020, ["_region", "pop20"])
    return (
        df.join(F.broadcast(pop), df[region_col] == pop["_region"], "left")
        .withColumn(f"{value_col}_per_{per}", F.round(F.col(value_col) * per / F.col("pop20"), 2))
        .drop("_region")
    )


def delta_pre_post(
    pivoted: DataFrame,
    pre_col: str,
    post_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """Pivot-then-subtract delta (3b.R:119-120)."""
    return pivoted.withColumn(out_col, F.col(f"`{post_col}`") - F.col(f"`{pre_col}`"))
