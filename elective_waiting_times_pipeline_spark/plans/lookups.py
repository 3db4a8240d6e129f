"""Dimension-table ETL — the reference's `1a. Clean deprivation and
regional lookup data.R` and the relational parts of `1c. Look for
provider locations.R`, Spark-first.

Covers:
  * LSOA→CCG vintage unpivot (1a.R:58 pivot_longer);
  * population-weighted IMD score per CCG (1a.R:114 weighted.mean —
    NA-propagating variant: any NULL score nullifies the group, unlike
    the na.rm call sites; both offered);
  * inverted ntile deciles/quintiles per vintage (1a.R:117-118,
    `11 - ntile(x,10)` / `6 - ntile(x,5)`);
  * provider postcode stacking from NHS org files with first-wins
    dedup (1c.R:78-127, pinned order — R keeps file order);
  * best-geocode-per-provider top-1 (1c.R:412-416
    `top_n(1, abs(number_results))`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.sources.readers import union_by_name


def unpivot_vintages(wide: DataFrame, id_col: str, vintage_cols: list[str]) -> DataFrame:
    """LSOA→CCG vintage columns to long (lsoa, ccg_year, ccg) rows
    (1a.R:58)."""
    stack_args = ", ".join(f"'{c}', `{c}`" for c in vintage_cols)
    return wide.selectExpr(
        f"`{id_col}` AS lsoa",
        f"stack({len(vintage_cols)}, {stack_args}) AS (ccg_year, ccg)",
    ).filter(F.col("ccg").isNotNull())


def weighted_imd_by_ccg(
    lsoa_ccg: DataFrame,
    lsoa_imd: DataFrame,
    lsoa_pop: DataFrame,
    na_rm: bool = False,
) -> DataFrame:
    """Population-weighted mean IMD score per (ccg_year, ccg)
    (1a.R:106-114). `na_rm=False` replicates R's default
    weighted.mean NA-propagation: any NULL score → NULL group score
    (SURVEY §7.5: the call sites differ; both semantics supported)."""
    j = (
        lsoa_ccg.join(lsoa_imd, "lsoa", "left")
        .join(lsoa_pop, "lsoa", "left")
    )
    # R's weighted.mean returns NA whenever a WEIGHT is NA, under both
    # na.rm settings (na.rm removes NA x's, not NA w's) — a NULL pop
    # from the left join must therefore poison the group, never be
    # silently dropped by SUM's null-skipping
    any_null_w = F.max(F.col("pop").isNull().cast("int")) == 1
    if na_rm:
        num = F.sum(F.col("imd_score") * F.col("pop"))
        den = F.sum(F.when(F.col("imd_score").isNotNull(), F.col("pop")))
        wmean = F.when(any_null_w, F.lit(None)).otherwise(num / den)
    else:
        any_null = F.max(F.col("imd_score").isNull().cast("int")) == 1
        wmean = F.when(any_null_w | any_null, F.lit(None)).otherwise(
            F.sum(F.col("imd_score") * F.col("pop")) / F.sum("pop")
        )
    return j.groupBy("ccg_year", "ccg").agg(wmean.alias("weighted_imd_score"))


def imd_deciles(weighted: DataFrame) -> DataFrame:
    """Inverted deciles/quintiles per vintage partition (1a.R:117-118):
    most deprived (highest score) = decile 1. Ties broken by ccg code
    for distributed determinism. NULL scores get NULL buckets (R's
    11 - ntile(NA) is NA) and never consume a tile slot — Spark's
    ascending sort would otherwise rank NULLs first, crowning a
    missing-data CCG 'least deprived' and shifting every real bucket."""
    w = Window.partitionBy("ccg_year").orderBy("weighted_imd_score", "ccg")
    scored = weighted.filter(F.col("weighted_imd_score").isNotNull()).select(
        "ccg_year",
        "ccg",
        "weighted_imd_score",
        (F.lit(11) - F.ntile(10).over(w)).alias("imd_decile"),
        (F.lit(6) - F.ntile(5).over(w)).alias("imd_quintile"),
    )
    nulls = weighted.filter(F.col("weighted_imd_score").isNull()).select(
        "ccg_year",
        "ccg",
        "weighted_imd_score",
        F.lit(None).cast("int").alias("imd_decile"),
        F.lit(None).cast("int").alias("imd_quintile"),
    )
    return scored.unionByName(nulls)


def stack_org_files(
    org_frames: dict[str, DataFrame],
    row_order_col: str | None = None,
) -> DataFrame:
    """NHS org files (etrust/ephpsite/.../etr; headerless V1/V2/V10 =
    code/name/postcode, 1c.R:78-123) stacked with a source-order
    column, then first-wins dedup per provider code pinned to that
    order (R's !duplicated keeps the first file's row).

    Within-file order: monotonically_increasing_id is only faithful on
    a single partition, so multi-partition inputs are coalesced to one
    first — coalesce is shuffle-free and concatenates scan splits in
    byte-offset order, so the stamped order is the file's row order.
    These are KB-scale dimension files; one partition is the right
    plan. Callers that already carry a stable order (e.g. stamped at a
    distributed ingest edge) pass it as `row_order_col` and skip the
    coalesce."""
    tagged = []
    for i, df in enumerate(org_frames.values()):
        if row_order_col is not None:
            order = F.col(row_order_col).alias("_row_order")
        else:
            if df.rdd.getNumPartitions() > 1:
                df = df.coalesce(1)
            order = F.monotonically_increasing_id().alias("_row_order")
        tagged.append(
            df.select(
                F.col("V1").alias("provider_code"),
                F.col("V2").alias("provider_name"),
                F.col("V10").alias("postcode"),
                F.lit(i).alias("_src_order"),
                order,
            )
        )
    stacked = union_by_name(tagged)
    w = Window.partitionBy("provider_code").orderBy("_src_order", "_row_order")
    return (
        stacked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_order", "_row_order")
    )


def best_geocode_per_provider(geocoded: DataFrame) -> DataFrame:
    """Keep the geocode row with max |number_results| per provider
    (1c.R:412-416 top_n). R's top_n keeps ties — replicated with
    rank() (not row_number) so tie rows survive."""
    w = Window.partitionBy("provider_code").orderBy(F.abs(F.col("number_results")).desc())
    return geocoded.withColumn("_rk", F.rank().over(w)).filter(F.col("_rk") == 1).drop("_rk")
