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
from elective_waiting_times_pipeline_spark.functions.ordering import REGION_ORDER, category_rank

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
    # try_divide: a zero-total group yields NULL shares instead of an
    # ANSI DIVIDE_BY_ZERO abort (Spark 4 default; R gives NaN there)
    return df.withColumn(
        "share_pct",
        F.round(F.try_divide(100.0 * F.col(value_col), F.sum(value_col).over(w)), 1),
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


def deprivation_quintile_chart(
    extract: DataFrame,
    specialty: str,
    sector: str = "Independent Sector",
    measure: str = "Inpatient admissions",
) -> DataFrame:
    """Deprivation-quintile share table (Charts.R:212-251, chart4a/4b):
    from a long national extract (der_activity_month, var_1 =
    IMD quintile, name, prop, sector, value), keep one sector+measure,
    pivot the quintile wide with `prop` as values, stamp the specialty
    literal, and rename the edge quintiles to the reference's display
    headers. One groupBy+pivot pass; callers stack specialties like
    plyr::rbind.fill (union_by_name)."""
    wide = (
        extract.filter((F.col("sector") == sector) & (F.col("name") == measure))
        .groupBy(F.lit(specialty).alias("specialty"), "der_activity_month")
        .pivot("var_1", [1, 2, 3, 4, 5])
        # max, not first: the cell is unique in the committed extracts,
        # but max keeps the pivot deterministic if a feed ever dupes
        .agg(F.max("prop"))
    )
    return wide.withColumnsRenamed(
        {"1": "1 (most deprived)", "5": "5 (least deprived)"}
    )


def category_share_chart(
    extract: DataFrame,
    specialty: str,
    sector: str = "Independent Sector",
    measure: str = "Inpatient admissions",
) -> DataFrame:
    """Ethnicity share table (Charts.R:257-291, chart5a/5b): the
    deprivation chart's DYNAMIC-pivot sibling — var_1 here is a
    data-driven category set (ethnic groups), so the pivot discovers
    its columns (Spark runs the distinct-values pass internally and
    sorts them; at scale pass an explicit list to skip that job).
    Same filter + prop values + specialty stamp; no column renames."""
    return (
        extract.filter((F.col("sector") == sector) & (F.col("name") == measure))
        .groupBy(F.lit(specialty).alias("specialty"), "der_activity_month")
        .pivot("var_1")
        .agg(F.max("prop"))
    )


_UNDER_3M_BANDS = ["0-50", "50-100"]


def waitband_3m_chart(
    extract: DataFrame,
    specialty: str,
    measure: str = "Inpatient admissions",
) -> DataFrame:
    """Waiting-band rollup share (Charts.R:405-447, chart8 dynamic):
    from a banded yearly extract (year, var_1 = day band, sector,
    prop), bucket the bands into Under/Over 3 months (the reference's
    case_when), SUM the proportions per (year, sector) bucket
    (na.rm ≡ Spark's null-skipping sum), keep the under-3m bucket, and
    pivot the sector wide — the "share of patients treated within 3
    months" trend per sector."""
    bucket = F.when(F.col("var_1").isin(_UNDER_3M_BANDS), "Under 3m").otherwise("Over 3m")
    return (
        extract.filter(F.col("name") == measure)
        .groupBy(
            "year",
            F.lit(specialty).alias("specialty"),
            "sector",
            bucket.alias("time_3m"),
        )
        .agg(F.sum("prop").alias("prop"))
        .filter(F.col("time_3m") == "Under 3m")
        .groupBy("year", "specialty", "time_3m")
        .pivot("sector", ["Independent Sector", "NHS"])
        .agg(F.max("prop"))
    )


def is_share_chart(extract: DataFrame, measure: str = "Inpatient admissions") -> DataFrame:
    """Independent-sector share chart table (Charts.R:39-102, chart2a/
    chart2b): from a long national extract (der_activity_month, type,
    speciality, name, value), keep one measure, pivot provider `type`
    wide, then stack a "Number of treatments" grid (counts, share NULL)
    over a share grid (share = IS/(IS+NHS)*100, counts NULL) — the
    exact two-panel table the reference writes to chart2.csv. Column
    names keep the reference's display headers. One groupBy+pivot pass
    per extract; callers stack per-file results like plyr::rbind.fill."""
    wide = (
        extract.filter(F.col("name") == measure)
        .groupBy("speciality", "der_activity_month")
        .pivot("type", ["Independent Sector", "NHS"])
        .agg(F.first("value"))
    )
    return _two_panel_grid(wide, "speciality")


def _two_panel_grid(wide: DataFrame, key_col: str) -> DataFrame:
    """The reference's two-panel chart stack (chart2/6/7): a counts
    grid (share NULL) over a share grid (counts NULL), keyed by
    `key_col` + month, from a wide (Independent Sector, NHS) table."""
    share_col = "Independent sector share of total treatments (%)"
    part_a = wide.select(
        key_col,
        "der_activity_month",
        F.lit("Number of treatments").alias("Grid"),
        F.lit(None).cast("double").alias(share_col),
        F.col("Independent Sector"),
        F.col("NHS"),
    )
    part_b = wide.select(
        key_col,
        "der_activity_month",
        F.lit("Independent sector share of total treatments (%)").alias("Grid"),
        # try_divide: a zero-treatment month is a NULL share, not an
        # ANSI DIVIDE_BY_ZERO abort of the whole chart job
        (
            F.try_divide(
                F.col("Independent Sector"), F.col("Independent Sector") + F.col("NHS")
            )
            * 100
        ).alias(share_col),
        F.lit(None).cast("double").alias("Independent Sector"),
        F.lit(None).cast("double").alias("NHS"),
    )
    return part_a.unionByName(part_b)


def procedure_share_chart(
    extract: DataFrame,
    specialty: str,
    procedures: list[str],
) -> DataFrame:
    """Procedure-level two-panel grid (Charts.R:296-357, chart6ab/
    chart7abc): from a procedure-grain extract (speciality,
    procedure_desc_short, der_activity_month, type, n_spells_IP ...),
    keep one specialty's named procedures (the %in% filter), pivot
    provider `type` wide on inpatient spells, and stack the same
    counts-over-share panels as chart2 — keyed by procedure."""
    wide = (
        extract.filter(
            (F.col("speciality") == specialty)
            & F.col("procedure_desc_short").isin(procedures)
        )
        .groupBy("procedure_desc_short", "der_activity_month")
        .pivot("type", ["Independent Sector", "NHS"])
        .agg(F.max("n_spells_IP"))
    )
    return _two_panel_grid(wide, "procedure_desc_short")


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
        .drop("_region", "pop20")
    )


def ratio_started_vs_completed(stats: DataFrame, geo_col: str = "ccg") -> DataFrame:
    """Started-vs-completed pathway ratio analysis (`3d. Ratio.R`):
    per (month, geo, specialty, IS-bucket), the number of pathways
    started (newRTT) for each one finished (completed admitted +
    non-admitted) and for each one admitted.

    The reference re-runs the stat kernel 6× per month and merges on a
    5-column key (3d.R:104-105); here it's one pivot over the already-
    computed dashboard stats. The reference's 'Total' bucket (IS +
    Non-IS summed, 3d.R:104-110) is the engine's 'All' grouping set.
    Provider labels follow 3d.R: IS→IS, Non-IS→NHS, All→Total.
    """
    keys = ["monthyear", geo_col, "specialty", "independent"]
    piv = (
        stats.filter(F.col("type").isin("newRTT", "completeadmitted", "completenonadmitted"))
        .groupBy(*keys)
        .pivot("type", ["newRTT", "completeadmitted", "completenonadmitted"])
        .agg(F.first("`total.patients`"))
    )
    completed = F.coalesce("completeadmitted", F.lit(0)) + F.coalesce("completenonadmitted", F.lit(0))
    provider = (
        F.when(F.col("independent") == "IS", "IS")
        .when(F.col("independent") == "Non-IS", "NHS")
        .otherwise("Total")
    )
    return piv.select(
        *keys,
        monthyr_to_date(F.col("monthyear")).alias("date"),
        provider.alias("Provider"),
        F.col("newRTT").alias("started"),
        completed.alias("completed"),
        F.col("completeadmitted").alias("admitted"),
        (F.col("newRTT") / F.nullif(completed, F.lit(0))).alias("prop_all"),
        (F.col("newRTT") / F.nullif(F.col("completeadmitted"), F.lit(0))).alias("prop_adm"),
    )


def apply_patches(
    df: DataFrame,
    patches: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Manual override table for known-bad rows (the reference patches
    region conflicts with a hand-maintained list,
    `IS_election_blog.R:89-106`): broadcast-left-join the patch rows
    and COALESCE(patch value, original). Patch rows with NULL values
    leave the original untouched."""
    renamed = patches.select(
        *[F.col(k).alias(f"_pk_{k}") for k in key_cols],
        *[F.col(v).alias(f"_pv_{v}") for v in value_cols],
    )
    cond = None
    for k in key_cols:
        c = df[k] == F.col(f"_pk_{k}")
        cond = c if cond is None else (cond & c)
    out = df.join(F.broadcast(renamed), cond, "left")
    for v in value_cols:
        out = out.withColumn(v, F.coalesce(F.col(f"_pv_{v}"), F.col(v)))
    return out.drop(*[f"_pk_{k}" for k in key_cols], *[f"_pv_{v}" for v in value_cols])


UNDER_3M_BUCKETS = ("0-50", "50-100")
UNDER_YEAR_BUCKETS = ("0-50", "50-100", "100-150", "150-200", "200-250", "250-300", "300-350")
ALL_DAY_BUCKETS = UNDER_YEAR_BUCKETS + ("350-400", "400-450", "450-500")


def rebucket_day_waits(
    su_5x: DataFrame,
    sectors: tuple[str, ...] = ("Independent Sector", "NHS"),
    horizon: str = "3m",
) -> DataFrame:
    """Strategy-Unit wait-distribution re-bucketing (`Charts.R:398-425`):
    50-day buckets → Under/Over 3 months (horizon='3m') or Under/Over
    a year (horizon='year' — the reference's time_year ladder),
    proportions summed per (year, sector), then sector pivot with
    `prop.<sector>` composite names. One groupBy+pivot pass."""
    if horizon == "3m":
        under, labels = UNDER_3M_BUCKETS, ("Under 3m", "Over 3m")
    elif horizon == "year":
        under, labels = UNDER_YEAR_BUCKETS, ("Under a year", "Over a year")
    else:
        raise ValueError(f"horizon must be '3m' or 'year', got {horizon!r}")
    # the reference's if_else(var_1 %in% under, Under, Over): anything
    # not explicitly under-horizon is OVER — including buckets beyond
    # the known ladder ('500-550', '500+'), which a closed whitelist
    # would misroute into a spurious bucket and understate long waits
    bucket = F.when(F.col("var_1").isin(*under), labels[0]).otherwise(labels[1])
    out = (
        su_5x.withColumn("time_bucket", bucket)
        .groupBy("year", "time_bucket")
        .pivot("sector", list(sectors))
        .agg(F.sum("prop"))
    )
    for s in sectors:
        out = out.withColumnRenamed(s, f"prop.{s}")
    return out


def casemix_presentation(
    casemix: DataFrame,
    region_col: str = "region",
    pathway_col: str = "Pathway",
    specialty_col: str = "Specialty",
    value_col: str = "avg_IS",
) -> DataFrame:
    """Region casemix table presentation ordering (3c.R:627-645):
    pin the 'Total' specialty to the top of each (pathway, region)
    block by forcing its sort value to 1000 (the reference's trick),
    then arrange by pathway, custom region order (England first, then
    the eight NHS regions — `category_rank`, replacing the reference's
    case_when ladder), and value descending. Output-table-sized sort —
    presentation layer, not mid-pipeline."""
    pinned = casemix.withColumn(
        "_sort_val",
        F.when(F.col(specialty_col) == "Total", F.lit(1000.0)).otherwise(
            F.col(value_col).cast("double")
        ),
    )
    return pinned.orderBy(
        F.col(pathway_col),
        category_rank(region_col, REGION_ORDER),
        F.col("_sort_val").desc(),
    ).drop("_sort_val")


def delta_pre_post(
    pivoted: DataFrame,
    pre_col: str,
    post_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """Pivot-then-subtract delta (3b.R:119-120)."""
    return pivoted.withColumn(out_col, F.col(f"`{post_col}`") - F.col(f"`{pre_col}`"))


def heatmap_chart(eye: DataFrame, ortho: DataFrame) -> DataFrame:
    """Regional heatmap table (Charts.R:135-181, chart3_heat): from the
    two sub-national extracts (der_activity_month, var_1=region, name,
    prop, sector, value), keep Independent Sector inpatient admissions,
    label each month "MMM yy" (lubridate month abbr + 2-digit year),
    tag the specialty, stack the two files, and attach `region_rank` —
    the reference's fct_relevel ordering: regions sorted by DESCENDING
    mean ophthalmology share since 2022-01-01 (Charts.R:169-176).
    The rank is a ~7-row broadcast relation (one per region), so the
    custom categorical order costs no extra corpus pass."""
    def slice_one(df: DataFrame, specialty: str) -> DataFrame:
        return (
            df.filter(
                (F.col("sector") == "Independent Sector")
                & (F.col("name") == "Inpatient admissions")
            )
            .select(
                "der_activity_month",
                F.col("var_1").alias("region"),
                F.lit(specialty).alias("specialty"),
                "prop",
                F.concat_ws(
                    " ",
                    F.date_format("der_activity_month", "MMM"),
                    F.date_format("der_activity_month", "yy"),
                ).alias("monthyear"),
            )
        )

    stacked = slice_one(eye, "Ophthalmology").unionByName(slice_one(ortho, "Orthopaedic"))
    order_src = stacked.filter(
        (F.col("der_activity_month") >= F.lit("2022-01-01").cast("date"))
        & (F.col("specialty") == "Ophthalmology")
    )
    from pyspark.sql import Window

    # rank over ALL regions, not just those in the ordering slice —
    # fct_relevel keeps unmatched levels (they sort after the ordered
    # ones, alphabetically here for determinism); the mean share is
    # snapped to ppm so a ~1-ulp float difference between engines or
    # layouts can never flip a rank
    mean_ppm = F.floor(F.avg("prop") * 1000000 + 0.5).cast("long")
    ordered = order_src.groupBy(F.col("region").alias("_r")).agg(mean_ppm.alias("_mp"))
    all_regions = stacked.select(F.col("region").alias("_r")).distinct()
    ranks = (
        all_regions.join(ordered, "_r", "left")
        # ~7 regions: the rank window rides a dim-sized axis
        .withColumn(
            "region_rank",
            F.row_number().over(Window.orderBy(F.desc_nulls_last("_mp"), "_r")),
        )
        .select("_r", "region_rank")
    )
    return stacked.join(
        F.broadcast(ranks), stacked["region"] == ranks["_r"], "left"
    ).select("der_activity_month", "region", "specialty", "prop", "monthyear", "region_rank")
