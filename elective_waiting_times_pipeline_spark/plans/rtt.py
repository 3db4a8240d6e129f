"""RTT dashboard-statistics engine — the reference's core analytics
(`2. Produce descriptive statistics.R`) re-expressed as ONE Spark pass.

Reference shape (2.R:127-301 provider, 2.R:314-478 ccg, 2.R:492-645
region, 2.R:659-812 imd): a scalar function per (month, geo, specialty,
pathway, IS-bucket) combination, swept over an expand.grid — O(grid)
full-table rescans. Here the whole grid is computed at once:

    fact rows ──melt──▶ (group cols, band, cnt)
        GROUP BY GROUPING SETS ((geo,is),(geo),(is),()) × fixed keys
        ──window cumsum over band──▶ quantile/threshold extraction

The ENGLAND pseudo-group (2.R:148-150: overwrite geo with a constant)
and the independent∈{0,1,2=All} branch (2.R:344-353) are exactly the
four grouping sets. Spark's Expand operator replicates each row 4× into
one shuffle — versus the reference's |grid| rescans.

Semantics replicated exactly:
  * pathway mapping 2.R:69-76 (5 RTT.Part.Description values);
  * specialty renames 2.R:81-90;
  * NONC (private patients) excluded 2.R:318;
  * totals by pathway 2.R:189-228: complete* = band total + unknown
    clock start; incomplete* = band total; newRTT = Total.All only;
  * quantile = (first band with cumsum ≥ q × total.nonmiss) − 1, where
    total.nonmiss is the known-start band total (2.R:237-249);
  * number.18.or.less = cumsum[18]; number.52.or.more = total.nonmiss −
    sum(bands 1..52); rates = round(x/total.nonmiss·100, 1) (2.R:256-261);
  * suppression: stats NULL when total.nonmiss < 20 or type = newRTT
    (2.R:233, 277-298); total.patients itself is never suppressed.

Output columns use the reference's golden names (monthyear, geo, ...,
`total.patients`, `number.18.or.less`, `weeks.50`, ...).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PATHWAY_MAP = {
    "Incomplete Pathways": "incomplete",
    "Completed Pathways For Admitted Patients": "completeadmitted",
    "Completed Pathways For Non-Admitted Patients": "completenonadmitted",
    "Incomplete Pathways with DTA": "incompleteDTA",
    "New RTT Periods - All Patients": "newRTT",
}

SPECIALTY_RENAMES = {
    "Ear, Nose & Throat (ENT)": "Ear Nose and Throat",
    "Geriatric Medicine": "Elderly Medicine",
    "Neurosurgical": "Neurosurgery",
    "Trauma & Orthopaedics": "Trauma and Orthopaedic",
    "Other - Medicals": "Other",
    "Other - Mental Healths": "Other",
    "Other - Others": "Other",
    "Other - Paediatrics": "Other",
    "Other - Surgicals": "Other",
}


def pathway_col(rtt_part: str = "RTT.Part.Description") -> F.Column:
    """case_when ladder of 2.R:69-76."""
    c = F.col(f"`{rtt_part}`")
    chain = None
    for raw, mapped in PATHWAY_MAP.items():
        chain = F.when(c == raw, mapped) if chain is None else chain.when(c == raw, mapped)
    return chain.otherwise(F.lit("NA")).alias("pathway")


def clean_specialty(col: str = "Treatment.Function.Name") -> F.Column:
    """` Service` strip + rename ladder of 2.R:81-90."""
    c = F.regexp_replace(F.col(f"`{col}`"), " Service", "")
    chain = None
    for raw, mapped in SPECIALTY_RENAMES.items():
        chain = F.when(c == raw, mapped) if chain is None else chain.when(c == raw, mapped)
    return chain.otherwise(c).alias("specialty")


def prepare_fact(fact: DataFrame, gt_cols: Sequence[str] | None = None) -> tuple[DataFrame, DataFrame]:
    """From the wide RTT extract (FIXTURES.md §1 schema) derive:
      rows — one row per fact row with group keys + scalar measures;
      long — melted (group keys, band, cnt) with NULL counts dropped.
    Both filtered to NONC-excluded (2.R:318) and pathway != 'NA'.
    """
    if gt_cols is None:
        gt_cols = [c for c in fact.columns if c.startswith("Gt")]
    base = (
        fact.filter(F.col("`Commissioner.Org.Code`") != "NONC")
        .select(
            F.col("monthyr").alias("monthyear"),
            F.col("`Provider.Org.Name`").alias("provider"),
            F.col("`Commissioner.Org.Code`").alias("ccg"),
            F.col("`Commissioner.Org.Name`").alias("ccg_name"),
            pathway_col(),
            clean_specialty(),
            F.col("IS_provider").cast("int").alias("is_provider"),
            F.coalesce(F.col("`Patients.with.unknown.clock.start.date`").cast("long"), F.lit(0)).alias(
                "unknown_start"
            ),
            F.coalesce(F.col("`Total.All`").cast("long"), F.lit(0)).alias("total_all"),
            *[F.col(f"`{c}`").cast("long").alias(f"_gt_{i + 1}") for i, c in enumerate(gt_cols)],
        )
        .filter(F.col("pathway") != "NA")
    )
    keys = [
        "monthyear",
        "provider",
        "ccg",
        "ccg_name",
        "pathway",
        "specialty",
        "is_provider",
    ]
    rows = base.select(*keys, "unknown_start", "total_all")
    from elective_waiting_times_pipeline_spark.operators.histogram import wide_to_band_long

    long = wide_to_band_long(base, [f"_gt_{i + 1}" for i in range(len(gt_cols))], keys)
    return rows, long


def dashboard_stats(
    rows: DataFrame,
    long: DataFrame,
    geo_col: str = "ccg",
    quantiles: Sequence[float] = (0.50, 0.92, 0.95),
    all_label: str = "ENGLAND",
) -> DataFrame:
    """All (month × geo ∪ ENGLAND × specialty × pathway × IS ∪ All)
    dashboard statistics in one grouping-sets pass.

    geo_col selects the variant: 'provider' (2.R:127), 'ccg' (2.R:314),
    or any dimension joined onto the fact (region 2.R:492, IMD quintile
    2.R:659). Output: FIXTURES.md §4 summary schema.
    """
    spark = rows.sparkSession
    fixed = ["monthyear", "specialty", "pathway"]
    tag = f"_rtt_{geo_col}"
    rows.createOrReplaceTempView(f"{tag}_rows")
    long.createOrReplaceTempView(f"{tag}_long")

    fixed_sql = ", ".join(fixed)

    def _sets(extra: str = "") -> str:
        e = f", {extra}" if extra else ""
        return (
            f"GROUPING SETS (({fixed_sql}{e}, {geo_col}, is_provider), "
            f"({fixed_sql}{e}, {geo_col}), ({fixed_sql}{e}, is_provider), ({fixed_sql}{e}))"
        )

    # Group spine + scalar measures (unknown clock start, Total.All).
    spine = spark.sql(
        f"""
        SELECT {fixed_sql},
               CASE WHEN grouping({geo_col}) = 1 THEN '{all_label}' ELSE {geo_col} END AS geo,
               CASE WHEN grouping(is_provider) = 1 THEN 'All'
                    WHEN is_provider = 1 THEN 'IS' ELSE 'Non-IS' END AS independent,
               SUM(unknown_start) AS unknown_start,
               SUM(total_all) AS total_all
        FROM {tag}_rows
        GROUP BY {_sets()}
        """
    )

    # Band histogram per group (same grouping sets, band appended),
    # then cumulative-sum quantile machinery per group.
    hist = spark.sql(
        f"""
        SELECT {fixed_sql},
               CASE WHEN grouping({geo_col}) = 1 THEN '{all_label}' ELSE {geo_col} END AS geo,
               CASE WHEN grouping(is_provider) = 1 THEN 'All'
                    WHEN is_provider = 1 THEN 'IS' ELSE 'Non-IS' END AS independent,
               band, SUM(cnt) AS cnt
        FROM {tag}_long
        GROUP BY {_sets("band")}
        """
    )
    grp = fixed + ["geo", "independent"]
    hist.createOrReplaceTempView(f"{tag}_hist")
    grp_sql = ", ".join(grp)
    q_exprs = ",\n".join(
        f"MIN(CASE WHEN cum >= {q} * nonmiss THEN band END) - 1 AS `weeks.{int(round(q * 100))}`"
        for q in quantiles
    )
    bandstats = spark.sql(
        f"""
        WITH cum AS (
          SELECT {grp_sql}, band, cnt,
                 SUM(cnt) OVER (PARTITION BY {grp_sql} ORDER BY band) AS cum,
                 SUM(cnt) OVER (PARTITION BY {grp_sql}) AS nonmiss
          FROM {tag}_hist
        )
        SELECT {grp_sql},
               MAX(nonmiss) AS nonmiss,
               {q_exprs},
               COALESCE(SUM(CASE WHEN band <= 18 THEN cnt END), 0) AS `number.18.or.less`,
               MAX(nonmiss) - COALESCE(SUM(CASE WHEN band <= 52 THEN cnt END), 0) AS `number.52.or.more`
        FROM cum
        GROUP BY {grp_sql}
        """
    )

    out = spine.join(bandstats, on=grp, how="left")
    nonmiss = F.coalesce(F.col("nonmiss"), F.lit(0))
    total = (
        F.when(F.col("pathway").isin("completeadmitted", "completenonadmitted"), nonmiss + F.col("unknown_start"))
        .when(F.col("pathway") == "newRTT", F.col("total_all"))
        .otherwise(nonmiss)
    )
    keep = (nonmiss >= 20) & (F.col("pathway") != "newRTT")

    def _supp(c: F.Column) -> F.Column:
        return F.when(keep, c)

    week_cols = [f"weeks.{int(round(q * 100))}" for q in quantiles]
    return out.select(
        "monthyear",
        F.col("geo").alias(geo_col),
        "specialty",
        F.col("pathway").alias("type"),
        "independent",
        total.cast("long").alias("total.patients"),
        _supp(F.col("`number.18.or.less`")).cast("long").alias("number.18.or.less"),
        # bround: R round() is half-to-even (26.25 → 26.2, not 26.3)
        _supp(F.bround(100.0 * F.col("`number.18.or.less`") / nonmiss, 1)).alias("rate.18wks.or.less"),
        _supp(F.col("`number.52.or.more`")).cast("long").alias("number.52.or.more"),
        _supp(F.bround(100.0 * F.col("`number.52.or.more`") / nonmiss, 1)).alias("rate.52wks.or.more"),
        *[_supp(F.col(f"`{w}`")).cast("int").alias(w) for w in week_cols],
    )


def provider_stats_exact(
    rows: DataFrame,
    long: DataFrame,
    quantiles: Sequence[float] = (0.50, 0.92, 0.95),
) -> DataFrame:
    """Exact output parity with `dashboard_stats_provider` (2.R:127-301):
    the provider variant does NOT take an IS bucket — it emits a
    single `IS` column = max(IS_provider) over the subset (0 for the
    ENGLAND pseudo-provider, 2.R:183-185). Implemented as the 'All'
    grouping-set slice of the generalized kernel plus a broadcast-
    joined per-(month, provider) max-flag."""
    stats = dashboard_stats(rows, long, geo_col="provider", quantiles=quantiles)
    all_rows = stats.filter(F.col("independent") == "All").drop("independent")
    flags = rows.groupBy("monthyear", "provider").agg(
        F.max("is_provider").cast("string").alias("IS")
    )
    out = all_rows.join(F.broadcast(flags), on=["monthyear", "provider"], how="left")
    return out.withColumn(
        "IS", F.when(F.col("provider") == "ENGLAND", F.lit("0")).otherwise(F.col("IS"))
    )
