"""Label ↔ date scalar helpers (all JVM-side column expressions).

The reference parses dates late and locally from string fragments:
  - `as.Date(paste0('01-', monthyr), format='%d-%b-%y')`
    (`3a. Visualise.R:50-54`)
  - `word(Period, 2, sep='-')` month-name extraction from
    'RTT-APRIL-2020' (`3c. Maps and provider stats.R:166-168`)
We derive a proper DateType once at ingest and keep the label columns
for output compatibility (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def monthyr_to_date(col: Column | str) -> Column:
    """'Apr20' → date 2020-04-01. try_to_date: a malformed label is
    NULL (R's as.Date NA), not an ANSI CANNOT_PARSE abort of the whole
    job on one garbled extract row."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(F.concat(F.lit("01"), c), "ddMMMyy")


def period_to_date(col: Column | str) -> Column:
    """'RTT-APRIL-2020' → date 2020-04-01 (month name in any case);
    malformed labels → NULL, same rationale as monthyr_to_date."""
    c = F.col(col) if isinstance(col, str) else col
    month_name = F.initcap(F.lower(F.split(c, "-").getItem(1)))
    year = F.split(c, "-").getItem(2)
    return F.try_to_date(F.concat_ws(" ", F.lit("01"), month_name, year), "dd MMMM yyyy")


def covid_period(date_col: Column | str) -> Column:
    """COVID-era bucketing ladder (`3b. Descriptive stats.R:84-87`).

    The reference's `during_COVID` window runs to `dmy('01-06-2021')`
    exclusive (`3c. Maps and provider stats.R:54-56` includes Jan–May 2021),
    so Apr21 and May21 are 'during' and Jun21 is the first 'post' month.
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    return (
        # NULL dates stay NULL (R's NA) — the otherwise() branch would
        # silently bucket unparseable months as 'post'
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when(d < F.lit("2020-03-01").cast("date"), F.lit("pre"))
        .when(d < F.lit("2021-06-01").cast("date"), F.lit("during"))
        .otherwise(F.lit("post"))
    )
