"""Custom categorical (presentation) ordering — the reference's
`fct_relevel` / region_order idiom (`3c. Maps and provider stats.R:
628-642` region case_when ladder; `:283-298` specialty fct_relevel).

R encodes presentation order in factor levels; relational engines sort
by an explicit rank. The rank here is `array_position` over a literal
array — a pure codegen'd expression: no join, no shuffle, no broadcast
exchange, works at any row count (the lookup side is the literal list,
not data). Unlisted values rank after all listed ones (R's fct_relevel
keeps unmentioned levels after the releveled ones); NULL sorts last.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 3c.R:628-638 — England first, then the eight NHS regions north→south.
REGION_ORDER: tuple[str, ...] = (
    "England",
    "North East",
    "North West",
    "Yorkshire And The Humber",
    "East Midlands",
    "West Midlands",
    "East Of England",
    "London",
    "South East",
    "South West",
)

# 3c.R:283-298 — specialty presentation order for the pre/post tables.
SPECIALTY_ORDER: tuple[str, ...] = (
    "Trauma and Orthopaedic",
    "Gastroenterology",
    "Ophthalmology",
    "General Surgery",
    "Gynaecology",
    "Dermatology",
    "Urology",
    "Neurosurgery",
    "Oral Surgery",
    "Ear Nose and Throat",
    "Plastic Surgery",
    "Elderly Medicine",
    "Cardiology",
    "Neurology",
    "Cardiothoracic Surgery",
    "Rheumatology",
)


def category_rank(col: Column | str, ordered_values: Sequence[str]) -> Column:
    """1-based presentation rank of `col` within `ordered_values`;
    unlisted values get len+1 (after all listed), NULL gets len+2."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(v) for v in ordered_values])
    pos = F.array_position(arr, c)  # 0 when not found, NULL on NULL input
    n = len(ordered_values)
    return (
        F.when(c.isNull(), F.lit(n + 2))
        .when(pos == 0, F.lit(n + 1))
        .otherwise(pos)
        .cast("int")
    )


def with_category_order(
    df: DataFrame,
    col: str,
    ordered_values: Sequence[str],
    rank_col: str | None = None,
) -> DataFrame:
    """Attach the presentation-rank column (default `<col>_rank`) so
    callers can ORDER BY it — the relational replacement for an R
    factor's level order."""
    return df.withColumn(rank_col or f"{col}_rank", category_rank(col, ordered_values))


def arrange_by_category(
    df: DataFrame,
    col: str,
    ordered_values: Sequence[str],
    extra_order: Sequence[Column | str] = (),
) -> DataFrame:
    """`arrange(as.numeric(region_order), ...)` (3c.R:642): sort by the
    custom category order, then any tie-break columns. Presentation-
    layer only — a global sort is a single-output-table operation, not
    something to put mid-pipeline at scale."""
    ranked = with_category_order(df, col, ordered_values, "_cat_rank")
    return ranked.orderBy(F.col("_cat_rank"), *extra_order).drop("_cat_rank")
