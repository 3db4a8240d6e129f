"""Declarative data-quality constraint checking (the Deequ pattern):
describe the contract a table must satisfy, get back one violations
report computed in a SINGLE pass over the data.

Each row-level constraint compiles to a conditional-sum aggregate and
a uniqueness constraint to ``count - countDistinct``, so an arbitrary
constraint suite costs exactly one scan + one map-side-combinable
aggregation at any table size — never one job per rule. Referential
checks (which need a second table) compile to a broadcast/shuffled
anti-join count and run as their own job by nature.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null_{col}", F.col(col).isNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return f"range_{col}", c.isNull() | (c < lo) | (c > hi)


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return f"matches_{col}", c.isNull() | ~c.rlike(pattern)


def satisfies(name: str, violated: Column) -> tuple[str, Column]:
    """Escape hatch: any boolean expression that is TRUE when the row
    VIOLATES the contract."""
    return name, violated


def _violation_aggs(constraints: Iterable[tuple[str, Column]]) -> list[Column]:
    """n_rows + one conditional-sum violation counter per constraint —
    shared by the one-scan report and the in-flight observation so the
    two DQ faces can never drift apart."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, violated in constraints:
        aggs.append(
            F.coalesce(F.sum(F.when(violated, 1)), F.lit(0)).cast("long").alias(name)
        )
    return aggs


def dq_report(
    df: DataFrame,
    constraints: Iterable[tuple[str, Column]],
    unique_key: Sequence[str] | None = None,
) -> DataFrame:
    """One-row violations report: `n_rows`, one `<name>` violation
    count per constraint, and `dup_<keys>` (rows minus distinct keys)
    when `unique_key` is given. One scan, one aggregation."""
    aggs = _violation_aggs(constraints)
    if unique_key:
        dup = F.count(F.lit(1)) - F.count_distinct(F.struct(*[F.col(k) for k in unique_key]))
        aggs.append(dup.cast("long").alias("dup_" + "_".join(unique_key)))
    return df.agg(*aggs)


def observe_dq(
    df: DataFrame,
    constraints: Iterable[tuple[str, Column]],
    name: str = "dq",
):
    """Attach the constraint suite as an in-flight observation — the
    ZERO-extra-scan form of `dq_report`: metrics accumulate inside
    whatever job the caller runs on the returned DataFrame (the write,
    the aggregation, ...), so at 100 TB the DQ check costs nothing on
    top of the work already being done. Returns `(df, observation)`;
    after any action on the returned frame, `observation.get` yields
    {"n_rows": ..., "<constraint>": ...}.

    Limitations inherited from Spark's Observation: metrics must be
    distinct-free (so no `unique_key` duplicate counter here — use
    `dq_report` when you need it) and values surface only after an
    action. The violation expressions are identical to `dq_report`'s,
    so thresholds/gates can be shared between the two forms (the
    streaming DQ gate `streaming/sinks.py::stream_to_lake_with_dq`
    prices its rules the same way per micro-batch)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *_violation_aggs(constraints)), obs


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Orphan count: child rows whose non-null key has no parent row
    (an anti-join count — broadcast when the parent's distinct key set
    is dim-sized, shuffled otherwise; Catalyst/AQE picks)."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("orphans"))


def order_independent_checksum(df: DataFrame, fields: Sequence[Column | str]) -> DataFrame:
    """(n_rows, checksum) for a table snapshot — the migration /
    replication validation primitive: any engine that can md5 a string
    reproduces it, so "did the copy arrive intact" is a 2-value
    comparison.

    Construction: each row serializes to ONE canonical '|'-joined
    string, with every field COALESCEd to an unprintable \\x01 sentinel
    FIRST (concat_ws silently skips NULL fields, which both diverges
    from '||'-style NULL propagation in other engines and collapses
    distinct rows — NULL in field 3 vs field 4 — onto one string).
    The row md5's leading 8 hex digits sum as decimal(38,0) (a long
    overflows past ~4.3e9 rows of 32-bit values) mod 1e18, so addition
    commutes and layout/sort order never matter.

    CALLER CONTRACT: pass engine-stable serializations — exact
    integers (cents, epoch seconds) and raw strings. Floats and
    locale-formatted dates are where cross-engine checksums die.
    """
    nul = F.lit("\x01")
    cols = [F.col(c) if isinstance(c, str) else c for c in fields]
    canon = F.concat_ws("|", *[F.coalesce(c.cast("string"), nul) for c in cols])
    hv = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("decimal(38,0)")
    return df.select(hv.alias("_hv")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("_hv") % F.lit(10**18)).cast("long").alias("checksum"),
    )
