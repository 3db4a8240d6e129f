"""Skew-mitigation utilities: salted aggregation and salted join.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these explicit forms are for the cases AQE can't touch —
a single mega-hot group in an aggregation, or a broadcast-ineligible
dimension with a hot key. The salt fan-out trades `salt`× more partial
groups for even partition sizes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    salt: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-stage sum for skewed group keys: stage 1 aggregates
    (group, random-salt) partials, stage 2 merges per group. The first
    shuffle spreads a hot key over `salt` reducers; the second moves
    only `salt` rows per group. Equivalent to plain groupBy-sum (sum is
    associative); use only when one group dwarfs the rest — the extra
    exchange costs more otherwise."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*group_cols, "_salt").agg(F.sum(value_col).alias("_part"))
    return partial.groupBy(*group_cols).agg(F.sum("_part").alias(out_col))


def salted_join_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
) -> DataFrame:
    """Equi-join where `big` has hot keys and `small` is too large to
    broadcast: salt the big side randomly, replicate the small side
    across all salt values, join on (key, salt). Row multiplicity is
    preserved exactly; the hot key's rows land on `salt` partitions
    instead of one."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, on=[on, "_salt"], how="left")
    return out.drop("_salt")
