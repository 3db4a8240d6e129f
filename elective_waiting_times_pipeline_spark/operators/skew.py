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


def adaptive_salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    salt: int = 16,
    sample_fraction: float = 0.05,
    hot_min_sampled: int = 50,
    out_col: str = "total",
) -> DataFrame:
    """Partial (hot-key-only) salting — the production middle ground
    between `salted_sum` (salts every key: `salt`× more partial groups
    even for the cold long tail) and a plain groupBy (one reducer eats
    the mega-key). A cheap deterministic hash sample estimates which
    keys are hot; ONLY those route through the salt fan-out, the cold
    tail aggregates directly, and the two partial relations merge in
    the final per-group agg.

    Correctness does not depend on the detector: sum is associative,
    so a missed hot key (slow, not wrong) or a false positive (a few
    wasted partials) both still produce exactly the plain-groupBy
    result — which is why a plain SQL oracle can check this. The hot
    set is detected from a `sample_fraction` hash sample (seeded,
    layout-independent) with an expected-count floor of
    `hot_min_sampled` rows IN THE SAMPLE; the resulting key list
    broadcasts (hot keys are few by definition — a hot set that
    doesn't fit a broadcast means salting everything, i.e.
    `salted_sum`).

    The sample hashes EVERY column (not the group key — a key-level
    hash would put each key fully in or fully out of the sample,
    detecting only a `sample_fraction` of the hot keys), so it is
    deterministic and layout-independent; rows byte-identical across
    all columns sample together, which only matters if a hot key's
    rows are ALSO all identical — then their shared hash either
    samples the whole pile (count >> floor, detected) or none
    (missed -> slow, never wrong)."""
    sampled = df.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns], F.lit("adsalt")), F.lit(1000000))
        < int(sample_fraction * 1000000)
    )
    hot = (
        sampled.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= hot_min_sampled)
        .select(*group_cols)
    )
    marked = df.join(F.broadcast(hot.withColumn("_hot", F.lit(1))), list(group_cols), "left")
    # ONE corpus scan: cold keys take salt 0 (their partial is already
    # final), hot keys fan out over [0, salt); the merge agg then moves
    # at most `salt` rows per hot key and 1 per cold key — identical
    # result to a filter-split union at half the scans
    salted = marked.withColumn(
        "_salt",
        F.when(F.col("_hot").isNotNull(), (F.rand(seed=42) * salt).cast("int")).otherwise(
            F.lit(0)
        ),
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(F.sum(value_col).alias("_part"))
    return partial.groupBy(*group_cols).agg(F.sum("_part").alias(out_col))
