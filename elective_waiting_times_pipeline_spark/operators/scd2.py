"""SCD Type 2 dimension maintenance — the warehouse versioning kernel
(build validity intervals from attribute observations) plus its
incremental form (rebuild only the key-buckets a new batch touches).

Design mirrors operators/rollup.py: the store is a PURE FUNCTION of
the observation lake, refreshed per partition — never merged deltas.
A key's entire history is tiny (its change count), so recomputing the
touched buckets from the lake is one key-partitioned window pass over
a bucket-filtered scan — PRUNED to the touched buckets when the lake
materializes the bucket as a column/partition (`bucket_col`), a full
scan otherwise — and the swap (dynamic partition overwrite) is
idempotent: checkpoint replays and duplicate batches recompute the
same buckets to the same content.

Reference parallel: the reference rebuilds its whole monthly extract
CSV to restate history (`1b.R:383-392`); the SCD2 store makes the
restatement a bucket-partition swap instead.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.sources.readers import overwrite_partitions


def build_scd2(
    obs: DataFrame,
    key: str = "custkey",
    attr: str = "attr",
    eff: str = "eff",
    tie: str = "tie",
) -> DataFrame:
    """Collapse attribute observations into SCD2 validity intervals:
    (key, attr, valid_from, valid_to, is_current), one row per
    consecutive-run version. valid_to = next version's valid_from
    (half-open intervals); NULL valid_to marks the current version.
    One key-partitioned window pass; same-timestamp observations are
    pinned by `tie` so versioning is deterministic (SURVEY §7.5).

    Shuffle shape: everything is keyed by `key`. A run's valid_from
    is the `eff` of its FIRST row (rows are ordered by (eff, tie)
    inside the window), so the spans come from a FILTER on the
    run-boundary flag — not a groupBy(key, attr, ver), whose
    different grouping key would force a second full shuffle between
    the change-detection window and the valid_to window. One Exchange
    on `key` serves all three window passes."""
    w = Window.partitionBy(key).orderBy(eff, tie)
    chg = F.when(~F.lag(attr).over(w).eqNullSafe(F.col(attr)), 1).otherwise(0)
    grp = obs.withColumn("_chg", chg).withColumn("_rn", F.row_number().over(w))
    # run starts where the attr changed OR at the key's first row (the
    # first row's _chg is 0 when attr is NULL — lag NULL eqNullSafe
    # NULL — so _rn==1 is required, not redundant)
    spans = grp.filter((F.col("_chg") == 1) | (F.col("_rn") == 1)).select(
        key, attr, F.col(eff).alias("valid_from"), F.col("_rn").alias("_ord")
    )
    wv = Window.partitionBy(key).orderBy("_ord")
    return spans.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def key_bucket(key_col: str, n_buckets: int) -> F.Column:
    """Deterministic bucket of a key — pmod so negative keys land in
    [0, n), and NULL keys land in bucket 0 (pmod(NULL) is NULL, which
    would otherwise make NULL-key observations unrepresentable in the
    store and crash the touched-bucket computation). The store's
    partition column."""
    return F.coalesce(
        F.pmod(F.col(key_col).cast("long"), F.lit(n_buckets)), F.lit(0)
    ).cast("int")


def refresh_scd2(
    obs_lake: DataFrame,
    store_path: str,
    buckets: Iterable[int],
    key: str = "custkey",
    attr: str = "attr",
    eff: str = "eff",
    tie: str = "tie",
    n_buckets: int = 16,
    bucket_col: str | None = None,
    verify_full_lake: bool = False,
) -> None:
    """Recompute the given key-buckets of the SCD2 store from the base
    observation lake and swap them in (dynamic partition overwrite).
    Untouched buckets keep their files byte-for-byte. A restatement
    that empties a bucket entirely (every key's observations deleted)
    leaves a stale bucket partition — drop it out-of-band, exactly as
    refresh_hourly_rollup documents for purged days.

    PRUNING: pass `bucket_col` when the lake carries a MATERIALIZED
    bucket column (ideally its partition column) — the isin filter
    then prunes the scan to exactly the touched buckets, the
    refresh_hourly_rollup contract. Without it the filter is a derived
    pmod expression, which is correct but scans the whole lake (no
    partition pruning or row-group skipping on a computed value) —
    fine for small lakes, wrong at 100 TB.

    CONSISTENCY: with `bucket_col`, the rebuilt partitions are taken
    from the LAKE's own column (per-key), never recomputed — so the
    store layout always agrees with the lake layout even if the lake
    was bucketed with a different n or hash. A key observed in two
    lake buckets means the lake itself is corrupt: that would rebuild
    a PARTIAL history, so this raises instead. NULL lake buckets are
    invalid by the same logic (isin never matches NULL, silently
    dropping those keys) — materialize the column with `key_bucket`,
    which maps NULL keys to bucket 0.

    SCOPE of the straddle check: by default it sees only the
    touched-bucket SLICE — a key observed in one touched and one
    UNTOUCHED bucket is not caught, because catching it requires
    scanning the complement of the lake, which would defeat the
    pruning this function exists for. Pass `verify_full_lake=True`
    to close that gap: one extra column-pruned pass over the
    complement's (key, bucket) pairs, semi-joined against the slice's
    keys — raises if any refreshed key also lives outside the
    refreshed buckets. Use it on audit/backfill runs; leave it off on
    the hot incremental path where the lake's bucketing is enforced
    at write time by `key_bucket`."""
    buckets = sorted({int(b) for b in buckets if b is not None})
    if not buckets:
        return
    if bucket_col is None:
        slice_df = obs_lake.filter(key_bucket(key, n_buckets).isin(buckets))
        fresh = build_scd2(slice_df, key=key, attr=attr, eff=eff, tie=tie).withColumn(
            "bucket", key_bucket(key, n_buckets)
        )
    else:
        slice_df = obs_lake.filter(F.col(bucket_col).isin(buckets))
        key_map = slice_df.select(key, F.col(bucket_col).alias("bucket")).distinct()
        multi = (
            key_map.groupBy(key).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
        )
        bad = multi.limit(1).collect()
        if bad:
            raise ValueError(
                f"refresh_scd2: key {bad[0][0]!r} appears in multiple lake "
                f"'{bucket_col}' buckets — the lake bucketing is inconsistent; "
                "rebuilding would write a partial history"
            )
        if verify_full_lake:
            other = obs_lake.filter(
                ~F.col(bucket_col).isin(buckets) | F.col(bucket_col).isNull()
            ).select(key)
            # null-safe semi-join: a NULL key living in both a touched
            # and an untouched bucket must FAIL the audit — a plain
            # equi-join would never match NULL and silently pass the
            # very lakes that violated the key_bucket(NULL)->0
            # write-time convention
            slice_keys = key_map.select(F.col(key).alias("_slice_key")).distinct()
            straddle = (
                other.join(
                    slice_keys,
                    F.col(key).eqNullSafe(F.col("_slice_key")),
                    "left_semi",
                )
                .limit(1)
                .collect()
            )
            if straddle:
                raise ValueError(
                    f"refresh_scd2: key {straddle[0][0]!r} has observations in "
                    f"an untouched lake '{bucket_col}' bucket as well as a "
                    "refreshed one — the lake bucketing is inconsistent; "
                    "rebuilding would write a partial history"
                )
        fresh = build_scd2(slice_df, key=key, attr=attr, eff=eff, tie=tie).join(
            key_map, key
        )
    overwrite_partitions(fresh, store_path, partition_cols=("bucket",))
