"""SCD2 maintenance: the incremental (bucket-refresh) and streaming
forms must converge to the batch kernel's output, and replays must be
no-ops — the rollup-refresh contract applied to dimension versioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.scd2 import (
    build_scd2,
    key_bucket,
    refresh_scd2,
)


def _obs(spark, path):
    """Observation lake: per-customer order-priority observations from
    the sf0.001 orders table, landed as parquet so it can be streamed."""
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderdate").alias("eff"),
        F.col("o_orderkey").alias("tie"),
    )
    # two files so maxFilesPerTrigger=1 forces a genuine multi-batch run
    o.repartition(2).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _snapshot(df):
    return sorted(
        (r.custkey, r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in df.select("custkey", "attr", "valid_from", "valid_to", "is_current").collect()
    )


def test_refresh_scd2_matches_batch_kernel(spark, tmp_path):
    lake_path = str(tmp_path / "obs")
    obs = _obs(spark, lake_path)
    store = str(tmp_path / "scd2")
    refresh_scd2(obs, store, buckets=range(16), n_buckets=16)
    got = _snapshot(spark.read.parquet(store))
    want = _snapshot(build_scd2(obs))
    assert got == want and len(got) > 0


def test_refresh_scd2_touches_only_named_buckets(spark, tmp_path):
    lake_path = str(tmp_path / "obs")
    obs = _obs(spark, lake_path)
    store = str(tmp_path / "scd2")
    refresh_scd2(obs, store, buckets=[3], n_buckets=16)
    back = spark.read.parquet(store)
    assert [r.bucket for r in back.select("bucket").distinct().collect()] == [3]
    # every key in the store belongs to bucket 3, and matches the
    # kernel restricted to that bucket
    want = _snapshot(build_scd2(obs.filter(key_bucket("custkey", 16) == 3)))
    assert _snapshot(back) == want


def test_refresh_scd2_bucket_col_uses_lake_layout_and_detects_corruption(spark, tmp_path):
    """With a MATERIALIZED lake bucket column the store partitions come
    from the lake's own layout (here 4 buckets, not the default pmod
    16), and a key straddling two lake buckets raises instead of
    writing a partial history."""
    import pytest
    from pyspark.sql import functions as F

    lake_path = str(tmp_path / "obs")
    obs = _obs(spark, lake_path).withColumn(
        "bk", F.pmod(F.col("custkey"), F.lit(4)).cast("int")
    )
    store = str(tmp_path / "scd2")
    refresh_scd2(obs, store, buckets=[1], n_buckets=999, bucket_col="bk")
    back = spark.read.parquet(store)
    assert [r.bucket for r in back.select("bucket").distinct().collect()] == [1]
    want = _snapshot(build_scd2(obs.filter(F.col("bk") == 1)))
    assert _snapshot(back) == want

    corrupt = obs.withColumn(
        "bk", F.when(F.col("tie") % 2 == 0, F.lit(1)).otherwise(F.lit(2))
    )
    with pytest.raises(ValueError, match="multiple lake"):
        refresh_scd2(corrupt, store, buckets=[1, 2], bucket_col="bk")


def test_refresh_scd2_straddle_across_untouched_bucket(spark, tmp_path):
    """A key whose observations straddle a TOUCHED and an UNTOUCHED
    lake bucket is invisible to the slice-scoped check (documented
    scope: the refresh stays green but rebuilds only the touched
    bucket's share of that key's history) and is caught by the opt-in
    full-lake verification."""
    import pytest
    from pyspark.sql import functions as F

    lake_path = str(tmp_path / "obs")
    obs = _obs(spark, lake_path)
    # pick one real key and split its rows: even ties → bucket 1
    # (touched), odd ties → bucket 3 (untouched); all other keys get a
    # consistent per-key bucket that never collides with 1.
    victim = obs.select("custkey").limit(1).collect()[0][0]
    straddled = obs.withColumn(
        "bk",
        F.when(
            F.col("custkey") == victim,
            F.when(F.col("tie") % 2 == 0, F.lit(1)).otherwise(F.lit(3)),
        ).otherwise(F.pmod(F.col("custkey"), F.lit(2)).cast("int")),
    )
    store = str(tmp_path / "scd2")
    # default scope: passes (the slice only sees bucket 1)
    refresh_scd2(straddled, store, buckets=[1], bucket_col="bk")
    # full-lake verification: raises before writing anything
    with pytest.raises(ValueError, match="untouched lake"):
        refresh_scd2(
            straddled, store, buckets=[1], bucket_col="bk", verify_full_lake=True
        )
    # a clean lake passes the full check too
    clean = obs.withColumn("bk", F.pmod(F.col("custkey"), F.lit(4)).cast("int"))
    refresh_scd2(clean, store, buckets=[1], bucket_col="bk", verify_full_lake=True)


def test_refresh_scd2_full_lake_catches_null_key_straddle(spark, tmp_path):
    """A NULL key living in BOTH a touched and an untouched bucket must
    fail the full-lake audit — a plain equi-semi-join never matches
    NULL and would silently pass exactly the lakes that violated the
    key_bucket(NULL)->0 write-time convention."""
    import pytest

    lake_path = str(tmp_path / "obs")
    obs = _obs(spark, lake_path)
    victim = obs.select("custkey").limit(1).collect()[0][0]
    # NULL the victim key; its even-tie rows land in touched bucket 1,
    # odd-tie rows in untouched bucket 3
    nulled = obs.withColumn(
        "custkey",
        F.when(F.col("custkey") == victim, F.lit(None)).otherwise(F.col("custkey")),
    ).withColumn(
        "bk",
        F.when(
            F.col("custkey").isNull(),
            F.when(F.col("tie") % 2 == 0, F.lit(1)).otherwise(F.lit(3)),
        ).otherwise(F.pmod(F.col("custkey"), F.lit(2)).cast("int")),
    )
    store = str(tmp_path / "scd2")
    with pytest.raises(ValueError, match="untouched lake"):
        refresh_scd2(
            nulled, store, buckets=[1], bucket_col="bk", verify_full_lake=True
        )
    # NULL key confined to the touched bucket: the audit passes
    confined = nulled.withColumn(
        "bk", F.when(F.col("custkey").isNull(), F.lit(1)).otherwise(F.col("bk"))
    )
    refresh_scd2(
        confined, store, buckets=[1], bucket_col="bk", verify_full_lake=True
    )


def test_streaming_scd2_matches_batch_and_replays_idempotently(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.streaming.sinks import stream_refresh_scd2

    lake_path = str(tmp_path / "obs")
    obs = _obs(spark, lake_path)
    store = str(tmp_path / "scd2")
    schema = "custkey long, attr string, eff timestamp, tie long"

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(lake_path)
        )
        q = stream_refresh_scd2(
            stream,
            lambda: spark.read.parquet(lake_path),
            store,
            str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("ckpt1")
    got = _snapshot(spark.read.parquet(store))
    want = _snapshot(build_scd2(obs))
    assert got == want and len(got) > 0

    run("ckpt2")  # full replay from a fresh checkpoint: idempotent swaps
    assert _snapshot(spark.read.parquet(store)) == want
