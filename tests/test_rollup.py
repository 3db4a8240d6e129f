"""Incremental hourly-rollup maintenance: day-by-day refreshes must
equal a full recompute, re-refreshing a day must be a no-op swap, and
untouched day partitions must keep their files byte-for-byte."""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.rollup import (
    hourly_rollup,
    refresh_hourly_rollup,
    touched_days,
)

T0 = dt.datetime(2024, 3, 1, 0, 15)


def _lake(spark, path):
    rows = []
    i = 0
    for d in range(3):
        for h in (0, 1, 5):
            for k in range(3):
                rows.append(
                    (i, T0 + dt.timedelta(days=d, hours=h, minutes=k), 1, "a" if k else "b", 2.5 * (k + 1), "{}")
                )
                i += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).withColumn("day", F.date_format(F.date_trunc("HOUR", "ts"), "yyyy-MM-dd"))
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    return spark.read.parquet(path)


def _snapshot(df):
    # day comes back as DATE from partition-column inference but is a
    # string in the in-memory relation — compare canonical strings
    return sorted(
        (str(r.day), r.grp, r.bucket.isoformat(), r.n_events, r.sv)
        for r in df.select("day", "grp", "bucket", "n_events", "sv").collect()
    )


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    lake = _lake(spark, str(tmp_path / "events"))
    days = touched_days(lake)
    assert days == ["2024-03-01", "2024-03-02", "2024-03-03"]

    roll = str(tmp_path / "rollup")
    # incremental: one day, then the remaining two
    refresh_hourly_rollup(lake, roll, days[:1])
    refresh_hourly_rollup(lake, roll, days[1:])
    got = _snapshot(spark.read.parquet(roll))
    want = _snapshot(hourly_rollup(lake))
    assert got == want and len(got) > 0


def test_refresh_is_idempotent_and_leaves_other_partitions_untouched(spark, tmp_path):
    lake = _lake(spark, str(tmp_path / "events"))
    roll = str(tmp_path / "rollup")
    refresh_hourly_rollup(lake, roll, touched_days(lake))
    before = _snapshot(spark.read.parquet(roll))
    d1_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(roll + "/day=2024-03-01/*.parquet")
    }
    assert d1_files
    # re-refresh only day 2: result unchanged, day-1 files untouched
    refresh_hourly_rollup(lake, roll, ["2024-03-02"])
    after = _snapshot(spark.read.parquet(roll))
    assert after == before
    assert {
        f: os.path.getmtime(f) for f in glob.glob(roll + "/day=2024-03-01/*.parquet")
    } == d1_files


def test_refresh_picks_up_a_restated_day(spark, tmp_path):
    lake_path = str(tmp_path / "events")
    lake = _lake(spark, lake_path)
    roll = str(tmp_path / "rollup")
    refresh_hourly_rollup(lake, roll, touched_days(lake))
    # restate day 2 in the base lake (double every value), refresh that day
    restated = (
        spark.read.parquet(lake_path)
        .filter(F.col("day") == "2024-03-02")
        .withColumn("value", F.col("value") * 2)
    )
    restated.write.mode("overwrite").partitionBy("day").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(lake_path)
    lake2 = spark.read.parquet(lake_path)
    refresh_hourly_rollup(lake2, roll, ["2024-03-02"])
    got = _snapshot(spark.read.parquet(roll))
    want = _snapshot(hourly_rollup(lake2))
    assert got == want


def test_streaming_refresh_matches_batch_rollup(spark, tmp_path):
    """Drive the foreachBatch refresher with forced multi-batch input
    (maxFilesPerTrigger=1): the rollup must equal a full batch
    recompute, and a full replay (fresh checkpoint) must be a no-op."""
    from elective_waiting_times_pipeline_spark.streaming.sinks import (
        stream_refresh_hourly_rollup,
    )

    lake_path = str(tmp_path / "events")
    lake = _lake(spark, lake_path)
    roll = str(tmp_path / "rollup")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def run(checkpoint):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(lake_path)
        )
        q = stream_refresh_hourly_rollup(
            stream,
            lambda: spark.read.parquet(lake_path),
            roll,
            str(tmp_path / checkpoint),
        )
        q.awaitTermination(120)

    run("ckpt1")
    got = _snapshot(spark.read.parquet(roll))
    want = _snapshot(hourly_rollup(lake))
    assert got == want and len(got) > 0

    run("ckpt2")  # full replay from scratch: idempotent partition swaps
    assert _snapshot(spark.read.parquet(roll)) == want


def test_refresh_drops_rollup_partition_when_day_is_purged(spark, tmp_path):
    import shutil

    lake_path = str(tmp_path / "events")
    lake = _lake(spark, lake_path)
    roll = str(tmp_path / "rollup")
    refresh_hourly_rollup(lake, roll, touched_days(lake))
    assert glob.glob(roll + "/day=2024-03-02/*.parquet")
    # purge day 2 entirely from the base lake, then refresh that day:
    # the stale rollup partition must disappear, not keep serving
    shutil.rmtree(lake_path + "/day=2024-03-02")
    lake2 = spark.read.parquet(lake_path)
    refresh_hourly_rollup(lake2, roll, ["2024-03-02"])
    assert not glob.glob(roll + "/day=2024-03-02/*.parquet")
    got = _snapshot(spark.read.parquet(roll))
    assert got == _snapshot(hourly_rollup(lake2))
