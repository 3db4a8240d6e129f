"""Custom Python DataSource (sources/pydatasource.py): registration,
schema, determinism, and layout independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.sources.pydatasource import SyntheticEvents


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticEvents)


def _load(spark, rows=500, parts=4, seed=7):
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("numPartitions", parts)
        .option("seed", seed)
        .load()
    )


def test_schema_rows_and_domains(spark):
    df = _load(spark)
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
    ]
    assert df.count() == 500
    assert df.select("event_id").distinct().count() == 500
    types = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert types <= {"view", "click", "signup", "purchase", "error"}
    mm = df.agg(F.min("value"), F.max("value")).collect()[0]
    assert 0.0 <= mm[0] <= mm[1] < 500.0


def test_deterministic_and_layout_independent(spark):
    a = sorted(map(tuple, _load(spark, parts=1).collect()))
    b = sorted(map(tuple, _load(spark, parts=7).collect()))
    assert a == b  # partition count never changes the multiset
    c = sorted(map(tuple, _load(spark, seed=8).collect()))
    assert a != c  # the seed does


def test_actually_partitioned(spark):
    df = _load(spark, rows=100, parts=5)
    assert df.rdd.getNumPartitions() == 5


def test_feeds_the_events_operator_family(spark):
    # generated relation drives a real events operator end-to-end
    df = _load(spark, rows=2000, parts=4)
    out = (
        df.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.count() > 0
    assert out.agg(F.sum("n")).collect()[0][0] == 2000


def test_streaming_face_matches_batch_multiset(spark, tmp_path):
    """availableNow stream over the generator == the batch read of the
    same (seed, rows): the two faces share _gen_rows verbatim."""
    # simple Python stream readers don't support availableNow — run
    # the default micro-batch trigger and drain with processAllAvailable
    q = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 40)
        .option("maxRows", 100)
        .option("seed", 7)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM synth_stream").collect()))
    batch = sorted(map(tuple, _load(spark, rows=100, parts=3, seed=7).collect()))
    assert streamed == batch and len(streamed) == 100
