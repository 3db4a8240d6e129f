"""applyInPandasWithState running totals == batch groupBy truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.streaming.io import normalize_event_time
from elective_waiting_times_pipeline_spark.streaming.stateful import run_stateful_available_now


def test_stateful_running_totals_match_batch(spark, sf_dir):
    out = run_stateful_available_now(spark, f"{sf_dir}/events.parquet", query_name="t_stateful").toPandas()
    truth = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .toPandas()
    )
    m = out.merge(truth, on="user_id")
    assert len(m) == len(truth)
    assert (m.n_events == m.n).all()
    assert (abs(m.total_value - m.t) < 0.05).all()


def test_session_windows_streaming_match_batch(spark, sf_dir):
    """Streaming session_window == the same session_window run in batch
    mode (identical logical agg, incremental execution)."""
    from elective_waiting_times_pipeline_spark.streaming.windows import (
        run_sessions_available_now,
        session_window_stats,
    )

    out = run_sessions_available_now(
        spark, f"{sf_dir}/events.parquet", query_name="t_sessions"
    ).toPandas()
    batch_raw = normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    truth = session_window_stats(batch_raw).toPandas()
    key = ["session_start", "session_end", "user_id"]
    out = out.sort_values(key).reset_index(drop=True)
    truth = truth.sort_values(key).reset_index(drop=True)
    assert len(out) == len(truth) > 0
    assert (out[key + ["n_events"]] == truth[key + ["n_events"]]).all().all()
    assert (abs(out.total_value - truth.total_value) < 1e-9).all()


def test_stream_stream_attribution_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join == the identical logical
    join run in batch."""
    from elective_waiting_times_pipeline_spark.streaming.joins import (
        attribution_join,
        run_attribution_available_now,
    )

    out = run_attribution_available_now(
        spark, f"{sf_dir}/events.parquet", query_name="t_attr"
    ).toPandas()
    batch_raw = normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    truth = attribution_join(batch_raw, batch_raw).toPandas()
    key = ["trigger_id", "followup_id"]
    assert len(out) == len(truth) > 0
    assert set(map(tuple, out[key].values)) == set(map(tuple, truth[key].values))


def test_normalize_event_time_all_encodings(spark):
    """The scan-edge normalizer must accept every encoding the lake has
    shipped: nanos-as-long, TIMESTAMP_NTZ (parquet us, no tz), and
    TIMESTAMP_LTZ — all mapping to the same TIMESTAMP_LTZ instant."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    us = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456Z
    as_long = spark.createDataFrame([(us * 1000,)], T.StructType([T.StructField("ts", T.LongType())]))
    as_ntz = spark.sql(f"SELECT timestamp_ntz '1970-01-01 00:00:00' + INTERVAL '{us}' MICROSECOND AS ts")
    as_ltz = spark.sql(f"SELECT timestamp_micros({us}) AS ts")
    got = set()
    for df in (as_long, as_ntz, as_ltz):
        out = normalize_event_time(df)
        assert out.schema["ts"].dataType == T.TimestampType()
        got.add(out.select(F.unix_micros("ts")).first()[0])
    assert got == {us}
