"""applyInPandasWithState running totals == batch groupBy truth."""

from __future__ import annotations

from pyspark.sql import functions as F

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
