"""Streaming dropDuplicatesWithinWatermark == batch dropDuplicates
over a finite input whose duplicates all fall within the delay."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from elective_waiting_times_pipeline_spark.streaming.dedup import run_dedup_available_now

BASE_NS = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z


def _write_events(path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([BASE_NS + r[1] * 1_000_000_000 for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, path)


def test_streaming_dedup_matches_batch(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    # (event_id, seconds-offset, user_id): ids 1 and 2 duplicated, both
    # within the 2h watermark; id 3 unique
    _write_events(str(d / "a.parquet"), [(1, 0, 10), (2, 60, 11), (3, 120, 12)])
    _write_events(str(d / "b.parquet"), [(1, 300, 10), (2, 3600, 11), (4, 400, 13)])
    out = run_dedup_available_now(spark, str(d), keys=("event_id",), query_name="t_sdedup")
    got = sorted(r.event_id for r in out.collect())
    assert got == [1, 2, 3, 4]


def test_stream_to_partitioned_lake_idempotent(spark, tmp_path):
    """foreachBatch lake sink: lands partitions, and re-running the
    stream from scratch (fresh checkpoint) converges to the same lake
    instead of appending duplicates."""
    from pyspark.sql import functions as F

    from elective_waiting_times_pipeline_spark.streaming.sinks import stream_to_partitioned_lake

    src_dir = str(tmp_path / "landing")
    spark.createDataFrame(
        [("Apr20", 1, 10.0), ("Apr20", 2, 20.0), ("May20", 3, 30.0)],
        "monthyr string, k int, v double",
    ).coalesce(1).write.parquet(src_dir)

    lake = str(tmp_path / "lake")

    def run(ckpt: str):
        stream = spark.readStream.schema("monthyr string, k int, v double").parquet(src_dir)
        q = stream_to_partitioned_lake(stream, lake, str(tmp_path / ckpt), query_name=f"t_{ckpt}")
        q.awaitTermination()

    run("ck1")
    first = sorted(tuple(r) for r in spark.read.parquet(lake).select("monthyr", "k", "v").collect())
    assert {t[0] for t in first} == {"Apr20", "May20"} and len(first) == 3
    # replay from a fresh checkpoint (simulates redelivery) → same lake
    run("ck2")
    second = sorted(tuple(r) for r in spark.read.parquet(lake).select("monthyr", "k", "v").collect())
    assert second == first
