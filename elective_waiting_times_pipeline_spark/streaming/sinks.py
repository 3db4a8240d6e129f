"""Streaming sink into the month-partitioned parquet lake.

`foreachBatch` bridges a stream onto the batch writer so each
micro-batch lands with dynamic partition overwrite
(sources/readers.py::overwrite_partitions): a batch only replaces the
partitions it actually touches, and a replayed batch (restart after
failure between Spark's checkpoint commit and the file commit)
rewrites the same partitions to the same content instead of appending
duplicates — idempotent ingest without a transactional table format.

Reference analog: the monthly append loop (1b.R:383-392) rebuilt one
big CSV per run; here each month is an independently replaceable
partition and the stream's checkpoint tracks what was consumed.

CONSTRAINT: a partition's rows must arrive within ONE micro-batch —
a later batch touching the same partition replaces it, not appends.
That holds for the intended layout (one landing file per month, the
reference's own model); for sources that interleave partitions across
batches, land to a staging path and compact, or use a transactional
table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from elective_waiting_times_pipeline_spark.sources.readers import overwrite_partitions


def stream_to_partitioned_lake(
    source: DataFrame,
    lake_path: str,
    checkpoint_path: str,
    partition_cols: tuple[str, ...] = ("monthyr",),
    query_name: str = "lake_ingest",
) -> StreamingQuery:
    """Start (and return) a streaming query that lands each micro-batch
    into the lake, replacing only the partitions present in the batch.
    Caller drives it (`availableNow` sources terminate on their own via
    `q.awaitTermination()`)."""

    def land(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        overwrite_partitions(batch, lake_path, partition_cols)

    return (
        source.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_refresh_hourly_rollup(
    source: DataFrame,
    lake_provider,
    rollup_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    query_name: str = "rollup_refresh",
) -> StreamingQuery:
    """Streaming continuous-aggregate maintenance: each micro-batch
    names the day partitions it touches, and the hourly rollup is
    recomputed for exactly those days from the BASE lake
    (operators/rollup.py::refresh_hourly_rollup — the rollup stays a
    pure function of the lake, never merged deltas). `lake_provider`
    is a zero-arg callable returning a fresh DataFrame over the base
    lake so each batch sees newly landed partitions. Because a refresh
    is an idempotent partition swap, checkpoint replays and duplicate
    batches are harmless — the same days just get recomputed to the
    same content."""
    from elective_waiting_times_pipeline_spark.operators.rollup import (
        refresh_hourly_rollup,
        touched_days,
    )

    def refresh(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        days = touched_days(batch, ts_col)
        refresh_hourly_rollup(lake_provider(), rollup_path, days)

    return (
        source.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
