"""Scan-edge normalization for streaming event sources.

The lake's `events.parquet` has stored its `ts` column under more than
one physical encoding (parquet TIMESTAMP(NANOS) read as long via
`nanosAsLong`, and parquet TIMESTAMP(MICROS) without a timezone read as
TIMESTAMP_NTZ). The batch edge normalizes in
`sources.readers.load_table`; this module is the streaming counterpart.
Every streaming reader goes through `read_events_stream`, which infers
the actual on-disk schema (a driver-side footer read — no data scan)
and normalizes the event-time column to TIMESTAMP_LTZ, so the
watermarked operators downstream see exactly one dtype regardless of
which encoding the files carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Branch on the *actual* dtype of the event-time column — the
    SAME rules as the batch edge (one shared normalizer in
    sources.readers, so batch and streaming can never diverge on the
    same files): long → raw nanos (truncate to micros), TIMESTAMP_NTZ
    → cast (value-preserving under the UTC session tz), TIMESTAMP_LTZ
    → passthrough."""
    from elective_waiting_times_pipeline_spark.sources.readers import (
        normalize_time_column,
    )

    return normalize_time_column(df, col)


def read_table_stream(spark: SparkSession, parquet_path: str) -> DataFrame:
    """File-source stream over a parquet file or directory, for ANY
    lake table. Streaming scans need an explicit schema; taking it
    from a batch read of the same path keeps it in lock-step with the
    on-disk encoding (and with the session's nanosAsLong conf) instead
    of a hardcoded StructType that goes stale when the lake's writer
    changes. Event-time normalization applies only when a `ts` column
    exists."""
    from elective_waiting_times_pipeline_spark.sources.readers import (
        _ensure_session_confs,
    )

    import os

    _ensure_session_confs(spark)
    schema = spark.read.parquet(parquet_path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    # The file source needs a directory. A DIRECTORY named X.parquet
    # (this repo's own table convention for partitioned writes) must
    # stream as-is — only a true single FILE becomes parent dir +
    # glob filter (a name-suffix check would silently match nothing:
    # the leaf files inside the dir are part-*.parquet).
    if not os.path.isdir(parquet_path) and parquet_path.endswith(".parquet"):
        head, _, tail = parquet_path.rpartition("/")
        reader = reader.option("pathGlobFilter", tail)
        parquet_path = head or "."
    df = reader.load(parquet_path)
    return normalize_event_time(df) if "ts" in df.columns else df


def read_events_stream(spark: SparkSession, parquet_path: str) -> DataFrame:
    """Events-table stream (ts normalized to TIMESTAMP_LTZ)."""
    return read_table_stream(spark, parquet_path)
