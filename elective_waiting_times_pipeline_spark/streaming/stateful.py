"""Custom stateful streaming operator via applyInPandasWithState —
the engine's arbitrary-state surface (running per-user aggregates
with state carried across micro-batches).

The reference has no streaming (SURVEY §2.12); this is the extension
pattern for incremental pipelines: a per-key running total that
survives across triggers, emitting one updated row per key per batch.
State is a (count, total) pair per user — O(keys) memory, checkpointed
by the engine."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, total) with explicit state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_available_now(
    spark: SparkSession,
    parquet_path: str,
    query_name: str = "stateful_out",
) -> DataFrame:
    """Drive the stateful operator over a parquet directory to
    completion; returns the final per-user rows (last update wins)."""
    from elective_waiting_times_pipeline_spark.streaming.io import read_events_stream

    raw = read_events_stream(spark, parquet_path)
    out = running_user_totals(raw.select("user_id", "value"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT user_id, max_by(n_events, n_events) AS n_events, "
        f"max_by(total_value, n_events) AS total_value FROM {query_name} GROUP BY user_id"
    )
