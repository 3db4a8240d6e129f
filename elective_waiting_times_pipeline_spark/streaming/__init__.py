from elective_waiting_times_pipeline_spark.streaming.joins import attribution_join
from elective_waiting_times_pipeline_spark.streaming.sinks import stream_to_partitioned_lake
from elective_waiting_times_pipeline_spark.streaming.windows import (
    run_available_now,
    session_window_stats,
    windowed_event_counts,
)

__all__ = [
    "attribution_join",
    "run_available_now",
    "session_window_stats",
    "stream_to_partitioned_lake",
    "windowed_event_counts",
]
