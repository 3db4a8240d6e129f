from elective_waiting_times_pipeline_spark.streaming.windows import (
    run_available_now,
    windowed_event_counts,
)

__all__ = ["run_available_now", "windowed_event_counts"]
