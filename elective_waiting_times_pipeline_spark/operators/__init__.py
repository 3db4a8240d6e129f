from elective_waiting_times_pipeline_spark.operators.histogram import (
    band_histogram,
    histogram_stats,
    wide_to_band_long,
)

__all__ = ["band_histogram", "histogram_stats", "wide_to_band_long"]
