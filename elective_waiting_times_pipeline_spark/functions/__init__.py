from elective_waiting_times_pipeline_spark.functions.names import check_names
from elective_waiting_times_pipeline_spark.functions.labels import (
    monthyr_to_date,
    period_to_date,
)

__all__ = ["check_names", "monthyr_to_date", "period_to_date"]
