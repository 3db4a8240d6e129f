from elective_waiting_times_pipeline_spark.functions.names import check_names
from elective_waiting_times_pipeline_spark.functions.labels import (
    monthyr_to_date,
    period_to_date,
)
from elective_waiting_times_pipeline_spark.functions.ordering import (
    REGION_ORDER,
    SPECIALTY_ORDER,
    arrange_by_category,
    category_rank,
    with_category_order,
)

__all__ = [
    "check_names",
    "monthyr_to_date",
    "period_to_date",
    "REGION_ORDER",
    "SPECIALTY_ORDER",
    "arrange_by_category",
    "category_rank",
    "with_category_order",
]
