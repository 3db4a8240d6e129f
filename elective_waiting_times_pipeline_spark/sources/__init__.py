from elective_waiting_times_pipeline_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv_checked,
    union_by_name,
)

__all__ = ["load_table", "load_tables", "read_csv_checked", "union_by_name"]
