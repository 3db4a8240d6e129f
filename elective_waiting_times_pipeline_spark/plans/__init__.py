from elective_waiting_times_pipeline_spark.plans import catalog

__all__ = ["catalog"]
