from etl_pyspark_spark.operators.pipeline import (
    events_pipeline,
    taxi_transform,
)

__all__ = ["events_pipeline", "taxi_transform"]
