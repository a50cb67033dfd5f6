from etl_pyspark_spark.plans.introspect import (
    broadcast_exchange_count,
    plan_of,
    shuffle_count,
    tree_of,
)

__all__ = [
    "broadcast_exchange_count",
    "plan_of",
    "shuffle_count",
    "tree_of",
]
