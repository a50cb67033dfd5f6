from etl_pyspark_spark.functions.compat import pround, sql_pround

__all__ = ["pround", "sql_pround"]
