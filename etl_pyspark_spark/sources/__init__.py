from etl_pyspark_spark.sources.io import (
    gather,
    read_csv,
    read_json,
    read_parquet,
    read_table,
    write_parquet,
)

__all__ = [
    "gather",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_table",
    "write_parquet",
]
