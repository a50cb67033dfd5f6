"""etl_pyspark_spark — a PySpark-native analytics engine.

Built from scratch with (at least) the query and data-processing
capabilities of the public ``Pete711/etl-pyspark`` reference (a
three-stage NYC-taxi ETL: PyArrow slicer -> per-chunk PySpark
transform -> pandas assembler; see ``SURVEY.md``). Instead of
translating that architecture, the engine expresses the same
semantics idiomatically in Spark: one ``SparkSession``, declarative
DataFrame/SQL operators, Catalyst/AQE optimization, distributed
zstd-Parquet IO — and grows a full relational + LLM-data-pipeline
operator library on top.

Layout
------
- ``session``     one shared SparkSession factory (replaces the
  reference's per-chunk sessions, nyc_taxi_etl.py:14-33)
- ``sources``     readers/sinks (parquet/csv/json, zstd, chunked writes)
- ``operators``   relational operators: pipeline, aggregates, joins,
  windows, set ops, sorting
- ``functions``   scalar function library: JSON, text analysis
- ``dedup``       exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine deduplication
- ``similarity``  brute-force + LSH/IVF approximate nearest neighbor
- ``multimodal``  binary-column (image/audio) plumbing with stubbed
  decoders (decode libs not in this container)
- ``streaming``   Structured Streaming: watermarks, tumbling/sliding/
  session windows
- ``plans``       plan-inspection helpers (pushdown/codegen checks)
"""

from etl_pyspark_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
