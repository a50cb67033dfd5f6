"""Query registry: named Spark queries + matching DuckDB oracle SQL.

This is the engine's public correctness surface (driver contract in
``__spark_entry__.py``). Every operator from SURVEY.md §2 (reference
surface + §2.9 growth plan) registers here as:

- ``QUERIES[name]``: ``(spark, sf_dir) -> DataFrame``
- ``ORACLES[name]``: equivalent ANSI SQL for DuckDB over the same
  parquet fixtures (omitted only for genuinely non-SQL-expressible
  ops; the driver then records a weaker rows-only check).

Cross-engine determinism rules used throughout (FIXTURES.md §C):

- Alias every computed column identically on both sides (the driver
  sorts columns by name before hashing).
- Sums of doubles are order-dependent; both sides cast terms to
  ``DECIMAL(18,6)`` first so the sum is exact, then cast the result to
  double. (A binary double can never be an exact decimal midpoint, so
  the two engines' double->decimal roundings always agree.)
- Division by zero must yield NULL on both sides (ANSI off in Spark).
- LIMIT/top-k always carries a total tiebreak order.
- Raw event timestamps are returned as epoch seconds or truncated
  units, never as raw ns-precision timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.compat import pround, sql_pround
from etl_pyspark_spark.operators.pipeline import events_pipeline
from etl_pyspark_spark.sources.io import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable plus oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec_sum(col, alias: str):
    """Order-insensitive exact sum of a double expression (see module doc)."""
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def _dec_sum_sql(expr: str, alias: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# Reference surface: the flagship pipeline (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@query(
    "reference_pipeline",
    oracle="""
    SELECT
      event_id,
      user_id,
      event_type,
      floor(value * 1000000.0 + 0.5) / 1000000.0 AS value,
      CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      CAST(hour(ts) AS INT) AS event_hour,
      (user_id IN (1, 2, 3)) AS is_key_user,
      (hour(ts) BETWEEN 7 AND 9 OR hour(ts) BETWEEN 17 AND 19) AS is_peak_hour,
      floor((CASE WHEN minute(ts) <> 0
                  THEN value / CAST(minute(ts) AS DOUBLE) END)
            * 1000000.0 + 0.5) / 1000000.0 AS value_per_minute,
      concat_ws(' ', 'Event', CAST(event_id AS VARCHAR), 'by user',
                CAST(user_id AS VARCHAR), 'type', event_type, 'value',
                CAST(round(value, 2) AS VARCHAR)) AS event_summary
    FROM events
    WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
      AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
    """,
)
def q_reference_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole ETL as one Spark query (SURVEY §2.8);
    scan -> null-drop -> derive -> flags -> summary, zero shuffles."""
    return events_pipeline(read_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Relational core: filters / projections (SURVEY §2.2 grown per §2.9)
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5)
             / 1000000.0 AS disc_price,
           floor(l_quantity * 100.0 + 0.5) / 100.0 AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; filters and the 4-column ReadSchema both
    push into the parquet scan (verified in tests/test_plans.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "disc_price"
        ),
        pround(F.col("l_quantity"), 2).alias("qty"),
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.9: groupBy/agg, distinct, rollup/cube)
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dec_sum_sql('l_quantity', 'sum_qty')},
           {_dec_sum_sql('l_extendedprice', 'sum_base_price')},
           {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {_dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)',
                         'sum_charge')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped hash aggregate; Spark does partial (map-side)
    + final agg automatically, one shuffle on the 2 group keys."""
    li = read_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    tax = F.col("l_tax")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity"), "sum_qty"),
            dec_sum(price, "sum_base_price"),
            dec_sum(price * (1 - disc), "sum_disc_price"),
            dec_sum(price * (1 - disc) * (1 + tax), "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders,
           CAST(min(o_totalprice) AS DOUBLE) AS min_price,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) expands to a two-phase agg in Spark (distinct
    keys shuffled once, then counted) — no driver-side dedup."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {_dec_sum_sql('c_acctbal', 'total_acctbal')},
           count(*) AS n_customers
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a two-level dimension hierarchy (region -> nation)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        dec_sum(F.col("c_acctbal"), "total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dec_sum_sql('l_quantity', 'sum_qty')},
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all grouping-set combinations) over lineitem flags."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity"), "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
