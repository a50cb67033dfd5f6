"""Query family: scalar_funcs (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    query,
    read_table,
)

# ---------------------------------------------------------------------------
# Scalar functions: JSON / arrays / strings / dates (SURVEY §2.9)
# ---------------------------------------------------------------------------


@query(
    "json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events
    GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column
    (get_json_object stays JVM-side; no Python in the loop)."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("bigint").alias("k_sum"))
    )


@query(
    "explode_tokens",
    oracle="""
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token ASC
    LIMIT 20
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode + count: the canonical array pipeline (word
    frequency top-20 over documents)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "scalar_string_date",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           length(o_orderpriority) AS prio_len,
           substr(o_orderpriority, 1, 1) AS prio_code,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(o_orderdate AS DATE) AS order_date,
           concat(o_orderstatus, '-', CAST(year(o_orderdate) AS VARCHAR))
             AS status_year,
           abs(o_totalprice - 50000.0) AS price_dev,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_kbucket
    FROM orders
    """,
)
def q_scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar-function medley (upper, length, substr,
    year/month/day, concat, abs, floor) — all JVM builtins."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.length("o_orderpriority").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.to_date("o_orderdate").alias("order_date"),
        F.concat_ws(
            "-", F.col("o_orderstatus"), F.year("o_orderdate").cast("string")
        ).alias("status_year"),
        F.abs(F.col("o_totalprice") - 50000.0).alias("price_dev"),
        F.floor(F.col("o_totalprice") / 1000.0).alias("price_kbucket"),
    )


