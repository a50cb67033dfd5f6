"""Query family: aggregations (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    _dec_sum_sql,
    dec_sum,
    query,
    read_table,
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
    from etl_pyspark_spark.sources.io import spread

    # the four exact-decimal sums are the job, and they run in the
    # partial (map-side) agg — which on a single-row-group fixture
    # file is ONE task. Fan the scan out first (spread() is a guarded
    # no-op on many-file lakes); measured 1.06 -> 0.75 s median,
    # every A/B pair in favor. Sister aggregates whose partial agg is
    # cheap (pareto/rfm/rank-fusion) measured a wash or worse and
    # stay unspread.
    li = spread(read_table(spark, sf_dir, "lineitem"))
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


