"""Query family: sort_set_window (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    query,
    read_table,
)

# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.9)
# ---------------------------------------------------------------------------


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge of N), never a full sort of the table."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
        )
        .limit(15)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC)
               AS rk
      FROM customer JOIN orders ON c_custkey = o_custkey)
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via a ranking window + filter (the
    distributed top-k-per-group idiom; Spark pushes the rk<=3 filter
    into the window sort as a group-limit)."""
    from etl_pyspark_spark.operators.windows import top_k_per_group

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey).select(
        "c_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    return top_k_per_group(
        joined,
        ["c_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.9)
# ---------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS entity_id FROM customer
    EXCEPT
    SELECT user_id FROM events
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer keys that never appear as an event
    user. ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would
    be multiset semantics, which SQL EXCEPT is not)."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id")
    )
    e = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity_id")
    )
    return c.subtract(e)


@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset (exact distinct)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.9: ranking, lag/lead, frames)
# ---------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a per-customer window (one shuffle on
    o_custkey, in-partition sort)."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           lag(value, 1) OVER w AS prev_value,
           lead(value, 1) OVER w AS next_value,
           CAST(floor(epoch(ts)) AS BIGINT)
             - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w
             AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead along each user's event timeline (sessionization
    building block)."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    epoch_s = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        "user_id",
        epoch_s.alias("epoch_s"),
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (epoch_s - F.lag(epoch_s, 1).over(w)).alias("secs_since_prev"),
    )


@query(
    "window_moving_agg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(*) OVER w AS moving_avg_3,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS moving_sum_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame aggregate (3-order moving sum/avg per customer);
    decimal-cast inside the frame so both engines sum exactly."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, 0)
    )
    msum = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double")
    mcount = F.count(F.lit(1)).over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (msum / mcount).alias("moving_avg_3"),
        msum.alias("moving_sum_3"),
    )


@query(
    "window_cumulative",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           first_value(o_orderkey)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS first_order
    FROM orders
    """,
)
def q_window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + first_value (cumulative frame)."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(wcum)
        .cast("double")
        .alias("running_total"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


