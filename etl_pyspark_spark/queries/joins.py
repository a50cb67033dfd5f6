"""Query family: joins (mechanically split from registry.py — see core)."""

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
# Joins (SURVEY §2.9): broadcast equi, outer, semi/anti, multiway,
# range (non-equi), as-of
# ---------------------------------------------------------------------------


@query(
    "join_inner_broadcast",
    oracle=f"""
    SELECT n_name,
           {_dec_sum_sql('o_totalprice', 'total_revenue')},
           count(*) AS n_orders
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension equi join; both dims broadcast so the orders
    scan never shuffles for the join (only for the final group-by)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dec_sum(F.col("o_totalprice"), "total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "join_shuffle_hash",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n_lines,
           {_dec_sum_sql("l_extendedprice", "total_price")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with the SHUFFLE_HASH strategy: both sides
    shuffle on the key but NEITHER sorts — the smaller side builds a
    hash map per partition. For high-cardinality, evenly-distributed
    keys this beats sort-merge (no two n-log-n sorts) and beats
    broadcast when no side fits in memory; plan-pinned as
    ShuffledHashJoin in tests/test_plans.py."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum(F.col("l_extendedprice"), "total_price"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6))), 0)
                AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeping customers with zero orders (count=0,
    total 0)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one finished
    order; semi joins never duplicate or widen the left side."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT'
                        AND o_orderstatus = 'F')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no finished urgent
    order (predicate chosen to be non-degenerate on the fixtures)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                  FROM customer GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                  FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cust.nk, supp.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations having customers
    and/or suppliers)."""
    c = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_range",
    oracle=f"""
    SELECT r_regionkey AS band_id,
           count(*) AS n_orders,
           {_dec_sum_sql('o_totalprice', 'band_total')}
    FROM orders
      JOIN region ON o_totalprice >= r_regionkey * 12000.0
                 AND o_totalprice <  (r_regionkey + 1) * 12000.0
    GROUP BY r_regionkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join: orders bucketed into price bands derived
    from the 5-row region table. The tiny side broadcasts, so the plan
    is BroadcastNestedLoopJoin — the only sane physical strategy for a
    pure range predicate; at scale the small side MUST be the
    broadcast one (it is, by construction)."""
    o = read_table(spark, sf_dir, "orders")
    bands = read_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("band_id"),
        (F.col("r_regionkey") * 12000.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 12000.0).alias("hi"),
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice"), "band_total"),
        )
    )


@query(
    "join_range_binned",
    oracle="""
    WITH iv AS (SELECT o_orderkey,
                       date_diff('day', DATE '1970-01-01', o_orderdate) AS s
                FROM orders WHERE o_orderkey % 13 = 0),
         pt AS (SELECT date_diff('day', DATE '1970-01-01', l_shipdate) AS p
                FROM lineitem WHERE l_orderkey % 17 = 0)
    SELECT o_orderkey, count(*) AS n_ship_events
    FROM iv JOIN pt ON p >= s AND p < s + 30
    GROUP BY o_orderkey
    """,
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join: ship events vs 30-day order windows,
    rewritten as a bin equi-join + residual filter
    (operators/joins.range_join_binned). Neither side broadcasts; the
    shuffle is keyed by bin, blow-up bounded at 2x — the scale path
    where a naive theta join nested-loops."""
    from etl_pyspark_spark.operators.joins import range_join_binned

    epoch = F.lit("1970-01-01")
    iv = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), epoch).alias("s"),
            (F.datediff(F.col("o_orderdate"), epoch) + 30).alias("e"),
        )
    )
    pt = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 17 == 0)
        .select(F.datediff(F.col("l_shipdate"), epoch).alias("p"))
    )
    return (
        range_join_binned(pt, iv, "p", "s", "e", bin_width=30)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_ship_events"))
    )


@query(
    "join_range_binned_agg",
    oracle="""
    WITH iv AS (SELECT o_orderkey,
                       CAST(date_trunc('month', o_orderdate) AS DATE)
                         AS window_month,
                       date_diff('day', DATE '1970-01-01', o_orderdate) AS s
                FROM orders WHERE o_orderkey % 13 = 0),
         pt AS (SELECT date_diff('day', DATE '1970-01-01', l_shipdate) AS p
                FROM lineitem WHERE l_orderkey % 17 = 0)
    SELECT window_month,
           count(*) AS n_matches,
           count(DISTINCT o_orderkey) AS n_orders
    FROM iv JOIN pt ON p >= s AND p < s + 30
    GROUP BY window_month
    """,
)
def q_join_range_binned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-bounded twin of join_range_binned (r06 verdict #4):
    the same interval-join COUNTS, aggregated per calendar MONTH of
    the window start. Scale design — aggregate pushdown through the
    band join: ship events collapse to per-DAY counts FIRST (the
    range predicate is day-granular, so this is exact), and the bin
    join then pairs windows with <= |days-in-range| weighted day rows
    instead of enumerating every (window, event) match. Work is
    O(events + windows x 30), not O(matches): at a 30x-denser
    calendar the raw match count grows ~900x (30x windows x 30x
    events per window) while this plan's work grows 30x — measured
    83 s -> 3 s at the 30x grow fixture. Output stays bounded by the
    calendar span (~84 months at any replication). join_range_binned
    keeps the row-level enumeration for correctness; THIS is the plan
    a 100 TB count-rollup should run."""
    from etl_pyspark_spark.operators.joins import range_join_binned

    epoch = F.lit("1970-01-01")
    iv = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            F.trunc(F.col("o_orderdate"), "month").alias("window_month"),
            F.datediff(F.col("o_orderdate"), epoch).alias("s"),
            (F.datediff(F.col("o_orderdate"), epoch) + 30).alias("e"),
        )
    )
    day_counts = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 17 == 0)
        .select(F.datediff(F.col("l_shipdate"), epoch).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("day_n"))
    )
    return (
        range_join_binned(day_counts, iv, "p", "s", "e", bin_width=30)
        .groupBy("window_month")
        .agg(
            F.sum("day_n").cast("bigint").alias("n_matches"),
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
        )
    )


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch_s,
           s.signup_epoch_s AS asof_signup_epoch_s,
           s.signup_value AS asof_signup_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS signup_epoch_s,
               value AS signup_value
        FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the latest prior signup
    per user (union + window implementation in operators/joins.py —
    one shuffle, no UDF, scales to both sides being huge)."""
    from etl_pyspark_spark.operators.joins import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.unix_timestamp("ts").alias("purchase_epoch_s"),
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.unix_timestamp("ts").alias("signup_epoch_s"),
        F.col("value").alias("signup_value"),
    )
    out = asof_join(
        purchases,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["signup_epoch_s", "signup_value"],
    )
    return out.select(
        "event_id", "user_id", "purchase_epoch_s",
        "asof_signup_epoch_s", "asof_signup_value",
    )


