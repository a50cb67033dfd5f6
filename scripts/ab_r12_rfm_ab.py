#!/usr/bin/env python3
"""Interleaved A/B + equality proof for the r12 customer_rfm_segments
rewrite: OLD = three (o_custkey, tile) ntile legs hash-joined back to
the rfm aggregate; NEW = the three ntile legs CHAINED over the full
frame (no join-backs). Both run inside one session, alternating per
rep; first an exceptAll equality check both directions."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from etl_pyspark_spark.operators.ranks import with_global_ntile
from etl_pyspark_spark.session import get_session
from etl_pyspark_spark.sources.io import read_table

spark = get_session(
    app_name="rfm-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
)
spark.sparkContext.setLogLevel("ERROR")


def rfm_base():
    orders = read_table(spark, SF_DIR, "orders")
    g = F.broadcast(orders.agg(F.max("o_orderdate").alias("mx")))
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(g)
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_order"))
            .cast("int")
            .alias("recency_days"),
            "n_orders",
            "monetary",
        )
        .withColumn("negf", -F.col("n_orders"))
        .withColumn("negm", -F.col("monetary"))
    )


OUT = [
    "o_custkey",
    "recency_days",
    F.col("n_orders").cast("bigint").alias("n_orders"),
    "monetary",
    "r_tile",
    "f_tile",
    "m_tile",
    F.concat(
        F.col("r_tile").cast("string"),
        F.col("f_tile").cast("string"),
        F.col("m_tile").cast("string"),
    ).alias("segment"),
]


def build_old():
    rfm = rfm_base().persist()
    r = with_global_ntile(
        rfm, ["recency_days", "o_custkey"], 4, "r_tile"
    ).select("o_custkey", "r_tile")
    f_ = with_global_ntile(rfm, ["negf", "o_custkey"], 4, "f_tile").select(
        "o_custkey", "f_tile"
    )
    m = with_global_ntile(rfm, ["negm", "o_custkey"], 4, "m_tile").select(
        "o_custkey", "m_tile"
    )
    return (
        rfm.select("o_custkey", "recency_days", "n_orders", "monetary")
        .join(r, "o_custkey")
        .join(f_, "o_custkey")
        .join(m, "o_custkey")
        .select(*OUT)
    )


def build_new():
    rfm = rfm_base().persist()
    t = with_global_ntile(rfm, ["recency_days", "o_custkey"], 4, "r_tile")
    t = with_global_ntile(t, ["negf", "o_custkey"], 4, "f_tile")
    t = with_global_ntile(t, ["negm", "o_custkey"], 4, "m_tile")
    return t.select(*OUT)


def force(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# --- equality, both directions --------------------------------------
a, b = build_old(), build_new()
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"equality: old\\new={d1} new\\old={d2}")
assert d1 == 0 and d2 == 0, "RFM rewrite changed results!"
spark.catalog.clearCache()

# --- interleaved timing ----------------------------------------------
for build in (build_old, build_new):  # warm both arms
    force(build())
    spark.catalog.clearCache()
rows = []
for rep in range(REPS):
    for arm, build in (("old", build_old), ("new", build_new)):
        sec = force(build())
        spark.catalog.clearCache()
        rows.append((arm, sec))
        print(f"rfm rep={rep} arm={arm} {sec:.3f}s", flush=True)
olds = sorted(s for a_, s in rows if a_ == "old")
news = sorted(s for a_, s in rows if a_ == "new")
wins = sum(1 for (a1, s1), (a2, s2) in zip(rows[::2], rows[1::2]) if s2 < s1)
print(
    f"MEDIAN customer_rfm_segments: old {olds[len(olds) // 2]:.3f}s"
    f" -> new {news[len(news) // 2]:.3f}s ({wins}/{REPS} pairs in favor)"
)
spark.stop()
