#!/usr/bin/env python3
"""Interleaved A/B: self-join pair expansion vs collect_set + in-row
double explode, on the basket_part_pairs shape (and the derived pair
count equality check)."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from etl_pyspark_spark.operators.baskets import (
    capped_basket_items,
    capped_basket_pairs,
)
from etl_pyspark_spark.session import get_session
from etl_pyspark_spark.sources.io import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

spark = get_session(app_name="basket-ab",
                    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
li = read_table(spark, SF_DIR, "lineitem")


def old_pairs():
    parts = capped_basket_items(li, "l_orderkey", "l_partkey")
    a = parts.alias("a")
    b = parts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


def new_pairs():
    pairs = capped_basket_pairs(
        li, "l_orderkey", "l_partkey", out_a="part_a", out_b="part_b"
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


# value-equality guard: full pair-count tables must match exactly
o = (
    capped_basket_items(li, "l_orderkey", "l_partkey")
    .alias("a")
    .join(
        capped_basket_items(li, "l_orderkey", "l_partkey").alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    .select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    .groupBy("part_a", "part_b")
    .count()
)
n = capped_basket_pairs(
    li, "l_orderkey", "l_partkey", out_a="part_a", out_b="part_b"
).groupBy("part_a", "part_b").count()
diff = o.join(n, ["part_a", "part_b", "count"], "full_outer").where(
    F.lit(False)
)  # placeholder; do exceptAll both ways
d1 = o.exceptAll(n).count()
d2 = n.exceptAll(o).count()
print(f"pair-table diff: old-not-new={d1} new-not-old={d2}")
assert d1 == 0 and d2 == 0

def run(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

for fn in (old_pairs, new_pairs):
    run(fn)  # warm
rows = []
for rep in range(REPS):
    for arm, fn in (("old", old_pairs), ("new", new_pairs)):
        sec = run(fn)
        rows.append((arm, sec))
        print(f"rep={rep} arm={arm} {sec:.3f}s", flush=True)
olds = sorted(s for a, s in rows if a == "old")
news = sorted(s for a, s in rows if a == "new")
print(f"MEDIAN basket_part_pairs: old {olds[len(olds)//2]:.3f}s -> new {news[len(news)//2]:.3f}s")
spark.stop()
