#!/usr/bin/env python3
"""Capture the pagerank_int LOOP-BODY plan on each side of the
broadcast gate. The registered queries end in a localCheckpoint, so
their query-level explain is an ExistingRDD scan regardless of the
loop's shape; this script replays ONE iteration body (the
contribution join + the rank rebuild, exactly the expressions in
operators/graph.pagerank_int) and explains it BEFORE checkpointing,
once with the gate open (broadcast arm) and once forced shut
(keyed-shuffle arm) — the before/after plan evidence for the r11
pagerank change."""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from etl_pyspark_spark.checkpoint import DISK_CKPT
from etl_pyspark_spark.operators.baskets import cap_items_array
from etl_pyspark_spark.operators.graph import DAMP_DEN, DAMP_NUM, MASS
from etl_pyspark_spark.plans.introspect import plan_of
from etl_pyspark_spark.session import get_session
from etl_pyspark_spark.sources.io import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(app_name="pr-loopbody-plan",
                    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

li = read_table(spark, SF_DIR, "lineitem")
baskets = li.groupBy("l_orderkey").agg(
    cap_items_array(F.collect_set("l_partkey")).alias("ps")
)
edges = (
    baskets.select(F.explode("ps").alias("src"), "ps")
    .select("src", F.explode("ps").alias("dst"))
    .where(F.col("src") != F.col("dst"))
    .distinct()
    .localCheckpoint(storageLevel=DISK_CKPT)
)
nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
    storageLevel=DISK_CKPT
)
n_nodes = nodes.count()
base = (DAMP_DEN - DAMP_NUM) * (MASS // n_nodes) // DAMP_DEN
outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
ranks = nodes.withColumn("rank_int", F.lit(MASS // n_nodes))

out_dir = os.path.join(HERE, "plans", "r11")
os.makedirs(out_dir, exist_ok=True)

for arm, small in (("broadcast", True), ("shuffle", False)):
    if small:
        od = F.broadcast(outdeg.localCheckpoint(storageLevel=DISK_CKPT))
        contribs = edges.join(od, "src")
    else:
        contribs = edges.join(outdeg, "src")
    contribs = (
        contribs.join(
            F.broadcast(ranks) if small else ranks,
            F.col("src") == F.col("node"),
        )
        .select("dst", F.expr("rank_int div od").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("csum"))
    )
    if small:
        contribs = F.broadcast(contribs)
    body = nodes.join(contribs, nodes.node == contribs.dst, "left").select(
        "node",
        (
            F.lit(base)
            + F.expr(f"({DAMP_NUM} * coalesce(csum, 0L)) div {DAMP_DEN}")
        ).alias("rank_int"),
    )
    path = os.path.join(out_dir, f"pagerank_loopbody_{arm}.txt")
    with open(path, "w") as fh:
        fh.write(plan_of(body))
    print("wrote", path)
spark.stop()
