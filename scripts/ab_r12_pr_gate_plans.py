#!/usr/bin/env python3
"""Plan evidence for the r12 pagerank broadcast-gate re-key: replay
one iteration body with the arm the REAL gate (_pr_use_broadcast over
measured |V|/|E|) picks, for (a) the co-purchase graph (|E| ~ 40|V|,
|V| tiny -> broadcast) and (b) a synthetic |E| = 2|V| graph with
|V| = 200k > the 64k tiny floor and ratio 2 < 8 -> keyed shuffle.
Writes plans/r12/pagerank_loopbody_{copurchase,synthetic}_{arm}.txt;
the filenames record the gate's decision."""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from etl_pyspark_spark.checkpoint import DISK_CKPT
from etl_pyspark_spark.operators.baskets import capped_baskets
from etl_pyspark_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    MASS,
    _pr_use_broadcast,
)
from etl_pyspark_spark.plans.introspect import plan_of
from etl_pyspark_spark.session import get_session
from etl_pyspark_spark.sources.io import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(app_name="pr-gate-plans",
                    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def copurchase_graph():
    li = read_table(spark, SF_DIR, "lineitem")
    baskets = capped_baskets(li, "l_orderkey", "l_partkey", out="ps")
    edges = (
        baskets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(storageLevel=DISK_CKPT)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    return nodes, edges


def synthetic_sparse_graph(n=200_000):
    # |V| = n (> the 64k tiny floor), |E| = 2|V| (ratio 2 < 8): the
    # graph class the r11 verdict flagged — big node table, no edge
    # dominance, where a per-round broadcast build buys nothing
    ids = spark.range(n).select(F.col("id").alias("src"))
    edges = (
        ids.select("src", ((F.col("src") * 13 + 7) % n).alias("dst"))
        .union(
            ids.select("src", ((F.col("src") * 29 + 3) % n).alias("dst"))
        )
        .distinct()
        .localCheckpoint(storageLevel=DISK_CKPT)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    return nodes, edges


out_dir = os.path.join(HERE, "plans", "r12")
os.makedirs(out_dir, exist_ok=True)

for label, (nodes, edges) in (
    ("copurchase", copurchase_graph()),
    ("synthetic", synthetic_sparse_graph()),
):
    nodes = nodes.localCheckpoint(storageLevel=DISK_CKPT)
    n_nodes = nodes.count()
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .localCheckpoint(storageLevel=DISK_CKPT)
    )
    n_edges = int(outdeg.agg(F.sum("od").alias("m")).collect()[0]["m"] or 0)
    small = _pr_use_broadcast(n_nodes, n_edges)
    arm = "broadcast" if small else "shuffle"
    print(f"{label}: |V|={n_nodes} |E|={n_edges} "
          f"ratio={n_edges / n_nodes:.1f} -> {arm}")
    base = (DAMP_DEN - DAMP_NUM) * (MASS // n_nodes) // DAMP_DEN
    ranks = nodes.withColumn("rank_int", F.lit(MASS // n_nodes))
    contribs = edges.join(F.broadcast(outdeg) if small else outdeg, "src")
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
    path = os.path.join(out_dir, f"pagerank_loopbody_{label}_{arm}.txt")
    with open(path, "w") as fh:
        fh.write(plan_of(body))
    print("wrote", path)
spark.stop()
