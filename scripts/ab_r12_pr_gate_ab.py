#!/usr/bin/env python3
"""Interleaved A/B for the r12 pagerank_int gate re-key: OLD = gate on
node count alone, edges joined to a non-materialized outdeg (SMJ) in
the non-reusable arm; NEW = outdeg checkpointed once, exact |E| from a
tiny aggregate, gate = |V| cap AND (tiny |V| OR |E|/|V| >= ratio),
broadcast join for the small-arm edge materialization. Patches
graph.pagerank_int per arm inside one session and times the two
registry consumers."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from etl_pyspark_spark.checkpoint import DISK_CKPT
from etl_pyspark_spark.operators import graph as G
from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.session import get_session

NEW_IMPL = G.pagerank_int
MASS, DAMP_NUM, DAMP_DEN = G.MASS, G.DAMP_NUM, G.DAMP_DEN


def old_pagerank_int(nodes, edges, iterations=5, edges_reusable=False):
    """Verbatim pre-r12 implementation (node-count-only gate)."""
    nodes = nodes.localCheckpoint(storageLevel=DISK_CKPT)
    n_nodes = nodes.count()
    base = (DAMP_DEN - DAMP_NUM) * (MASS // n_nodes) // DAMP_DEN
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    small = n_nodes <= G._PR_BCAST_MAX_NODES
    if small and edges_reusable:
        ed = edges
        od = F.broadcast(outdeg.localCheckpoint(storageLevel=DISK_CKPT))
    else:
        ed = edges.join(outdeg, "src").localCheckpoint(
            storageLevel=DISK_CKPT
        )
        od = None
    ranks = nodes.withColumn("rank_int", F.lit(MASS // n_nodes))
    for _ in range(iterations):
        contribs = ed.join(od, "src") if od is not None else ed
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
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(csum, 0L)) div {DAMP_DEN}"
                    )
                ).alias("rank_int"),
            )
            .localCheckpoint(storageLevel=DISK_CKPT)
        )
    return ranks


spark = get_session(
    app_name="pr-gate-ab",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")


def run(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


for qname in sys.argv[1:] or ["pagerank_iterative", "pagerank_copurchase"]:
    for impl in (old_pagerank_int, NEW_IMPL):  # warm both arms
        G.pagerank_int = impl
        run(qname)
    rows = []
    for rep in range(REPS):
        for arm, impl in (("old", old_pagerank_int), ("new", NEW_IMPL)):
            G.pagerank_int = impl
            sec = run(qname)
            rows.append((arm, sec))
            print(f"{qname} rep={rep} arm={arm} {sec:.3f}s", flush=True)
    olds = sorted(s for a, s in rows if a == "old")
    news = sorted(s for a, s in rows if a == "new")
    wins = sum(
        1 for (a1, s1), (a2, s2) in zip(rows[::2], rows[1::2]) if s2 < s1
    )
    print(
        f"MEDIAN {qname}: old {olds[len(olds) // 2]:.3f}s"
        f" -> new {news[len(news) // 2]:.3f}s ({wins}/{REPS} pairs in favor)"
    )
G.pagerank_int = NEW_IMPL
spark.stop()
