#!/usr/bin/env python3
"""Interleaved A/B + equality proof for the r12 centroid-assignment
rewrite: OLD = crossJoin(broadcast(centroids)) expanding k rows per
vector + a window argmax (one keyed exchange + sort over k·n rows);
NEW = the centroid set collected (bounded: k vectors by contract of
every caller) and inlined as a LITERAL array, so the argmax is a pure
per-row array_max over structs — zero exchanges, zero row expansion.
Patches similarity.semantic.assign_nearest_centroid per arm inside one
session and times the three consumer queries."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from etl_pyspark_spark.functions.compat import pround
from etl_pyspark_spark.similarity import semantic as S
from etl_pyspark_spark.similarity.cosine import as_double, cosine
from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.session import get_session

NEW_IMPL = S.assign_nearest_centroid  # the r12 literal-array shape
from pyspark.sql.window import Window


def old_assign(emb, centroids, id_col="vec_id", vec_col="embedding",
               centroid_id_col="centroid_id", extra_cols=()):
    """Verbatim pre-r12 shape: crossJoin(broadcast) + window argmax."""
    v = emb.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_vv"), *extra_cols
    )
    c = centroids.select(
        F.col(id_col).alias(centroid_id_col),
        as_double(F.col(vec_col)).alias("_cv"),
    )
    sim = pround(cosine(F.col("_vv"), F.col("_cv")), 6)
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        v.crossJoin(F.broadcast(c))
        .select(id_col, centroid_id_col, sim.alias("cos_sim"), *extra_cols)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


spark = get_session(
    app_name="centroid-ab",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

# --- equality, both directions, full column set ----------------------
from etl_pyspark_spark.sources.io import read_table

emb = read_table(spark, SF_DIR, "embeddings")
cent = emb.where(F.col("vec_id") < 8)
a = old_assign(emb, cent)
b = NEW_IMPL(emb, cent).select(*a.columns)
d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
print(f"equality: old\\new={d1} new\\old={d2}")
assert d1 == 0 and d2 == 0, "centroid rewrite changed results!"

# --- interleaved timing on the consumer queries -----------------------
def run(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


names = sys.argv[1:] or [
    "dedup_semantic",
    "embedding_assign_nearest_centroid",
    "kmeans_update_step",
]
for qname in names:
    for impl in (old_assign, NEW_IMPL):  # warm both arms
        S.assign_nearest_centroid = impl
        run(qname)
    rows = []
    for rep in range(REPS):
        for arm, impl in (("old", old_assign), ("new", NEW_IMPL)):
            S.assign_nearest_centroid = impl
            sec = run(qname)
            rows.append((arm, sec))
            print(f"{qname} rep={rep} arm={arm} {sec:.3f}s", flush=True)
    olds = sorted(s for a_, s in rows if a_ == "old")
    news = sorted(s for a_, s in rows if a_ == "new")
    wins = sum(
        1 for (a1, s1), (a2, s2) in zip(rows[::2], rows[1::2]) if s2 < s1
    )
    print(
        f"MEDIAN {qname}: old {olds[len(olds) // 2]:.3f}s"
        f" -> new {news[len(news) // 2]:.3f}s ({wins}/{REPS} pairs in favor)"
    )
S.assign_nearest_centroid = NEW_IMPL
spark.stop()
