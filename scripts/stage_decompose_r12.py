#!/usr/bin/env python3
"""Stage decomposition for the r12 verdict's remaining >3 s paths:
time each pipeline stage of dedup_shared_build, dedup_semantic,
entity_resolution_clusters and boilerplate_coverage_ratio separately
(fresh session, noop sink, guide §1) so each gets a
changed-with-evidence or written-off-with-timings verdict."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.session import get_session
from etl_pyspark_spark.sources.io import read_table

spark = get_session(app_name="stage-decompose",
                    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def t(label, df=None, fn=None):
    t0 = time.perf_counter()
    if df is not None:
        df.write.format("noop").mode("overwrite").save()
    else:
        fn()
    sec = time.perf_counter() - t0
    print(f"  {label}: {sec:.3f}s", flush=True)
    return sec


print("== dedup_shared_build stages (cold chain, each includes its "
      "predecessors' first materialization)")
from etl_pyspark_spark.dedup import shared

t("1 shingle_hashes", shared.shingle_hashes(spark, SF_DIR))
t("2 hash_sets (fused, both orders)",
  shared.doc_hash_sets_rarest(spark, SF_DIR))
t("3 verified_pairs", shared.verified_pairs(spark, SF_DIR))
t("4 dup_components", shared.dup_components(spark, SF_DIR))
t("5 full query (warm stages)",
  QUERIES["dedup_shared_build"](spark, SF_DIR))

print("== dedup_semantic stages")
spark.catalog.clearCache()
from etl_pyspark_spark.similarity.semantic import (
    assign_nearest_centroid,
    semantic_dedup,
)
from etl_pyspark_spark.similarity.blockpairs import block_cosine_pairs

emb = read_table(spark, SF_DIR, "embeddings")
cent = emb.where(F.col("vec_id") < 8)
t("1 assign_nearest_centroid", assign_nearest_centroid(emb, cent))
assigned = assign_nearest_centroid(emb, cent).select("vec_id", "centroid_id")
clustered = assigned.join(emb.select("vec_id", "embedding"), "vec_id")
t("2 + join back", clustered)
t("3 + block GEMM pairs",
  block_cosine_pairs(clustered, threshold=0.3, id_col="vec_id",
                     vec_col="embedding", cluster_col="centroid_id"))
t("4 full query", QUERIES["dedup_semantic"](spark, SF_DIR))

print("== entity_resolution_clusters stages")
from etl_pyspark_spark.operators.blocking import capped_block_members

cust = read_table(spark, SF_DIR, "customer")
blocked = capped_block_members(
    cust.select(
        "c_custkey", "c_name", F.col("c_nationkey").alias("nk"),
        F.substring("c_name", 1, 16).alias("blk"),
    ),
    ["nk", "blk"],
    "c_custkey",
)
a = blocked.select(F.col("c_custkey").alias("custkey_a"),
                   F.col("c_name").alias("name_a"), "nk", "blk")
b = blocked.select(F.col("c_custkey").alias("custkey_b"),
                   F.col("c_name").alias("name_b"), "nk", "blk")
pairs = (
    a.join(b, ["nk", "blk"])
    .where(F.col("custkey_a") < F.col("custkey_b"))
    .where(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1)
    .select("custkey_a", "custkey_b")
)
t("1 blocked levenshtein pairs", pairs)
t("2 full query (pairs + cc loop + canonical)",
  QUERIES["entity_resolution_clusters"](spark, SF_DIR))

print("== boilerplate_coverage_ratio stages")
from etl_pyspark_spark.functions import text as T

docs = read_table(spark, SF_DIR, "documents")
tk = docs.select("doc_id", T.ws_tokens(F.col("text")).alias("toks"))
t("1 tokenize", tk)
g = tk.select(
    "doc_id",
    F.posexplode(
        F.transform(
            F.when(F.size("toks") >= 5,
                   F.sequence(F.lit(1), F.size("toks") - 4))
            .otherwise(F.expr("array()").cast("array<int>")),
            lambda s: F.concat_ws(" ", F.slice("toks", s, 5)),
        )
    ).alias("s0", "gram"),
)
t("2 5-gram enumerate", g)
t("3 doc-frequency reduce",
  g.groupBy("gram").agg(F.count_distinct("doc_id").alias("ndocs")))
t("4 full query", QUERIES["boilerplate_coverage_ratio"](spark, SF_DIR))

print("== rank_fusion_rrf (solo, already-minimal check)")
t("full query", QUERIES["rank_fusion_rrf"](spark, SF_DIR))
spark.stop()
