"""Scalar int8 quantization of embedding vectors.

The standard ANN-at-scale compression: per-vector symmetric scalar
quantization maps each float32 dimension to an int8 code
``q = round(x / max_abs * 127)``, reconstructing ``x_hat = q *
max_abs / 127``. A 768-dim float32 embedding (3 KB) becomes 768 bytes
of codes + one float scale — 4x less storage, 4x less shuffle for
every downstream similarity join, and SIMD-friendly integer dot
products on engines that exploit them. (Same scheme as FAISS
``ScalarQuantizer`` QT_8bit_direct / Milvus SQ8.)

Everything here is deterministic IEEE double arithmetic (portable
round = ``floor(x + 0.5)``), so the whole pipeline — codes, scales,
reconstruction error — is bit-reproducible cross-engine and carries a
full DuckDB oracle (registry ``embedding_quantize_int8``); the
reference has no similarity surface at all (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.compat import pround


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add int8 codes + scale for ``vec_col`` (kept, for comparison).

    Output columns: ``q`` (array<int> in [-127, 127]), ``max_abs``
    (double scale). Zero vectors quantize to all-zero codes with
    scale 0. One narrow projection — no shuffle, no UDF; ``transform``
    lambdas stay inside whole-stage codegen.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = df.withColumn("_v", v).withColumn(
        "max_abs", F.array_max(F.transform(F.col("_v"), F.abs))
    )
    code = lambda x: F.when(  # noqa: E731
        F.col("max_abs") > 0.0,
        F.floor(x / F.col("max_abs") * 127.0 + 0.5).cast("int"),
    ).otherwise(F.lit(0))
    return df.withColumn("q", F.transform(F.col("_v"), code)).drop("_v")


def dequantize(q: Column, max_abs: Column) -> Column:
    """Reconstruct the double vector from int8 codes + scale."""
    return F.transform(q, lambda c: c.cast("double") * max_abs / 127.0)


def _int_self_dot(q: Column) -> Column:
    """Exact integer self dot product of a code vector (bigint)."""
    return F.aggregate(
        F.transform(q, lambda x: (x * x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantized_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    expand: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: int8 coarse scoring -> exact cosine re-rank.

    Stage 1 ranks the corpus per query by *quantized* cosine — integer
    code dot product over integer norms, computed against the
    broadcast query codes while the corpus streams (no corpus
    shuffle). Only the top ``expand`` candidate IDs per query survive.
    Stage 2 joins those (n_queries x expand) candidates back to the
    raw vectors and re-ranks by exact cosine, keeping ``k``.

    At 100 TB this is the classic memory-bound ANN layout: the scan
    touches 4x fewer bytes than float32 brute force (codes instead of
    floats), and the exact pass reads only ``expand/|corpus|`` of the
    raw vectors. Every arithmetic step (codes, integer dots, IEEE
    sqrt/divide) is deterministic, so the whole two-stage pipeline is
    SQL-oracle-checkable — approximation and all.
    """
    from pyspark.sql.window import Window

    from etl_pyspark_spark.functions.compat import pround
    from etl_pyspark_spark.similarity.cosine import as_double, cosine

    qc = quantize_int8(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"),
        _int_self_dot(F.col("q")).alias("cqq"),
    )
    qq = quantize_int8(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq_codes"),
        _int_self_dot(F.col("q")).alias("qqq"),
    )
    idot = F.aggregate(
        F.zip_with(
            F.col("qq_codes"), F.col("cq"), lambda a, b: (a * b).cast("bigint")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qcos = F.when(
        (F.col("qqq") > 0) & (F.col("cqq") > 0),
        idot.cast("double")
        / (
            F.sqrt(F.col("qqq").cast("double"))
            * F.sqrt(F.col("cqq").cast("double"))
        ),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        qc.join(
            F.broadcast(qq), F.col("query_id") != F.col("neighbor_id")
        )
        .select("query_id", "neighbor_id", qcos.alias("qcos"))
        .where(F.col("qcos").isNotNull())
        .select("*", F.row_number().over(wc).alias("crk"))
        .where(F.col("crk") <= expand)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    sim = pround(cosine(F.col("qv"), F.col("cv")), 6)
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    cand_qv = cand.join(F.broadcast(qv), "query_id")
    return (
        # broadcast the (n_queries x expand) candidate list against the
        # corpus scan — the big side never shuffles for the re-rank
        cv.join(F.broadcast(cand_qv), "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .select("*", F.row_number().over(wr).alias("rk"))
        .where(F.col("rk") <= k)
    )
