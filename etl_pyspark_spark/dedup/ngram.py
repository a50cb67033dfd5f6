"""Exact n-gram Jaccard similarity via a shingle inverted index.

Companion to MinHash (dedup/minhash.py): same word-3-gram shingles,
but candidates come from an *inverted index* self-join (any pair with
Jaccard > 0 shares >= 1 shingle, so the candidate set is complete and
the result is exact, unlike LSH). The join shuffles (shingle ->
doc list) postings; at 100 TB the standard refinements are a
document-frequency cap on ultra-common shingles and prefix filtering
(Chaudhuri et al., ICDE'06) — both drop only candidates that cannot
reach the threshold. Kept un-capped here because the driver fixtures
are synthetic-vocabulary text with no stop-shingle skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pyspark_spark.dedup.minhash import hashed_shingles
from etl_pyspark_spark.functions.compat import pround


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All (id_a < id_b, jaccard) pairs with exact shingle-set Jaccard
    >= threshold.

    Joins on the 60-bit shingle *hash* (int64), not the string — a
    ~10x cheaper shuffle key — and caches the hashed postings, which
    are read three times (sizes + both join sides)."""
    sh = (
        hashed_shingles(df, text_col, id_col, n)
        .dropDuplicates([id_col, "h60"])
        .cache()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "h60")
    b = sh.select(F.col(id_col).alias("id_b"), "h60")
    inter = (
        a.join(b, "h60")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .where(jac >= threshold)
        .select(
            F.col("id_a").alias("doc_id_a"),
            F.col("id_b").alias("doc_id_b"),
            pround(jac, 6).alias("jaccard"),
        )
    )
