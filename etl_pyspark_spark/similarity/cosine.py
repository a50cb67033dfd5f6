"""Exact cosine similarity over embedding arrays — pure JVM exprs.

The reference has no vector operations at all (its only numerics are
scalar column arithmetic, reference nyc_taxi_etl.py:56-75); this module
is part of the engine's LLM-pipeline growth surface (SURVEY.md §2.9).

Everything is built from ``zip_with`` + ``aggregate`` so the whole dot
product stays inside whole-stage codegen — no Python, no UDF, no Arrow
hop. Summation is strictly index-ordered left-to-right, and elements
are cast float->double first, which makes the result bit-identical to
the DuckDB oracle twin (``sql_dot``) that sums the same way via
``list_sum(list_transform(list_zip(...)))``.

Scale notes (100 TB): brute-force top-k is a broadcast nested-loop of
the (small) query set against the (huge) corpus — the corpus is never
shuffled, only scanned; per-partition partial top-k would be the next
refinement (Spark already pushes the rank filter into a window
group-limit). For corpus-x-corpus similarity use :mod:`lsh` instead —
a cross join is O(n^2) and banned above trivial sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.compat import pround


def as_double(col: Column) -> Column:
    """array<float> -> array<double> (cast each element, exact)."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Index-ordered dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (same cast, same sum order)."""
    return (
        f"list_sum(list_transform(list_zip(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])), x -> x[1] * x[2]))"
    )


def sql_cosine(a: str, b: str) -> str:
    na = f"sqrt({sql_dot(a, a)})"
    nb = f"sqrt({sql_dot(b, b)})"
    return (
        f"(CASE WHEN {na} > 0 AND {nb} > 0 "
        f"THEN {sql_dot(a, b)} / ({na} * {nb}) END)"
    )


def cosine_batch_pandas(
    df: DataFrame,
    a_col: str,
    b_col: str,
    out_col: str = "cos_sim",
    round_to: int = 6,
) -> DataFrame:
    """Append a cosine column computed vectorized in numpy via
    ``mapInPandas`` — for verifying large candidate-pair sets where
    per-row ``zip_with``/``aggregate`` expression eval dominates
    (~10 us/pair in Catalyst vs ~0.1 us/pair in BLAS). Rounds with the
    ``pround`` formula so the oracle twin agrees despite BLAS summation
    order."""
    import pyspark.sql.types as T

    out_fields = df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    schema = T.StructType(out_fields)
    m = float(10**round_to)

    def compute(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf):
                a = np.stack(pdf[a_col].values).astype("float64")
                b = np.stack(pdf[b_col].values).astype("float64")
                dots = np.einsum("ij,ij->i", a, b)
                na = np.sqrt(np.einsum("ij,ij->i", a, a))
                nb = np.sqrt(np.einsum("ij,ij->i", b, b))
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = np.where((na > 0) & (nb > 0), dots / (na * nb), np.nan)
                pdf[out_col] = np.floor(c * m + 0.5) / m
            else:
                pdf[out_col] = []
            yield pdf

    return df.mapInPandas(compute, schema=schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of each query vector over the corpus.

    Plan shape: ``broadcast(queries)`` nested-loop against the corpus
    scan (the corpus side never shuffles for the join), then one
    window shuffle keyed by query id for the per-query rank. Rank
    orders by the *rounded* cosine so Spark and the oracle agree even
    when the raw doubles differ in the last ulp.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    sim = pround(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= k)
    )
