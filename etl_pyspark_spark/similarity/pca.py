"""PCA whitening for embedding columns — the standard preprocessing
step before ANN indexing or semantic dedup (decorrelate + equalize
component variances; e.g. the "PCA + whitening" stage of classic
image-retrieval pipelines and many embedding-store ingests).

Spark-first shape, in three bounded stages:

1. MOMENTS: one pass over the corpus accumulates per-PARTITION
   (n, Σx, Σxxᵀ) inside ``mapInPandas`` — the iterator yields ONE
   summary row per partition (never per batch), so the reduce table
   is |partitions| rows of d + d² doubles. The driver combines them
   in partition order (deterministic float sum) into mean/covariance.
2. EIGEN: ``numpy.linalg.eigh`` on the d×d covariance (d=64 here —
   microseconds; driver-side by design, the matrix is a constant-size
   summary, not data). Eigenvector signs are fixed (largest-|·|
   component made positive) so the basis is unique and runs are
   reproducible.
3. PROJECT: the k-column whitening matrix ``W = V·Λ^(-1/2)`` (plus
   the mean) broadcasts to executors; projection is one Arrow-batched
   matrix multiply per batch — embeddings cross into Python exactly
   once.

At 100 TB the only driver-side growth is the |partitions| summary
rows (33 KB each at d=64); for very high partition counts, insert one
intermediate pairwise-combine stage — the moment sums are exactly
re-aggregatable. No SQL oracle exists for eigendecomposition, so the
registry entry is rows-only; invariants (whitened covariance ≈ I,
agreement with a driver-side reference PCA, descending eigenvalues)
are pinned in tests/test_pca.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_moments(emb: DataFrame, vec_col: str = "embedding"):
    """Driver-side (n, mean, covariance) from one distributed pass.
    Population covariance (divide by n) — the whitening convention."""
    import numpy as np

    def partial(batches):
        import pandas as pd

        n, s, ss, dim = 0, None, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["v"].values).astype("float64")
            if s is None:
                dim = x.shape[1]
                s = np.zeros(dim)
                ss = np.zeros((dim, dim))
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "ss": [ss.reshape(-1).tolist()],
                }
            )

    rows = (
        emb.select(F.col(vec_col).alias("v"))
        .mapInPandas(
            partial, schema="n bigint, s array<double>, ss array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:  # fixed order: deterministic float combine
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def whitening_matrix(cov, k: int, eps: float = 1e-9):
    """Top-k eigenpairs of the covariance, sign-fixed, as the
    whitening projection W = V·diag(1/sqrt(λ+eps)); returns
    (eigenvalues desc, W) with W of shape (d, k)."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    lam = vals[order]
    v = vecs[:, order]
    # unique basis: make each eigenvector's largest-|.| entry positive
    flips = np.sign(v[np.abs(v).argmax(axis=0), np.arange(v.shape[1])])
    flips[flips == 0] = 1.0
    v = v * flips
    w = v / np.sqrt(lam + eps)
    return lam, w


def pca_whiten(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id, components): k whitened principal components per vector,
    rounded to ``round_to`` decimals for cross-run stability."""
    import numpy as np

    _, mean, cov = corpus_moments(emb, vec_col)
    _, w = whitening_matrix(cov, k)
    sc = emb.sparkSession.sparkContext
    # round_to ships inside the broadcast so the projection honors the
    # caller's precision (advice r04: it was hardcoded to 6).
    bc = sc.broadcast((mean.tolist(), w.tolist(), int(round_to)))

    def project(batches):
        import pandas as pd

        m, wm = (np.asarray(a) for a in bc.value[:2])
        scale = 10.0 ** bc.value[2]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["v"].values).astype("float64")
            y = (x - m) @ wm
            y = np.floor(y * scale + 0.5) / scale  # pround twin
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "components": list(map(list, y))}
            )

    return emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).mapInPandas(project, schema="vec_id bigint, components array<double>")
