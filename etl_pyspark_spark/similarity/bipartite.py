"""Bipartite max-cosine: every LEFT vector against a small RIGHT set.

The semantic-decontamination shape: train corpus (huge, scanned) vs a
benchmark/test set (small by construction — benchmarks are thousands
of rows while training corpora are billions). The right side collects
to the driver once (bounded: |test| x dim floats) and ships to
executors inside the Arrow-batched ``mapInPandas`` closure, so the
corpus NEVER shuffles and the work is one BLAS GEMM per batch —
identical plan shape at any corpus size, exactly like the
broadcast-dim discipline in the join family.

Cross-engine determinism: cosines are rounded with the ``pround``
formula (floor(x*1e6+0.5)/1e6) BEFORE thresholding, so the BLAS
summation order here and the DuckDB fold order in the oracle agree on
which pairs qualify (same rule as similarity/cosine.cosine_batch_pandas).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def bipartite_max_cosine(
    left: DataFrame,
    right_ids: np.ndarray,
    right_mat: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """For each left row, the max cosine against ``right_mat`` and the
    number of right vectors at or above ``threshold``; rows with zero
    hits are dropped. Returns (id_col, max_cos, n_hits)."""
    schema = T.StructType(
        [
            left.schema[id_col],
            T.StructField("max_cos", T.DoubleType()),
            T.StructField("n_hits", T.LongType()),
        ]
    )
    rm = right_mat.astype(np.float64)
    # same zero-norm guard as the left side: an all-zero benchmark
    # vector must yield cosine 0 everywhere, not a NaN column that
    # poisons sims.max(axis=1) for every emitted row
    rnrm = np.linalg.norm(rm, axis=1, keepdims=True)
    rnrm[rnrm == 0.0] = 1.0
    rm = rm / rnrm
    m = float(10**round_to)

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0
            sims = (mat / nrm) @ rm.T
            sims = np.floor(sims * m + 0.5) / m  # pround, pre-threshold
            hits = sims >= threshold
            n_hits = hits.sum(axis=1)
            keep = n_hits > 0
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    "max_cos": sims.max(axis=1)[keep],
                    "n_hits": n_hits[keep].astype(np.int64),
                }
            )

    return left.select(id_col, vec_col).mapInPandas(compute, schema)
