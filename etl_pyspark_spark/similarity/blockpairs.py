"""Exact all-pairs cosine via block-partitioned BLAS.

The naive exact all-pairs plan (cross join + per-pair ``zip_with``
dot) costs ~10 us/pair in expression evaluation — 12.5 M pairs took
~2 min at sf0.1 and is hopeless beyond that. This module implements
the standard distributed block algorithm instead:

1. assign each vector to one of ``B`` deterministic blocks
   (``vec_id % B``);
2. materialize the ``B*(B+1)/2`` unordered block pairs;
3. replicate each block to every pair it participates in (union of a
   'L'-role and 'R'-role join — each vector is copied ~B+1 times);
4. ``applyInPandas`` per block pair: one float64 GEMM
   (``X_L @ X_R.T``) plus norm division gives every cosine in the
   pair's rectangle; filter ``id_a < id_b`` and the threshold.

Per-executor memory is two blocks of vectors (tunable via ``B``), the
shuffle moves each vector ~B+1 times, and the O(n^2) flops run in
BLAS instead of Catalyst expression eval (~100x). This is the exact-
result complement to the LSH candidate path (similarity/lsh.py) —
use LSH when approximate recall is acceptable, blocks when the answer
must be exact.

Numerics: vectors are cast float32->float64 before the GEMM; BLAS
accumulates in a different order than the oracle's left-to-right
``list_sum``, so results can differ in the last ulp — the registry
rounds through ``pround(6)`` on both sides, which absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)


#: target rows per block — keeps each task's sims matrix (~rows^2 x 8 B,
#: 4096^2*8 = 134 MB) well inside executor memory while amortizing task
#: overhead. num_blocks grows with corpus size: n=4k -> 1 block pair,
#: n=1M -> ~245 blocks / ~30k pairs, each a bounded-memory GEMM.
_BLOCK_ROWS = 4096


def block_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    num_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold, exactly.

    ``num_blocks=None`` sizes blocks two ways and takes the max:
    (a) corpus count / _BLOCK_ROWS, so per-task GEMM memory is
    constant at any scale; (b) a parallelism floor — enough blocks
    that the ~num_blocks^2/2 block pairs fill the cluster's task
    slots (without it, a corpus that fits 2 blocks runs 3 tasks on 32
    cores and the exact-dedup pass serializes). The result is
    block-count invariant.

    ``cluster_col`` scopes the pair space: only pairs WITHIN the same
    cluster value are generated (the SemDeDup shape — candidate cost
    drops from O(n^2) to Σ|cluster|^2), by keying the GEMM groups on
    (cluster, block pair). Per-task memory stays two blocks of one
    cluster."""
    if num_blocks is None:
        import math

        n = emb.count()
        size_blocks = -(-n // _BLOCK_ROWS)
        p = emb.sparkSession.sparkContext.defaultParallelism
        par_blocks = math.ceil((math.sqrt(8 * p + 1) - 1) / 2)
        num_blocks = max(1, size_blocks, par_blocks)
    spark = emb.sparkSession
    # "cl" is a pure grouping key (never emitted), so hash the cluster
    # column instead of casting: a cast would turn non-numeric cluster
    # labels (e.g. strings) into NULL, silently collapsing every
    # cluster into one group and reverting candidate cost to O(n^2)
    # (advice r04). xxhash64 accepts any type; distinct labels stay
    # distinct (NULL labels form their own single group, as before).
    cluster_expr = (
        F.xxhash64(F.col(cluster_col))
        if cluster_col is not None
        else F.lit(0).cast("bigint")
    )
    blocked = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        (F.col(id_col) % num_blocks).cast("int").alias("blk"),
        cluster_expr.alias("cl"),
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(num_blocks) if i <= j],
        "bi int, bj int",
    ).withColumn("pair_id", F.col("bi") * num_blocks + F.col("bj"))

    left = blocked.join(
        F.broadcast(pairs), blocked.blk == pairs.bi
    ).select(
        "cl", "pair_id", F.lit("L").alias("role"), "vid", "vec", "bi", "bj"
    )
    right = blocked.join(
        F.broadcast(pairs), blocked.blk == pairs.bj
    ).select(
        "cl", "pair_id", F.lit("R").alias("role"), "vid", "vec", "bi", "bj"
    )
    both = left.unionByName(right)

    def gemm(pdf):
        import numpy as np
        import pandas as pd

        same_block = pdf["bi"].iat[0] == pdf["bj"].iat[0]
        # same-block pairs arrive with every vector in both roles;
        # halve to one copy and use the i<j triangle directly
        lpdf = pdf[pdf["role"] == "L"]
        rpdf = lpdf if same_block else pdf[pdf["role"] == "R"]
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        lx = np.stack(lpdf["vec"].values).astype("float64")
        rx = np.stack(rpdf["vec"].values).astype("float64")
        lids = lpdf["vid"].values
        rids = rpdf["vid"].values
        ln = np.sqrt((lx * lx).sum(axis=1))
        rn = np.sqrt((rx * rx).sum(axis=1))
        sims = (lx @ rx.T) / np.outer(ln, rn)
        sims = np.floor(sims * 1e6 + 0.5) / 1e6  # pround twin
        ia, ib = np.nonzero(sims >= threshold)
        la, rb = lids[ia], rids[ib]
        if same_block:
            # triangle: each unordered pair appears twice in the
            # square; keep the (low, high) orientation once
            keep = la < rb
            id_a, id_b, sim = la[keep], rb[keep], sims[ia, ib][keep]
        else:
            # rectangle: each cross-block pair appears exactly once;
            # normalize orientation, drop nothing
            id_a = np.minimum(la, rb)
            id_b = np.maximum(la, rb)
            sim = sims[ia, ib]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos_sim": sim})

    return both.groupBy("cl", "pair_id").applyInPandas(
        gemm, schema=_PAIR_SCHEMA
    )
