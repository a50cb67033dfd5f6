"""Query family: round-8 extensions.

Capabilities the registry genuinely lacked, each a first-class
LLM-data-pipeline operator (reference has none of these surfaces —
SURVEY.md §2.9 growth plan):

- **late-interaction (MaxSim) retrieval** — ColBERT-style scoring
  where a document is a BAG of token vectors and score(q, d) =
  sum over query tokens of the max dot against any document token.
  Distinct from every existing similarity query (all single-vector);
  the multi-vector layout is derived deterministically from the
  fixture embeddings (64-dim -> 8 token slices of 8 dims).
- **sorted-neighborhood ER blocking** — the classic alternative
  candidate generator to hash blocking (operators/blocking.py): sort
  within a block, pair each record with its w nearest predecessors.
  Candidate count is O(n*w) by construction, vs hash blocking's
  O(sum block^2) — the method of choice when block keys are noisy.
- **semantic benchmark decontamination** — embedding-cosine fuzzy
  contamination flagging (benchmark_decontaminate is exact-text; this
  catches paraphrased leakage), shaped as broadcast-test x scan-train.
- **weighted reservoir sampling** (Efraimidis-Spirakis A-Res) —
  deterministic weight-proportional sampling WITHOUT replacement via
  ln(u)/w keys; the registry's samplers are all unweighted or
  per-stratum.
- **FULL OUTER stream-stream join** — both unmatched sides emit under
  watermark eviction, with asymmetric flush horizons (see
  streaming/joins.click_purchase_full_outer).
"""

from __future__ import annotations

from pyspark.sql import Window

from etl_pyspark_spark.functions.compat import pround, sql_pround
from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    query,
    read_table,
)

# --- late-interaction MaxSim ------------------------------------------

_MAXSIM_EXPR = """
cast(aggregate(sequence(0, 7), cast(0 as decimal(28,12)),
  (acc, qi) -> cast(acc + cast(array_max(transform(sequence(0, 7),
      ti -> aggregate(sequence(1, 8), 0D,
            (a, d) -> a + element_at(qv, qi*8+d) * element_at(vv, ti*8+d))))
    as decimal(28,12)) as decimal(28,12))) as double)
"""

_MAXSIM_ORACLE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv
      FROM embeddings WHERE vec_id > 0),
dots AS (
  SELECT c.vec_id, g.qi, t.ti,
         list_sum(list_transform(generate_series(1, 8),
                  d -> qv[g.qi*8+d] * vv[t.ti*8+d])) AS dp
  FROM c, q, generate_series(0, 7) g(qi), generate_series(0, 7) t(ti)),
mx AS (SELECT vec_id, qi, max(dp) AS mx FROM dots GROUP BY vec_id, qi)
SELECT vec_id, CAST(sum(CAST(mx AS DECIMAL(28,12))) AS DOUBLE) AS maxsim
FROM mx GROUP BY vec_id ORDER BY maxsim DESC, vec_id LIMIT 10
"""


@query("similarity_maxsim_late_interaction", oracle=_MAXSIM_ORACLE)
def q_similarity_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction top-k: each embedding is read as
    8 token vectors of 8 dims (deterministic slices), the query is
    vec_id 0's token bag, and MaxSim(q, d) = sum over the 8 query
    slices of the max dot against d's 8 slices.

    Plan: ONE expression per corpus row (8x8 slice dots inside
    whole-stage codegen — no explode, no shuffle), a 1-row broadcast
    for the query bag, and TakeOrderedAndProject for the top-10 — the
    same scan-side scoring shape a 100 TB multi-vector index probe
    needs. Cross-engine determinism: inner dots are fixed-order folds,
    the 8 per-token maxima are cast to DECIMAL(28,12) before the outer
    sum so both engines' sums are exact and order-free."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vv")
    )
    qrow = v.where(F.col("vec_id") == 0).select(F.col("vv").alias("qv"))
    return (
        v.where(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(qrow))
        .select("vec_id", F.expr(_MAXSIM_EXPR).alias("maxsim"))
        .orderBy(F.col("maxsim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# --- sorted-neighborhood ER blocking ----------------------------------

_SN_WINDOW = 3
_SN_BAL_EPS = 50.0


def _sn_oracle() -> str:
    branches = []
    for k in range(1, _SN_WINDOW + 1):
        branches.append(
            f"""
    SELECT c_mktsegment, c_nationkey, id{k} AS id_a, c_custkey AS id_b,
           {sql_pround(f'abs(c_acctbal - b{k})', 2)} AS bal_diff
    FROM b WHERE id{k} IS NOT NULL AND abs(c_acctbal - b{k}) < {_SN_BAL_EPS}"""
        )
    lags = ", ".join(
        f"lag(c_custkey, {k}) OVER w AS id{k}, "
        f"lag(c_acctbal, {k}) OVER w AS b{k}"
        for k in range(1, _SN_WINDOW + 1)
    )
    return f"""
    WITH b AS (
      SELECT c_mktsegment, c_nationkey, c_custkey, c_acctbal, {lags}
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey
                   ORDER BY c_acctbal, c_name))
    {' UNION ALL '.join(branches)}
    """


@query("er_sorted_neighborhood", oracle=_sn_oracle())
def q_er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution candidates: within each
    (segment, nation) block, records sort by (balance, name) and each
    record pairs with its 3 predecessors; pairs closer than 50.0 in
    balance are match candidates.

    Candidate cost is O(n*w) regardless of how skewed the block sizes
    are — the property hash blocking needs MAX_BLOCK caps to fake
    (operators/blocking.py:46). The sort itself partitions by block
    (a hash shuffle, never a global single-partition sort); the window
    function evaluates per block. Total order inside a block is
    deterministic (name is unique), so the pair set is exact on both
    engines."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment", "c_nationkey").orderBy(
        "c_acctbal", "c_name"
    )
    # window exprs materialize in their own select: Spark refuses a
    # window function nested under a generator's downstream filter
    lagged = c.select(
        "c_mktsegment",
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        *[
            F.struct(
                F.lag("c_custkey", k).over(w).alias("id"),
                F.lag("c_acctbal", k).over(w).alias("bal"),
            ).alias(f"n{k}")
            for k in range(1, _SN_WINDOW + 1)
        ],
    )
    neighbors = F.array(*[f"n{k}" for k in range(1, _SN_WINDOW + 1)])
    return (
        lagged.select(
            "c_mktsegment",
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.explode(neighbors).alias("pr"),
        )
        .where(
            F.col("pr.id").isNotNull()
            & (F.abs(F.col("c_acctbal") - F.col("pr.bal")) < _SN_BAL_EPS)
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            F.col("pr.id").alias("id_a"),
            F.col("c_custkey").alias("id_b"),
            pround(F.abs(F.col("c_acctbal") - F.col("pr.bal")), 2).alias(
                "bal_diff"
            ),
        )
    )


# --- semantic benchmark decontamination -------------------------------

_DECON_MOD = 20  # vec_id % 20 == 0 -> "benchmark" split (5%)
# absolute ceiling on the benchmark rows collected to the driver:
# real benchmarks are 1e3-1e5 rows; 2^18 keeps the 100x-grow scale
# fixture (~100k bench rows) reproducible while bounding the collect
# at ~128 MiB of float64 at dim 64 regardless of corpus size
_DECON_MAX_BENCH = 262_144
_DECON_TAU = 0.25  # fixture-calibrated (near-random embeddings);
# a production run against real near-dup leakage uses ~0.9


def _decon_oracle() -> str:
    from etl_pyspark_spark.similarity.cosine import sql_cosine

    cos = sql_pround(sql_cosine("t.embedding", "b.embedding"), 6)
    return f"""
    SELECT t.vec_id, max({cos}) AS max_cos, count(*) AS n_hits
    FROM (SELECT * FROM embeddings WHERE vec_id % {_DECON_MOD} <> 0) t
    JOIN (SELECT * FROM embeddings WHERE vec_id % {_DECON_MOD} = 0) b
      ON {cos} >= {_DECON_TAU}
    GROUP BY t.vec_id
    """


@query("decontaminate_semantic", oracle=_decon_oracle())
def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every training
    vector whose cosine to ANY benchmark vector reaches the threshold
    (benchmark split = vec_id % 20 == 0, deterministic 5%). The fuzzy
    twin of benchmark_decontaminate (exact text probe) — this is the
    pass that catches paraphrased/translated leakage.

    Plan shape is the 100 TB-correct one: the benchmark side is SMALL
    by construction (real benchmarks are ~1e3-1e5 rows), so it
    collects once (bounded: |benchmark| x 64 floats) and rides into an
    Arrow-batched GEMM over the training scan — the corpus never
    shuffles, and per-batch work is one BLAS matmul
    (similarity/bipartite.py). Exact, not ANN: recall gaps are the one
    thing a decontamination pass must not have.

    The collect is HARD-capped at ``_DECON_MAX_BENCH`` rows (the
    absolute-bound discipline of blocking.MAX_BLOCK): the fixture's
    mod-20 split is corpus-proportional, and without the cap a 100 TB
    embedding table would silently scale the "benchmark" into driver
    memory. Exceeding the cap raises rather than truncates — a
    truncated benchmark would silently under-decontaminate."""
    import numpy as np

    from etl_pyspark_spark.similarity.bipartite import bipartite_max_cosine

    emb = read_table(spark, sf_dir, "embeddings")
    bench = (
        emb.where(F.col("vec_id") % _DECON_MOD == 0)
        .select("vec_id", "embedding")
        .limit(_DECON_MAX_BENCH + 1)
        .collect()
    )
    if len(bench) > _DECON_MAX_BENCH:
        raise ValueError(
            f"decontaminate_semantic: benchmark split exceeds the "
            f"{_DECON_MAX_BENCH}-row driver-collect cap; a benchmark "
            "this large must be broadcast from storage, not collected"
        )
    ids = np.array([r["vec_id"] for r in bench])
    mat = np.array([r["embedding"] for r in bench])
    train = emb.where(F.col("vec_id") % _DECON_MOD != 0)
    return bipartite_max_cosine(train, ids, mat, _DECON_TAU)


# --- weighted reservoir sampling (Efraimidis-Spirakis) ----------------

_WRS_K = 100
_TWO53 = 9007199254740992  # 2^53: largest power of two with every
# smaller positive integer exactly representable as a double, so
# (h % 2^53 + 1) / 2^53 is the same double in Spark and DuckDB

_WRS_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DOUBLE) AS weight
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         floor((ln((('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                                 CAST(l_linenumber AS VARCHAR)), 1, 15))
             ::BIGINT % {_TWO53} + 1) / {_TWO53}.0)
           / l_extendedprice) * 1e12 + 0.5) / 1e12 AS score
  FROM lineitem)
ORDER BY score DESC, l_orderkey, l_linenumber LIMIT {_WRS_K}
"""


@query("sample_weighted_reservoir", oracle=_WRS_ORACLE)
def q_sample_weighted_reservoir(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement, deterministic:
    Efraimidis-Spirakis A-Res keys. Each row draws u in (0,1] from the
    portable 60-bit md5 hash of its key and scores ln(u)/w (monotone
    in u^(1/w)); the global top-k by score is exactly a weighted
    reservoir sample — here weight = extended price, so expensive line
    items are proportionally more likely.

    One pass, no shuffle: TakeOrderedAndProject keeps k rows per
    partition then merges k at the driver — the same single-scan shape
    at any corpus size, and re-running on any partitioning returns the
    identical sample (df.sample() can't do weighted-without-
    replacement at all; RAND-keyed reservoirs aren't reproducible)."""
    from etl_pyspark_spark.functions.text import portable_hash60

    li = read_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "_",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    u01 = (
        (F.pmod(portable_hash60(key), F.lit(_TWO53)) + 1).cast("double")
        / F.lit(float(_TWO53))
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("weight"),
            # pround(12) BEFORE the order-by: Java Math.log and
            # DuckDB's libm are each allowed 1 ulp, so an unrounded
            # boundary score could admit different rows per engine
            # (house rule: round order/threshold-sensitive doubles)
            pround(F.log(u01) / F.col("l_extendedprice"), 12).alias("score"),
        )
        .orderBy(
            F.col("score").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(_WRS_K)
        .drop("score")
    )


# --- FULL OUTER stream-stream join ------------------------------------


@query(
    "stream_stream_full_outer",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase'),
    -- global watermark = MIN of the two per-stream watermarks (each
    -- stream tracks its own max event time, ms-floored); with only one
    -- outer side (left outer) the all-events max happens to agree, but
    -- full outer exposes the min rule on both branches
    mx AS (SELECT least((SELECT date_trunc('milliseconds', max(c_ts)) FROM c),
                        (SELECT date_trunc('milliseconds', max(p_ts)) FROM p))
                  AS m),
    matched AS (
      SELECT c.click_id, c.user_id, p.purchase_id,
             (epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 1000000 AS delay_s
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.p_ts >= c.c_ts
        AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE),
    unmatched_c AS (
      SELECT c.click_id, c.user_id,
             CAST(NULL AS BIGINT) AS purchase_id,
             CAST(NULL AS BIGINT) AS delay_s
      FROM c, mx
      WHERE NOT EXISTS (
              SELECT 1 FROM p
              WHERE p.user_id = c.user_id
                AND p.p_ts >= c.c_ts
                AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE)
        AND c.c_ts + INTERVAL 30 MINUTE < mx.m - INTERVAL 1 HOUR),
    unmatched_p AS (
      SELECT CAST(NULL AS BIGINT) AS click_id, p.user_id, p.purchase_id,
             CAST(NULL AS BIGINT) AS delay_s
      FROM p, mx
      WHERE NOT EXISTS (
              SELECT 1 FROM c
              WHERE c.user_id = p.user_id
                AND p.p_ts >= c.c_ts
                AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE)
        AND p.p_ts < mx.m - INTERVAL 1 HOUR)
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_c
    UNION ALL SELECT * FROM unmatched_p
    """,
)
def q_stream_stream_full_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL OUTER stream-stream join (click <-> purchase). The oracle
    mirrors the engine's asymmetric eviction horizons: an unmatched
    click's null row needs the final watermark past ``c_ts + window``,
    an unmatched purchase's only past ``p_ts`` (matching clicks have
    ``c_ts <= p_ts``, so nothing can still arrive once the watermark
    clears it). See streaming/joins.click_purchase_full_outer."""
    from etl_pyspark_spark.streaming.joins import click_purchase_full_outer

    return click_purchase_full_outer(spark, sf_dir)
