"""Query family: round-7 extensions.

Additions that exercise Spark surfaces the registry lacked:

- a MANUAL bloom-style prefiltered semi join (the two-phase filter a
  100 TB fact-vs-big-dim join needs when the dim is too large to
  broadcast but its hashed key-bucket SET is not),
- a polymorphic Python UDTF whose output schema is derived at
  plan time by a static ``analyze`` method (Spark 4 API; the existing
  UDTF queries all use a fixed ``returnType``), and
- interval-union coverage — the overlap-merging gaps-and-islands
  idiom (running-max sweep), distinct from the registry's point-streak
  and fixed-gap-session forms, and
- max-min-fair (waterfilling) token-budget allocation across sources
  — the capped-fair-share mixing rule, vs mixture_sampling_quota's
  proportional split.
"""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    dec_sum,
    query,
    read_table,
)

_BLOOM_BAL = 9000.0
# Bucket-set sizing (r07 verdict #1: a fixed 4096 saturates at the
# operator's own target regime and the prefilter degrades to pass-all
# overhead). Sized like a real Bloom filter instead: m ≈ 12x the
# QUALIFYING key count (memoized per fixture, one bounded dim count —
# the same real-cardinality-over-planner-estimate discipline as the
# graph family's count-driven join strategy), rounded up to a power
# of two. Floor 4096 keeps the sf0.01/0.1 plan byte-identical to the
# r7 record; past _BLOOM_MAX_BUCKETS the broadcast row set itself is
# the bottleneck (a bucket SET costs one row per occupied bucket,
# unlike a bitset's m BITS) and the right tool is Spark's
# optimizer-injected bitset bloom filter
# (spark.sql.optimizer.runtime.bloomFilter, plan-pinned in
# tests/test_plans.py::test_runtime_bloom_filter_injected;
# bloom_filter_agg/might_contain are NOT user-callable in PySpark 4 —
# probed this round, UNRESOLVED_ROUTINE).
_BLOOM_MIN_BUCKETS = 4096
_BLOOM_MAX_BUCKETS = 1 << 22
_BLOOM_BUCKETS_PER_KEY = 12
_BLOOM_KEY_COUNTS: dict[str, int] = {}


def _bloom_qualifying_count(spark: SparkSession, sf_dir: str) -> int:
    """Memoized count of qualifying dim keys (high-balance customers),
    keyed on the fixture fingerprint so a regenerated fixture at the
    same path re-measures."""
    from etl_pyspark_spark.sources.io import fixture_fingerprint

    key = fixture_fingerprint(sf_dir, "customer")
    n = _BLOOM_KEY_COUNTS.get(key)
    if n is None:
        n = (
            read_table(spark, sf_dir, "customer")
            .where(F.col("c_acctbal") > _BLOOM_BAL)
            .count()
        )
        _BLOOM_KEY_COUNTS[key] = n
    return n


def _bloom_bucket_count(spark: SparkSession, sf_dir: str) -> int:
    """Power-of-two m with ~_BLOOM_BUCKETS_PER_KEY buckets per
    qualifying key, clamped to [min, max] — at 12 buckets/key the
    occupied fraction stays ~= 1 - exp(-1/12) ~= 8%, so the prefilter
    keeps PRUNING (~92% of non-matching fact rows dropped before the
    shuffle) at any dim size below the broadcast ceiling, where the
    old fixed 4096 saturated to pass-all."""
    n = _bloom_qualifying_count(spark, sf_dir)
    m = _BLOOM_MIN_BUCKETS
    while m < n * _BLOOM_BUCKETS_PER_KEY and m < _BLOOM_MAX_BUCKETS:
        m *= 2
    return m


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_acctbal > {_BLOOM_BAL})
    GROUP BY order_month
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style prefiltered semi join: monthly order volume from
    high-balance customers, where the fact side is PREFILTERED by a
    compact hash-bucket set of the dim keys before the exact semi
    join runs.

    Scale story: when the dim side is too large to broadcast (tens of
    millions of qualifying keys), the exact semi join must shuffle the
    FULL fact table. But the dim's ``pmod(xxhash64(key), m)`` bucket
    SET is bounded by m regardless of dim size — broadcast it, drop
    every fact row whose key hashes to an absent bucket (no false
    negatives, bounded false positives, exactly a 1-hash Bloom
    filter), and only the surviving fraction pays the shuffle. The
    exact semi join then removes the false positives, so the result
    is identical to the plain semi join the oracle runs — the
    prefilter is semantically transparent, which is what makes it
    safe to apply mechanically. (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` does this inside AQE
    for some shapes; this operator is the explicit, plan-pinnable
    form.) m is DERIVED from the memoized qualifying-key count
    (``_bloom_bucket_count``), not fixed — a fixed set saturates once
    keys >> m and the prefilter silently degrades to pure overhead.
    Output is calendar-bounded (~84 months)."""
    m = _bloom_bucket_count(spark, sf_dir)
    cust = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > _BLOOM_BAL)
        .select("c_custkey")
    )
    buckets = (
        cust.select(
            F.pmod(F.xxhash64("c_custkey"), F.lit(m)).alias("bkt")
        )
        .distinct()
    )
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "bkt", F.pmod(F.xxhash64("o_custkey"), F.lit(m))
    )
    # phase 1: broadcast bucket-set membership (<= m rows, any dim size)
    prefiltered = orders.join(F.broadcast(buckets), "bkt")
    # phase 2: exact verification semi join on the real key
    exact = prefiltered.join(
        cust,
        prefiltered["o_custkey"] == cust["c_custkey"],
        "left_semi",
    )
    return exact.groupBy(
        F.trunc(F.col("o_orderdate"), "month").alias("order_month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dec_sum(F.col("o_totalprice"), "revenue"),
    )


@query(
    "udtf_analyze_polymorphic",
    # first three whitespace tokens of each document title line;
    # list_filter(string_split) is the engine-wide token convention
    # (text_analysis._WS_TOKENS_SQL) and list[i] is NULL past the end
    # in DuckDB, matching the UDTF's None padding
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents
    )
    SELECT doc_id, ts[1] AS f1, ts[2] AS f2, ts[3] AS f3
    FROM toks
    """,
)
def q_udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF (Spark 4): the output schema is computed at
    PLAN time by a static ``analyze`` method from a constant argument
    — here ``leading_fields(text, 3)`` emits columns f1..f3 — instead
    of a fixed ``returnType`` string (udtf_numbered_tokens' static
    form). This is the API a reusable table function needs when its
    arity depends on the call site (CSV splitters, top-N expanders,
    pivot-like fanouts). Evaluation is Arrow-batched
    (``spark.sql.execution.pythonUDTF.arrow.enabled`` is a session
    default), so the Python boundary is columnar, not per-row
    pickling. One UDTF pass over documents, no shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType

    class LeadingFields:
        @staticmethod
        def analyze(text, n):
            from pyspark.sql.udtf import AnalyzeResult

            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"f{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            toks = [t for t in (text or "").split(" ") if t]
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(int(n))
            )

    spark.udtf.register("leading_fields", udtf(LeadingFields))
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_poly_docs")
    return spark.sql(
        """
        SELECT d.doc_id, f.f1, f.f2, f.f3
        FROM udtf_poly_docs d,
             LATERAL leading_fields(d.text, 3) f
        """
    )


@query(
    "interval_union_coverage",
    oracle="""
    WITH iv AS (
      SELECT o_custkey AS c, o_orderkey AS k,
             date_diff('day', DATE '1970-01-01', o_orderdate) AS s,
             date_diff('day', DATE '1970-01-01', o_orderdate) + 30 AS e
      FROM orders
    ),
    flagged AS (
      SELECT c, k, s, e,
             max(e) OVER (PARTITION BY c ORDER BY s, e, k
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv
    ),
    numbered AS (
      SELECT c, s, e,
             sum(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY c ORDER BY s, e, k) AS island
      FROM flagged
    ),
    islands AS (
      SELECT c, island, max(e) - min(s) AS covered
      FROM numbered GROUP BY c, island
    ),
    per_cust AS (
      SELECT c, count(*) AS n_islands,
             CAST(sum(covered) AS BIGINT) AS covered_days
      FROM islands GROUP BY c
    )
    SELECT n_islands,
           count(*) AS n_customers,
           CAST(sum(covered_days) AS BIGINT) AS covered_days
    FROM per_cust GROUP BY n_islands
    """,
)
def q_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage (merge overlapping ranges): each order
    opens a 30-day activity window per customer; overlapping windows
    merge into islands and the engine reports, per island-count
    bucket, how many customers have that many islands and their total
    covered days. This is the third gaps-and-islands idiom in the
    registry and the only one that handles OVERLAP: streaks
    (longest_daily_streak) use the row_number-difference trick on
    points, sessionization (sessionize_events) uses fixed-gap flags —
    neither works when ranges extend past their successors. The sweep
    is a running max of interval ends per key: a new island starts
    exactly when s exceeds every previous end. Scale shape: ALL
    windows partition by customer (never SinglePartition), the
    per-(key, island) rollup reuses the same partitioning, and the
    final histogram is bounded by max-islands-per-customer (~orders
    per customer). Output is cardinality-bounded at any fixture
    replication."""
    from pyspark.sql import Window

    epoch = F.lit("1970-01-01")
    iv = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.col("o_orderkey").alias("k"),
        F.datediff(F.col("o_orderdate"), epoch).alias("s"),
        (F.datediff(F.col("o_orderdate"), epoch) + 30).alias("e"),
    )
    w = Window.partitionBy("c").orderBy("s", "e", "k")
    flagged = iv.withColumn(
        "prev_max",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    numbered = flagged.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).over(w),
    )
    islands = numbered.groupBy("c", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    per_cust = islands.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("covered").cast("bigint").alias("covered_days"),
    )
    return per_cust.groupBy("n_islands").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("covered_days").cast("bigint").alias("covered_days"),
    )


@query(
    "token_budget_waterfill",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(sum(len(list_filter(string_split(text, ' '),
                                      t -> t <> ''))) AS BIGINT) AS demand
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(demand) AS BIGINT) AS total,
                   count(*) AS n,
                   CAST((19 * CAST(sum(demand) AS BIGINT)) // 20 AS BIGINT)
                     AS budget
            FROM d),
    ranked AS (
      SELECT source, demand,
             row_number() OVER (ORDER BY demand, source) AS k,
             CAST(sum(demand) OVER (ORDER BY demand, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM d
    ),
    flagged AS (
      SELECT r.*, t.n, t.budget,
             r.demand * (t.n - r.k + 1) <= t.budget - (r.cum - r.demand)
               AS fits
      FROM ranked r, tot t
    ),
    kstar AS (
      SELECT COALESCE((SELECT min(k) - 1 FROM flagged WHERE NOT fits),
                      (SELECT n FROM tot)) AS ks
    ),
    base AS (
      SELECT f.*, kk.ks,
             CASE WHEN f.k <= kk.ks THEN NULL
                  ELSE f.budget
                       - COALESCE((SELECT max(cum) FROM flagged
                                   WHERE k <= kk.ks), 0)
             END AS rem
      FROM flagged f, kstar kk
    )
    SELECT source, demand,
           CAST(CASE WHEN k <= ks THEN demand
                ELSE rem // (n - ks)
                     + CASE WHEN k - ks <= rem % (n - ks)
                            THEN 1 ELSE 0 END
           END AS BIGINT) AS alloc,
           k <= ks AS fully_satisfied
    FROM base
    """,
)
def q_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min-fair (waterfilling) token-budget allocation across
    sources: a 95%-of-demand training budget is split so every source
    gets min(demand, waterline) — small sources keep everything,
    over-represented sources are capped at the fair level, and the
    integer remainder is distributed deterministically (smallest
    demand first). This is the allocation a balanced pre-training mix
    uses when proportional quotas (mixture_sampling_quota) would let
    the biggest crawl drown the small curated sets. All arithmetic is
    integer-exact (token counts, DIV/MOD), so both engines agree
    bit-for-bit. Scale shape: the fact-scale work is ONE map-side
    combinable per-source token-count aggregation; the waterline
    search runs on the |sources|-row table (bounded catalog
    dimension), where an unpartitioned window is safe by
    construction (allowlisted in tests/test_window_allowlist)."""
    from pyspark.sql import Window

    from etl_pyspark_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents").select(
        "source", F.size(ws_tokens(F.col("text"))).alias("n_tokens")
    )
    d = docs.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("demand")
    )
    tot = d.agg(
        F.sum("demand").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "total", "n", F.expr("(19 * total) DIV 20").alias("budget")
    )
    w = Window.orderBy("demand", "source")
    ranked = d.select(
        "source",
        "demand",
        F.row_number().over(w).alias("k"),
        F.sum("demand")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    flagged = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "fits",
        F.col("demand") * (F.col("n") - F.col("k") + 1)
        <= F.col("budget") - (F.col("cum") - F.col("demand")),
    )
    ks = flagged.agg(
        F.coalesce(
            F.min(F.when(~F.col("fits"), F.col("k"))) - 1,
            F.max("n"),
        ).alias("ks")
    )
    sstar = flagged.crossJoin(F.broadcast(ks)).agg(
        F.coalesce(
            F.max(F.when(F.col("k") <= F.col("ks"), F.col("cum"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sstar")
    )
    base = (
        flagged.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(sstar))
        .withColumn("rem", F.col("budget") - F.col("sstar"))
    )
    return base.select(
        "source",
        "demand",
        F.when(F.col("k") <= F.col("ks"), F.col("demand"))
        .otherwise(
            F.expr("rem DIV (n - ks)")
            + F.when(
                (F.col("k") - F.col("ks"))
                <= F.expr("rem % (n - ks)"),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc"),
        (F.col("k") <= F.col("ks")).alias("fully_satisfied"),
    )
