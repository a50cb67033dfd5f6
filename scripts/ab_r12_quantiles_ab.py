#!/usr/bin/env python3
"""Interleaved A/B for the r12 exact_discrete_quantiles fusion:
alternate the OLD 4-full-pass implementation (head sketch, below-count
scan, cumsum-stats scan, totals scan) with the NEW 2-full-pass one
(head sketch + one tagged-aggregate checkpoint that also carries the
below counts) inside ONE session, per rep. Queries from argv
(default: the five quantile consumers). Host load hits both arms of a
pair equally, so pairwise wins are meaningful where sequential solo
runs are not."""
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from etl_pyspark_spark.operators import quantiles as Q
from etl_pyspark_spark.operators.ranks import with_global_cumsum
from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.session import get_session

NEW_IMPL = Q.exact_discrete_quantiles


def _old_rank_search_all(spark, vals, brackets, belows, ranks, n_part=None):
    """Verbatim pre-r12 implementation (git HEAD at round-12 start)."""
    probe_filters = []
    for i, (a, b) in enumerate(brackets):
        cond = (
            F.lit(True)
            if a is None
            else (F.col("_v") >= a) & (F.col("_v") <= b)
        )
        probe_filters.append(F.when(cond, F.lit(i)).otherwise(F.lit(None)))
    tagged = (
        vals.select(
            "_v",
            F.explode(F.array_compact(F.array(*probe_filters))).alias(
                "_probe"
            ),
        )
        .groupBy("_probe", "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    cum = with_global_cumsum(
        tagged, ["_probe", "_v"], "_cnt", "_cum", num_partitions=n_part
    )
    totals = {
        int(r["_probe"]): int(r["_t"])
        for r in tagged.groupBy("_probe")
        .agg(F.sum("_cnt").alias("_t"))
        .collect()
    }
    bases, acc = {}, 0
    for i in sorted(totals):
        bases[i] = acc
        acc += totals[i]
    params = spark.createDataFrame(
        [
            (i, bases.get(i, 0), belows[i], ranks[i])
            for i in range(len(brackets))
        ],
        "_probe int, _base bigint, _below bigint, _rank bigint",
    )
    hits = {
        int(r["_probe"]): r["v"]
        for r in cum.join(F.broadcast(params), "_probe")
        .where(
            F.col("_cum") - F.col("_base") + F.col("_below")
            >= F.col("_rank")
        )
        .groupBy("_probe")
        .agg(F.min("_v").alias("v"))
        .collect()
    }
    return [hits.get(i) for i in range(len(brackets))]


def old_exact_discrete_quantiles(df, col, probs, accuracy=Q.DEFAULT_ACCURACY):
    eps = 3.0 / accuracy
    vals = df.where(F.col(col).isNotNull()).select(F.col(col).alias("_v"))
    lo_p = [max(0.0, q - eps) for q in probs]
    hi_p = [min(1.0, q + eps) for q in probs]
    head = vals.agg(
        F.count("_v").alias("n"),
        F.percentile_approx("_v", lo_p + hi_p, accuracy).alias("lohi"),
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        return [None for _ in probs]
    k = len(probs)
    brackets = list(zip(head["lohi"][:k], head["lohi"][k:]))
    below_row = vals.agg(
        *[
            F.count(F.when(F.col("_v") < F.lit(a), 1)).alias(f"b{i}")
            for i, (a, _) in enumerate(brackets)
        ]
    ).collect()[0]
    ranks = [max(1, math.ceil(q * n)) for q in probs]
    belows = [int(below_row[f"b{i}"]) for i in range(len(probs))]
    est_rows = max(1, (6 * len(probs) * n) // accuracy)
    spark = vals.sparkSession
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_part = max(1, min(cap, -(-est_rows // 65536)))
    cuts = _old_rank_search_all(spark, vals, brackets, belows, ranks, n_part)
    out = []
    for i, cut in enumerate(cuts):
        if cut is None:  # pragma: no cover
            cut = _old_rank_search_all(
                vals.sparkSession, vals, [(None, None)], [0], [ranks[i]], None
            )[0]
        out.append(cut)
    return out


spark = get_session(
    app_name="quantiles-ab",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")


def run(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


names = sys.argv[1:] or [
    "value_quantiles_exact",
    "robust_zscore_outliers",
    "winsorize_values",
    "funnel_step_latency",
    "value_histogram_equidepth",
]
for qname in names:
    for impl in (old_exact_discrete_quantiles, NEW_IMPL):  # warm both
        Q.exact_discrete_quantiles = impl
        run(qname)
    rows = []
    for rep in range(REPS):
        for arm, impl in (
            ("old", old_exact_discrete_quantiles),
            ("new", NEW_IMPL),
        ):
            Q.exact_discrete_quantiles = impl
            sec = run(qname)
            rows.append((arm, sec))
            print(f"{qname} rep={rep} arm={arm} {sec:.3f}s", flush=True)
    olds = sorted(s for a, s in rows if a == "old")
    news = sorted(s for a, s in rows if a == "new")
    wins = sum(
        1
        for (a1, s1), (a2, s2) in zip(rows[::2], rows[1::2])
        if s2 < s1
    )
    print(
        f"MEDIAN {qname}: old {olds[len(olds) // 2]:.3f}s"
        f" -> new {news[len(news) // 2]:.3f}s ({wins}/{REPS} pairs in favor)"
    )
Q.exact_discrete_quantiles = NEW_IMPL
spark.stop()
