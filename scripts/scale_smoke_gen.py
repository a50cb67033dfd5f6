#!/usr/bin/env python3
"""Generate a 10x-of-bench-scale fixture set for the empirical scale smoke.

Replicates the sf0.1 tables REP times under ``.scratch/sf1.0smoke/`` with
key shifts chosen so the data GROWS the way a real corpus grows instead of
becoming one giant duplicate group:

- fact keys are remapped ``key' = key*REP + r`` so every replica is a
  disjoint key range with consistent intra-replica foreign keys
  (orders<->lineitem on orderkey, orders->customer on custkey);
- document text gets a per-replica word suffix (replica 0 is the original
  corpus verbatim), so the driver-seeded near-duplicate structure is
  preserved WITHIN each replica (dup pairs scale ~linearly, ~REP x) but
  replicas are not near-duplicates of each other — a 10x corpus with the
  same duplicate RATE, which is the honest scaling for the dedup family;
- customer names get the same per-replica suffix so entity-resolution
  blocks scale in count, not in block size;
- events get disjoint user_id ranges per replica (user COUNT grows 10x,
  per-user history stays constant — the realistic direction for
  user-keyed state);
- dimension tables (region/nation/part/supplier) are copied verbatim:
  dims grow far slower than facts at real scale, and keeping them fixed
  preserves every broadcast-join decision the plans were pinned on.

Deterministic (no RNG, no clock); writing twice produces identical data.
Run solo: ``python scripts/scale_smoke_gen.py`` (~1 min), then
``SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1.0smoke SPARK_GRAFT_BENCH_ONLY=...
python bench.py`` for the smoke itself (see BASELINE.md round-5 records).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from etl_pyspark_spark.session import get_session  # noqa: E402
from etl_pyspark_spark.sources.io import read_table  # noqa: E402

REP = 10
SRC = os.environ.get("SPARK_GRAFT_SMOKE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_SMOKE_DST",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "sf1.0smoke",
    ),
)


def _with_rep(df):
    """Cross the table with the replica spine (broadcast, no shuffle)."""
    reps = F.broadcast(
        df.sparkSession.range(REP).select(F.col("id").alias("_r"))
    )
    return df.crossJoin(reps)


def _suffix_words(col: str):
    """Per-replica word suffix; replica 0 keeps the original text."""
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col(col), " "),
            lambda w: F.concat(w, F.lit("x"), F.col("_r").cast("string")),
        ),
    )
    return F.when(F.col("_r") == 0, F.col(col)).otherwise(tagged)


def main() -> None:
    spark = get_session(
        app_name="scale-smoke-gen",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def shift(col: str):
        return (F.col(col) * REP + F.col("_r")).alias(col)

    out = {}
    o = _with_rep(read_table(spark, SRC, "orders"))
    out["orders"] = o.select(
        shift("o_orderkey"),
        shift("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    li = _with_rep(read_table(spark, SRC, "lineitem"))
    out["lineitem"] = li.select(
        shift("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    d = _with_rep(read_table(spark, SRC, "documents"))
    out["documents"] = d.select(
        shift("doc_id"),
        _suffix_words("text").alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    c = _with_rep(read_table(spark, SRC, "customer"))
    out["customer"] = c.select(
        shift("c_custkey"),
        F.when(F.col("_r") == 0, F.col("c_name"))
        .otherwise(
            F.concat(F.col("c_name"), F.lit(" x"), F.col("_r").cast("string"))
        )
        .alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    ev = _with_rep(read_table(spark, SRC, "events"))
    out["events"] = ev.select(
        shift("event_id"),
        "ts",
        shift("user_id"),
        "event_type",
        "value",
        "props",
    )
    emb = _with_rep(read_table(spark, SRC, "embeddings"))
    out["embeddings"] = emb.select(
        shift("vec_id"),
        # nudge one coordinate per replica so replicas are near but not
        # identical in embedding space (identical vectors would make
        # cosine ties nondeterministic to rank)
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x + F.col("_r") * F.lit(0.001))
            .otherwise(x)
            .cast("float"),
        ).alias("embedding"),
        "label",
    )
    for t in ("region", "nation", "part", "supplier"):
        out[t] = read_table(spark, SRC, t)

    for t, df in out.items():
        # single file per table, matching the fixture layout contract
        # (read_table globs <dir>/<t>.parquet); parallelism at read time
        # comes from maxPartitionBytes row-group splitting, as it does
        # for the driver fixtures themselves
        tmp = os.path.join(DST, f"_tmp_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        final = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(final):
            os.remove(final)
        os.rename(os.path.join(tmp, part), final)
        import shutil

        shutil.rmtree(tmp)
        print(t, "rows:", spark.read.parquet(final).count(), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
