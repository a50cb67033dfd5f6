"""Cross-implementation consistency on generated data.

The registry pins both as-of join implementations to ONE DuckDB oracle
on the fixture tables; this file additionally runs them against each
other on a generated dataset with a different shape — unmatched keys,
left/right timestamp collisions, dense per-key histories — so a
semantics drift that happens to be invisible on the fixtures still
fails."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_impls_agree_on_generated_data(spark):
    from etl_pyspark_spark.operators.joins import asof_join, asof_join_cogroup

    # left: 800 rows over 50 keys; keys 40-49 have NO right-side rows.
    # lts is hash-scattered so many rows tie exactly with an rts value
    # (exercising the <= boundary).
    left = spark.range(0, 800).select(
        F.col("id").alias("lid"),
        (F.col("id") % 50).alias("k"),
        F.pmod(F.hash(F.col("id")), F.lit(300)).cast("long").alias("lts"),
    )
    # right: 300 rows over keys 0-39, rts unique per key (no right-side
    # ties — at equal (key, ts) the winning right row would be
    # implementation-defined in both engines)
    right = spark.range(0, 300).select(
        (F.col("id") % 40).alias("k"),
        F.col("id").cast("long").alias("rts"),
        (F.col("id") * 3 + 1).alias("payload"),
    )
    a = asof_join(left, right, "k", "lts", "rts", ["rts", "payload"])
    b = asof_join_cogroup(left, right, "k", "lts", "rts", ["rts", "payload"])
    assert a.count() == 800 and b.count() == 800
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # sanity: unmatched keys surface as nulls, matched ones obey <=
    nulls = a.where(F.col("k") >= 40)
    assert nulls.count() == nulls.where(F.col("asof_payload").isNull()).count()
    assert a.where(F.col("asof_rts") > F.col("lts")).count() == 0


def test_asof_duplicate_right_ts_is_deterministic(spark):
    """When the right side carries DUPLICATE (key, ts) rows the carried
    match must be layout-independent: the window's trailing _rrow
    tiebreak pins the greatest (backward) / least (forward) right-row
    struct, so rerunning under a different physical partitioning keeps
    the same answer."""
    from etl_pyspark_spark.operators.joins import asof_join

    left = spark.range(0, 100).select(
        F.col("id").alias("lid"),
        (F.col("id") % 5).alias("k"),
        (F.col("id") % 20).cast("long").alias("lts"),
    )
    # right: every (k, rts) appears 3 times with different payloads
    right = spark.range(0, 5 * 10 * 3).select(
        (F.col("id") % 5).alias("k"),
        ((F.col("id") / 15).cast("long") * 2).alias("rts"),
        F.pmod(F.hash("id"), F.lit(1000)).alias("payload"),
    )
    for direction in ("backward", "forward"):
        a = {
            r["lid"]: r["asof_payload"]
            for r in asof_join(
                left, right, "k", "lts", "rts", ["payload"],
                direction=direction,
            ).collect()
        }
        b = {
            r["lid"]: r["asof_payload"]
            for r in asof_join(
                left.repartition(7, "lid"),
                right.repartition(11, "payload"),
                "k", "lts", "rts", ["payload"],
                direction=direction,
            ).collect()
        }
        assert a == b, direction


def test_minhash_recall_against_exact_jaccard(spark, oracle_sf_dir):
    """Two independent near-dup implementations checked against each
    other on the corpus: MinHash-LSH verified pairs must be a SUBSET
    of the exact inverted-index Jaccard pairs (verification makes
    precision exact; LSH only costs recall), and the 8x2-band layout
    must keep recall high at the 0.5 threshold (catch probability
    1-(1-j^2)^8 >= 0.90 at j=0.5)."""
    from etl_pyspark_spark.dedup.minhash import verified_near_duplicates
    from etl_pyspark_spark.dedup.ngram import ngram_jaccard_pairs
    from etl_pyspark_spark.sources.io import read_table

    docs = read_table(spark, oracle_sf_dir, "documents")
    lsh = {
        (r.doc_id_a, r.doc_id_b)
        for r in verified_near_duplicates(docs, threshold=0.5).collect()
    }
    exact = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert lsh <= exact  # exact verification: no false positives ever
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_jsonl_sink_manifest_isolates_orphans(spark, oracle_sf_dir, tmp_path):
    """The sink's commit protocol: readers trust the manifest, so a
    file that lands in the directory WITHOUT being committed (failed
    task, speculative duplicate, stray copy) never reaches a reader."""
    import json
    import os

    from pyspark.sql import functions as F

    from etl_pyspark_spark.sources.io import read_table
    from etl_pyspark_spark.sources.pyds import register_jsonl_sink

    assert register_jsonl_sink(spark)
    dst = str(tmp_path / "sink")
    (
        read_table(spark, oracle_sf_dir, "events")
        .where(F.col("event_id") % 100 == 0)
        .select("event_id", "user_id", "event_type")
        .write.format("jsonlsink")
        .option("path", dst)
        .mode("append")
        .save()
    )
    with open(os.path.join(dst, "_MANIFEST")) as fh:
        manifest = json.load(fh)
    schema = "event_id bigint, user_id bigint, event_type string"
    committed = spark.read.schema(schema).json(manifest["files"]).count()
    assert committed == manifest["n_rows"] > 0
    # an uncommitted orphan appears in the directory but not the manifest
    orphan = os.path.join(dst, "part-99999.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"event_id": -1, "user_id": -1, "event_type": "orphan"}\n')
    again = spark.read.schema(schema).json(manifest["files"]).count()
    assert again == committed  # manifest-scoped read is unchanged


def test_compression_ratio_invariants(spark, oracle_sf_dir):
    """Rows-only contract for text_compression_ratio: one row per doc,
    ratios positive and bounded (deflate overhead caps well under 2x
    on these sizes), deterministic across runs, and ordered sanely —
    a highly repetitive synthetic string must compress strictly
    better than the corpus median."""
    from etl_pyspark_spark.registry import QUERIES

    df = QUERIES["text_compression_ratio"](spark, oracle_sf_dir)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(0 < r["compression_ratio"] < 2.0 for r in rows
               if r["raw_bytes"] > 0)
    again = {r["doc_id"]: r["compression_ratio"]
             for r in QUERIES["text_compression_ratio"](
                 spark, oracle_sf_dir).collect()}
    assert all(again[r["doc_id"]] == r["compression_ratio"] for r in rows)
    import statistics
    import zlib

    rep = "spam ham " * 200
    rep_ratio = len(zlib.compress(rep.encode(), 6)) / len(rep.encode())
    med = statistics.median(r["compression_ratio"] for r in rows)
    assert rep_ratio < med


def test_block_cosine_pairs_string_cluster_scopes_pairs(spark):
    """block_cosine_pairs(cluster_col=...) must honor NON-NUMERIC
    cluster labels (advice r04: the old bigint cast nulled string
    labels, collapsing every cluster into one group and regenerating
    cross-cluster pairs). Two orthogonal-ish clusters: identical
    vectors within a cluster, orthogonal across — with the cluster
    scope only within-cluster pairs may appear."""
    from etl_pyspark_spark.similarity.blockpairs import (
        block_cosine_pairs,
    )

    rows = [
        (i, "alpha" if i % 2 == 0 else "beta",
         [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0])
        for i in range(8)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    got = block_cosine_pairs(
        emb,
        threshold=-1.0,  # keep EVERY generated candidate pair
        id_col="vec_id",
        vec_col="embedding",
        num_blocks=2,
        cluster_col="label",
    ).collect()
    assert len(got) == 2 * (4 * 3 // 2)  # within-cluster pairs only
    for r in got:
        assert r["id_a"] % 2 == r["id_b"] % 2  # never cross-cluster
        assert r["cos_sim"] == 1.0


def test_mmr_matches_pure_python_greedy(spark, oracle_sf_dir):
    """Third implementation of the MMR rerank: a pure-Python greedy
    over the same fixture embeddings, with the dot product folded in
    the engine's exact left-to-right IEEE order and the same
    pround(6) rounding — so every selection step must match the
    Spark higher-order-array implementation EXACTLY (floats
    included), not approximately. Catches any subtle bug in the
    unrolled F.aggregate/F.filter expression (wrong tiebreak, stale
    picked-set, off-by-one in the fold) that the DuckDB oracle could
    share by construction."""
    import math

    import pyarrow.parquet as pq

    from etl_pyspark_spark.registry import QUERIES

    tbl = pq.read_table(
        f"{oracle_sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    vecs = {
        int(i): [float(x) for x in e]
        for i, e in zip(
            tbl.column("vec_id").to_pylist(),
            tbl.column("embedding").to_pylist(),
        )
    }

    def pr6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        na, nb = math.sqrt(dot(a, a)), math.sqrt(dot(b, b))
        return dot(a, b) / (na * nb)

    q = vecs[0]
    rel = {
        i: pr6(cos(q, v)) for i, v in vecs.items() if i != 0
    }
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    sim = {
        (a, b): pr6(cos(vecs[a], vecs[b]))
        for a in cand
        for b in cand
        if a != b
    }
    picked = []
    first = min(cand, key=lambda i: (-rel[i], i))
    picked.append((1, first, rel[first], rel[first]))
    for step in range(2, 6):
        chosen = {p[1] for p in picked}
        best = None
        for i in cand:
            if i in chosen:
                continue
            score = 0.5 * rel[i] - 0.5 * max(
                sim[(i, j)] for j in chosen
            )
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        picked.append((step, best[1], rel[best[1]], best[2]))

    got = sorted(
        (
            (r["rank"], r["neighbor_id"], r["rel"], r["mmr_score"])
            for r in QUERIES["mmr_diversified_topk"](
                spark, oracle_sf_dir
            ).collect()
        )
    )
    assert got == picked, (got, picked)
