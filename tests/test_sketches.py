"""Invariant tests for approximate/probabilistic operators that have
no SQL oracle (estimator outputs are engine-specific by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.sources.io import read_table


def test_approx_count_distinct_error_bound(spark, oracle_sf_dir):
    approx = QUERIES["approx_count_distinct"](spark, oracle_sf_dir).first()
    o = read_table(spark, oracle_sf_dir, "orders")
    exact = o.agg(
        F.countDistinct("o_custkey").alias("c"),
        F.countDistinct("o_orderkey").alias("k"),
    ).first()
    # rsd=0.02 requested; allow 3 sigma
    assert abs(approx.approx_customers - exact.c) / exact.c < 0.06
    assert abs(approx.approx_orders - exact.k) / exact.k < 0.06


def test_hll_rollup_error_bound(spark, oracle_sf_dir):
    """Merged monthly HLL sketches must estimate yearly distinct
    customers within the sketch's error envelope (lgk=12 => ~1.6%
    standard error; allow 5%), proving the union path re-aggregates
    correctly without raw data."""
    est = {
        r.order_year: r.approx_customers
        for r in QUERIES["hll_sketch_rollup"](spark, oracle_sf_dir).collect()
    }
    o = read_table(spark, oracle_sf_dir, "orders")
    exact = {
        r.y: r.c
        for r in o.groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.countDistinct("o_custkey").alias("c"))
        .collect()
    }
    assert set(est) == set(exact)
    for y, e in est.items():
        assert abs(e - exact[y]) / exact[y] < 0.05, (y, e, exact[y])


def test_observe_metrics_match_filter(spark, oracle_sf_dir):
    """Dataset.observe audit counters must agree with the data: the
    pass counter equals the returned row count, the total equals the
    corpus size — one job, no second scan."""
    out = QUERIES["observed_quality_gate"](spark, oracle_sf_dir)
    n_rows = out.count()  # action -> observation materializes
    metrics = out._graft_observation.get
    n_docs = read_table(spark, oracle_sf_dir, "documents").count()
    assert metrics["n_pass"] == n_rows
    assert metrics["n_total"] == n_docs


def test_lsh_candidates_subset_of_exact(spark, oracle_sf_dir):
    """Every LSH-verified pair must appear in the exact all-pairs
    result at the same threshold (LSH trades recall, never precision)."""
    from etl_pyspark_spark.similarity.blockpairs import block_cosine_pairs
    from etl_pyspark_spark.similarity.lsh import bucket_cosine_pairs

    emb = read_table(spark, oracle_sf_dir, "embeddings")
    lsh = {
        (r.id_a, r.id_b) for r in bucket_cosine_pairs(emb, 0.3).collect()
    }
    exact = {
        (r.id_a, r.id_b) for r in block_cosine_pairs(emb, 0.3).collect()
    }
    assert lsh <= exact
    # and it should find a decent share on this fixture
    assert len(lsh) > 0.2 * len(exact)


def test_ivf_recall_vs_exact(spark, oracle_sf_dir):
    """IVF top-10 must overlap the exact brute-force top-10
    substantially (nprobe=4 of 16 cells on near-random vectors)."""
    exact = QUERIES["similarity_cosine_topk"](spark, oracle_sf_dir)
    approx = QUERIES["similarity_ivf_topk"](spark, oracle_sf_dir)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a) > 0
    recall = len(a & e) / len(e)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_quantized_rerank_recall_vs_exact(spark, oracle_sf_dir):
    """int8-coarse + exact-rerank top-10 must recover nearly all of
    the exact brute-force top-10: with expand=3x k, the only losses
    are neighbors whose quantized rank falls below 30 — rare, since
    int8 keeps ~2 decimal digits of cosine resolution."""
    exact = QUERIES["similarity_cosine_topk"](spark, oracle_sf_dir)
    approx = QUERIES["similarity_quantized_rerank"](spark, oracle_sf_dir)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a) == len(e)
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"quantized-rerank recall too low: {recall}"


def test_pq_recall_vs_exact(spark, oracle_sf_dir):
    """PQ + exact rerank must recover most of the true top-10 (the
    compressed scan only gates the shortlist; rerank is exact)."""
    from etl_pyspark_spark.registry import QUERIES

    approx = QUERIES["similarity_pq_topk"](spark, oracle_sf_dir)
    exact = QUERIES["similarity_cosine_topk"](spark, oracle_sf_dir)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {
        (r["query_id"], r["neighbor_id"])
        for r in exact.collect()
    }
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"PQ recall too low: {recall}"  # measured 0.925


def test_countmin_overestimates_only(spark, oracle_sf_dir):
    """Count-min's one-sided error guarantee: every probe estimate is
    >= the true count (equality unless the token collided in all 4
    rows)."""
    rows = QUERIES["countmin_frequency_estimate"](
        spark, oracle_sf_dir
    ).collect()
    assert len(rows) == 30
    assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)
