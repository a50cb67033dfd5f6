"""Round-10 operators: invariants, recall bounds, plan pins.

The oracled round-10 queries (text_zipf_slope, mining_hardest_negative,
dedup_minhash_estimate_error) are value-checked by the registry-wide
sweep in test_oracle.py; this module covers what SQL cannot —
the IVF-backed mutual-kNN twin's contract against the exact operator
(r9 verdict #1), and the physical-plan shapes that make the new
operators 100 TB-safe.
"""

from __future__ import annotations

import collections

from etl_pyspark_spark.plans import tree_of
from etl_pyspark_spark.registry import QUERIES


def _edges(df):
    return {(r.vec_id_a, r.vec_id_b) for r in df.collect()}


def test_mutual_knn_ivf_contract(spark, oracle_sf_dir):
    """The IVF twin must (a) emit well-formed undirected edges,
    (b) bound every node's degree by k (edges are a subset of each
    endpoint's top-k list), (c) recover nearly all exact mutual edges
    at fixture scale — where its parameters probe every cell, so the
    only admissible loss is quantizer-boundary noise."""
    from etl_pyspark_spark.queries.round9_extensions import _KNN_K

    exact = _edges(QUERIES["similarity_mutual_knn"](spark, oracle_sf_dir))
    appr = _edges(QUERIES["similarity_mutual_knn_ivf"](spark, oracle_sf_dir))
    assert appr, "IVF mutual graph is empty"
    assert all(a < b for a, b in appr)  # canonical orientation, no dups
    deg = collections.Counter()
    for a, b in appr:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) <= _KNN_K
    recall = len(exact & appr) / len(exact)
    assert recall >= 0.95, f"mutual-kNN IVF recall too low: {recall}"
    # approximate edges must still be REAL reciprocal-rank edges or
    # near-misses — at all-cells-probed fixture scale, exact equality
    precision = len(exact & appr) / len(appr)
    assert precision >= 0.95, f"IVF emits phantom edges: {precision}"


def test_mutual_knn_ivf_plan(spark, oracle_sf_dir):
    """No cartesian product, no row-at-a-time Python UDF, no corpus
    collect (the whole point of the twin): candidate generation rides
    cell-keyed applyInPandas, the mutual filter a hash self-join."""
    tree = tree_of(QUERIES["similarity_mutual_knn_ivf"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree
    assert "FlatMapGroupsInPandas" in tree  # per-cell GEMM
    assert "BroadcastNestedLoopJoin" not in tree


def test_hardest_negative_plan(spark, oracle_sf_dir):
    """The O(n^2) work must live inside block-keyed GEMM tasks: one
    applyInPandas, no cartesian join, and the post-GEMM reduction is a
    hash aggregation (max_by) — never a window over the pair space."""
    tree = tree_of(QUERIES["mining_hardest_negative"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree
    assert "FlatMapGroupsInPandas" in tree
    assert "Window" not in tree
    assert "HashAggregate" in tree or "ObjectHashAggregate" in tree


def test_zipf_slope_no_single_partition_window(spark, oracle_sf_dir):
    """Vocabulary ranks must come from the distributed rank operator —
    an ORDER BY window with no partition key would serialize the vocab
    through one task."""
    tree = tree_of(QUERIES["text_zipf_slope"](spark, oracle_sf_dir))
    assert "Window" not in tree


def test_lsh_curve_audit_bounds(spark, oracle_sf_dir):
    """S-curve sanity on real data: deciles in [0, 9], pass counts
    bounded by candidate counts, pass share 0 below the threshold
    decile and 1 above it (passes is a pure function of the decile's
    jaccard range), means in [0, 1]."""
    rows = QUERIES["dedup_lsh_curve_audit"](spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.decile <= 9
        assert 0 <= r.n_passing <= r.n_candidates
        assert 0.0 <= r.mean_est <= 1.0
        assert 0.0 <= r.mean_jaccard <= 1.0
        if r.decile <= 3:  # jac < 0.4 cannot pass the 0.5 threshold
            assert r.n_passing == 0
        if r.decile >= 5:  # jac >= 0.5 always passes
            assert r.n_passing == r.n_candidates
