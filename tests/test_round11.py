"""Round-11 operators: twin contracts, guard contracts, plan pins.

``mining_hardest_negative_ann`` is rows-only by declaration (k-means
quantizer is estimator-specific), so its correctness evidence is this
module: equality with the exact miner at all-cells-probed fixture
scale, and the physical-plan shape that makes it 100 TB-safe. The
negative-id guard test pins the r10-advice contract: raise over
silent degrade (Spark ``%`` is negative for negative ids and would
silently drop rows from the block join before the in-task guard).
"""

from __future__ import annotations

import pytest

from etl_pyspark_spark.plans import tree_of
from etl_pyspark_spark.registry import QUERIES


def _mined(df):
    return {(r.vec_id, r.hard_neg_id): (r.label, r.cos_sim) for r in df.collect()}


def test_hardest_negative_ann_matches_exact_at_fixture_scale(
    spark, oracle_sf_dir
):
    """At fixture scale the twin's defaults probe EVERY cell, so IVF
    candidate generation degrades to exact search and the only
    admissible difference is none at all: same anchors, same winners,
    same pround(6) cosines (both sides rank by the shared int64
    composite key)."""
    exact = _mined(QUERIES["mining_hardest_negative"](spark, oracle_sf_dir))
    appr = _mined(QUERIES["mining_hardest_negative_ann"](spark, oracle_sf_dir))
    assert exact, "exact miner returned nothing"
    missing = set(exact) - set(appr)
    phantom = set(appr) - set(exact)
    assert not missing and not phantom, (
        f"ann!=exact at all-cells-probed scale: missing={sorted(missing)[:5]} "
        f"phantom={sorted(phantom)[:5]}"
    )
    for k, (lab, cos) in exact.items():
        alab, acos = appr[k]
        assert alab == lab
        assert abs(acos - cos) < 1e-9


def test_hardest_negative_ann_plan(spark, oracle_sf_dir):
    """The scale twin's point is its plan: candidates ride cell-keyed
    applyInPandas GEMMs (no cartesian product, no row-at-a-time
    Python UDF, no pair-space window), and nothing collects the
    corpus (quantizer training is a bounded TakeOrderedAndProject)."""
    tree = tree_of(QUERIES["mining_hardest_negative_ann"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "FlatMapGroupsInPandas" in tree  # per-cell GEMM


def test_hard_negative_mine_raises_on_negative_ids(spark):
    """Negative ids must RAISE (the [0, 2^42) composite-key guard),
    never silently drop — r10 advice: with Spark's `%` a negative id
    got a negative block id, matched no (bi, bj) pair row, and
    vanished before the in-task guard could fire. pmod keeps the row
    flowing into a task where the guard upholds the contract."""
    from etl_pyspark_spark.similarity.mining import hard_negative_mine

    emb = spark.createDataFrame(
        [(-1, [1.0, 0.0], 0), (2, [1.0, 0.1], 1), (3, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label long",
    )
    with pytest.raises(Exception, match="2\\^42"):
        hard_negative_mine(emb, num_blocks=2).collect()


def test_graph_modularity_plan_and_sum(spark, oracle_sf_dir):
    """Brand joins must broadcast (part is a dim table), no cartesian
    product anywhere, and the per-community contributions must sum to
    a sane Q (|Q| <= 1 by construction; ~0 on brand-independent
    edges)."""
    df = QUERIES["graph_modularity"](spark, oracle_sf_dir)
    tree = tree_of(df)
    assert "CartesianProduct" not in tree
    assert "BroadcastHashJoin" in tree
    rows = df.collect()
    assert rows
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0
    m = sum(r.intra_edges for r in rows)
    deg = sum(r.degree_sum for r in rows)
    assert deg % 2 == 0 and m <= deg // 2  # handshake bound


def test_embedding_silhouette_plan_and_range(spark, oracle_sf_dir):
    """One corpus scan against a broadcast centroid table — no
    row-at-a-time Python UDF, no O(n^2) join — and silhouettes live
    in [-1, 1]."""
    df = QUERIES["embedding_silhouette"](spark, oracle_sf_dir)
    tree = tree_of(df)
    assert "BatchEvalPython" not in tree
    assert "CartesianProduct" not in tree or "Broadcast" in tree
    rows = df.collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.n_vectors > 0


def test_split_covariate_balance_counts(spark, oracle_sf_dir):
    """The three features must agree on the split sizes (they audit
    the SAME 95/5 hash split), and train+test must cover the corpus."""
    from etl_pyspark_spark.queries.core import read_table

    rows = QUERIES["split_covariate_balance"](spark, oracle_sf_dir).collect()
    assert len(rows) == 3
    sizes = {(r.n_train, r.n_test) for r in rows}
    assert len(sizes) == 1
    n_train, n_test = sizes.pop()
    total = read_table(spark, oracle_sf_dir, "documents").count()
    assert n_train + n_test == total
    assert n_test < n_train  # 5% side is the small one


def test_psi_invariants_and_plan(spark, oracle_sf_dir):
    """Every PSI term (p - q) ln(p / q) is non-negative by
    construction (p - q and ln(p/q) share sign), bins cover both
    populations, and the decile edges come from the distributed rank
    operator — no window over the reference population."""
    df = QUERIES["drift_psi_price_deciles"](spark, oracle_sf_dir)
    assert "Window" not in tree_of(df)
    rows = df.collect()
    assert len(rows) == 10
    assert all(r.psi_term >= 0 for r in rows)
    assert sum(r.n_ref for r in rows) > 0 and sum(r.n_cur for r in rows) > 0


def test_t_closeness_bounds(spark, oracle_sf_dir):
    """Ordered-bin EMD lives in [0, 1]; group sizes are positive."""
    rows = QUERIES["privacy_t_closeness"](spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.emd <= 1.0
        assert r.n_group > 0


def test_cramers_v_bounds(spark, oracle_sf_dir):
    """V is a bounded effect size: [0, ~1] for all three pairs (ulp
    slack above 1 is impossible after pround), chi2 >= 0."""
    rows = QUERIES["stats_cramers_v"](spark, oracle_sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.chi2 >= 0.0
        assert 0.0 <= r.cramers_v <= 1.0
        assert r.dof_min >= 1


def test_flesch_readability_sanity(spark, oracle_sf_dir):
    """Per-source doc counts positive, hard-doc counts bounded by doc
    counts, and the plan stays JVM-side (regexp counting must not
    fall into a Python UDF)."""
    df = QUERIES["quality_flesch_readability"](spark, oracle_sf_dir)
    assert "BatchEvalPython" not in tree_of(df)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        assert 0 <= r.n_hard <= r.n_docs


def test_lsh_adaptive_width_rule():
    """similarity_ann_lsh's per-band bit width must (a) equal the
    historical 4 bits for every oracle-checked fixture size (the
    baked SQL oracle replays exactly that banding), (b) grow
    logarithmically so expected bucket size stays ~target as n grows,
    (c) cap at 16 bits."""
    from etl_pyspark_spark.similarity.lsh import planes_per_band_for

    for n in (0, 1, 500, 2000, 20000, 65536):  # all driver/native SFs
        assert planes_per_band_for(n) == 4, n
    assert planes_per_band_for(200_000) == 6
    assert planes_per_band_for(2_000_000) == 9
    assert planes_per_band_for(10**12) == 16  # cap
    # monotone non-decreasing over decades
    widths = [planes_per_band_for(10**k) for k in range(3, 13)]
    assert widths == sorted(widths)


def test_hard_negative_mine_diagonal_single_copy(spark):
    """Off-diagonal fix must not change results: a 2-block corpus
    mines identically to the single-block (pure diagonal) run."""
    rows = [
        (i, [float(i % 7), float((3 * i) % 5), 1.0], i % 3) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    from etl_pyspark_spark.similarity.mining import hard_negative_mine

    one = _mined(hard_negative_mine(emb, num_blocks=1))
    two = _mined(hard_negative_mine(emb, num_blocks=3))
    assert one == two
