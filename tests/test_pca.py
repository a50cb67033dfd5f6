"""Invariants for PCA whitening (eigendecomposition has no SQL twin —
the registry entry is rows-only; these tests are its correctness
contract)."""

from __future__ import annotations

import numpy as np

from etl_pyspark_spark.similarity.pca import (
    corpus_moments,
    pca_whiten,
    whitening_matrix,
)
from etl_pyspark_spark.sources.io import read_table


def _reference(spark, sf_dir, k=8):
    emb = read_table(spark, sf_dir, "embeddings")
    rows = sorted(
        (r["vec_id"], r["embedding"]) for r in emb.collect()
    )
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype="float64")
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    return emb, ids, x, mean, cov


def test_moments_match_numpy(spark, oracle_sf_dir):
    emb, ids, x, mean, cov = _reference(spark, oracle_sf_dir)
    n, m, c = corpus_moments(emb)
    assert n == len(x)
    assert np.allclose(m, mean, atol=1e-9)
    assert np.allclose(c, cov, atol=1e-7)


def test_whitened_components_match_reference(spark, oracle_sf_dir):
    emb, ids, x, mean, cov = _reference(spark, oracle_sf_dir)
    lam, w = whitening_matrix(cov, 8)
    want = (x - mean) @ w
    want = np.floor(want * 1e6 + 0.5) / 1e6
    got_rows = {
        r["vec_id"]: r["components"]
        for r in pca_whiten(emb, k=8).collect()
    }
    got = np.array([got_rows[i] for i in ids])
    # engine moments differ from the single-shot reference only by
    # float combine order; after the 1e-6 rounding, at most last-digit
    assert np.abs(got - want).max() <= 2e-6


def test_whitening_properties(spark, oracle_sf_dir):
    emb, ids, x, mean, cov = _reference(spark, oracle_sf_dir)
    lam, w = whitening_matrix(cov, 8)
    # eigenvalues descending, strictly positive on this fixture
    assert all(a >= b for a, b in zip(lam, lam[1:]))
    assert lam[-1] > 0
    # whitened covariance == identity
    y = (x - mean) @ w
    c = y.T @ y / len(y)
    assert np.allclose(c, np.eye(8), atol=1e-6)
    # determinism: second call bit-identical
    lam2, w2 = whitening_matrix(cov, 8)
    assert np.array_equal(w, w2)


def test_round_to_is_honored(spark, oracle_sf_dir):
    """round_to must actually control the projection's rounding
    (advice r04: it was silently hardcoded to 6 decimals)."""
    emb, ids, x, mean, cov = _reference(spark, oracle_sf_dir)
    got = pca_whiten(emb, k=4, round_to=2).collect()
    vals = np.array([r["components"] for r in got])
    assert np.array_equal(vals, np.floor(vals * 100 + 0.5) / 100)
    # and 2-decimal output differs from the 6-decimal default
    got6 = np.array(
        [r["components"] for r in pca_whiten(emb, k=4).collect()]
    )
    assert not np.array_equal(vals, got6)
