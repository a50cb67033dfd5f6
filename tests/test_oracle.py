"""Replicates the driver's t2 gate locally: every registered query
must hash-match its DuckDB oracle on the fixture tables."""

from __future__ import annotations

import pytest

from etl_pyspark_spark.registry import ORACLES, QUERIES
from tests.oracle_utils import compare, duckdb_connect


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    c = duckdb_connect(oracle_sf_dir)
    yield c
    c.close()


def _assert_no_row_udf(name, df):
    """Global scale rule, pinned on EVERY registered query's plan: no
    row-at-a-time Python UDF (BatchEvalPython) anywhere. Python in a
    plan must be Arrow-batched (ArrowEvalPython / mapInPandas /
    FlatMapGroupsInPandas)."""
    from etl_pyspark_spark.plans import tree_of

    tree = tree_of(df)
    assert "BatchEvalPython" not in tree, f"{name} uses a row UDF:\n{tree}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, oracle_sf_dir, con):
    df = QUERIES[name](spark, oracle_sf_dir)
    _assert_no_row_udf(name, df)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, oracle_sf_dir):
    df = QUERIES[name](spark, oracle_sf_dir)
    _assert_no_row_udf(name, df)
    assert df.count() >= 0
