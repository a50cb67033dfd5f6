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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, oracle_sf_dir, con):
    df = QUERIES[name](spark, oracle_sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, oracle_sf_dir):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert df.count() >= 0
