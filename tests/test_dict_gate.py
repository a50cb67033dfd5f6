"""Set-dictionary broadcast gate (r9 advice #4).

The shingle-pair verify stages broadcast the per-doc set dictionary —
correct while it is small, a hard failure past Spark's 8 GB broadcast
limit. ``dedup.shared.dict_hint`` gates the hint on measured corpus
bytes with an env override; these tests pin the gate's decisions and
prove the fallback (shuffled hash join) is LOSSLESS by value-comparing
the containment query against its DuckDB oracle with the hint forced
off.
"""

from __future__ import annotations

from tests.oracle_utils import compare, duckdb_connect


def _hinted(df) -> bool:
    return "hint" in df._jdf.queryExecution().logical().toString().lower()


def test_dict_hint_gate_decisions(spark, oracle_sf_dir, monkeypatch):
    from etl_pyspark_spark.dedup import shared

    small = spark.range(4)
    cb = shared.corpus_bytes_of(oracle_sf_dir)
    # the fixture corpus must measure small — otherwise the pinned
    # broadcast-verify plan shape (test_plans.py) would silently flip
    assert cb and cb < shared._DICT_BCAST_MAX_CORPUS_BYTES
    assert _hinted(shared.dict_hint(small, cb))
    assert not _hinted(
        shared.dict_hint(small, shared._DICT_BCAST_MAX_CORPUS_BYTES + 1)
    )
    # unmeasured corpus keeps the hint (documented default; `never` is
    # the manual escape for unmeasurable lake inputs)
    assert _hinted(shared.dict_hint(small, None))
    monkeypatch.setenv("SPARK_GRAFT_SET_DICT_BROADCAST", "never")
    assert not _hinted(shared.dict_hint(small, cb))
    monkeypatch.setenv("SPARK_GRAFT_SET_DICT_BROADCAST", "always")
    assert _hinted(shared.dict_hint(small, 10**18))


def test_containment_lossless_without_broadcast(
    spark, oracle_sf_dir, monkeypatch
):
    """Forcing the shuffled-join fallback must not change one row:
    the gate swaps the dictionary's transport, never the semantics."""
    from etl_pyspark_spark.registry import ORACLES, QUERIES

    monkeypatch.setenv("SPARK_GRAFT_SET_DICT_BROADCAST", "never")
    con = duckdb_connect(oracle_sf_dir)
    try:
        for name in ("dedup_containment", "dedup_ngram_prefix"):
            probs = compare(
                QUERIES[name](spark, oracle_sf_dir), con, ORACLES[name]
            )
            assert not probs, (name, probs)
    finally:
        con.close()
