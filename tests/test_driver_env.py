"""Driver-environment parity: the verify driver imports the engine
into ITS OWN SparkSession built with Spark 4 defaults (ANSI on, host
TZ, no legacy confs). Round 1's only blocker was an environment-drift
bug of exactly this class (events.ts TIMESTAMP_NTZ), caught nowhere
locally because every local test shared the engine's tuned session.

This test boots a DEFAULT-conf session in a subprocess (fresh JVM, no
conf inheritance) and runs one representative oracle-backed query per
fixture family — documents (text path), embeddings (array path),
lineitem (decimal/timestamp relational path), orders+customer (join
path) — through the full value-hash compare, so any conf the engine
forgot to pin at runtime (ensure_compat) fails here before a driver
round does. Events are covered by
test_streaming.py::test_event_ts_ntz_surface_end_to_end.
"""

from __future__ import annotations

import json
import subprocess
import sys

REPRESENTATIVES = [
    "text_stats",            # documents: tokenization + string fns
    "embedding_norms",       # embeddings: array<float> math
    "agg_pricing_summary",   # lineitem: decimal sums, date filter
    "join_inner_broadcast",  # orders x customer: join + agg
    # round-3 families, one each: stateful streaming quota (event-time
    # + applyInPandasWithState under default confs), hashed-gram
    # dedup, Python DataSource write path, Spark 4 SQL front-end
    "stream_quota_drop",
    "substring_dup_spans",
    "python_datasource_jsonl_sink",
    "sql_pipe_syntax",
]


def test_driver_env_parity():
    code = r"""
import json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("driver-env-parity")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"
from etl_pyspark_spark.registry import ORACLES, QUERIES
from tests.oracle_utils import compare, duckdb_connect
con = duckdb_connect(sf)
names = %s
out = {}
for name in names:
    problems = compare(QUERIES[name](spark, sf), con, ORACLES[name])
    out[name] = problems
print(json.dumps(out))
""" % json.dumps(REPRESENTATIVES)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    bad = {k: v for k, v in res.items() if v}
    assert not bad, bad
