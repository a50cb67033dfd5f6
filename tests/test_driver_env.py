"""Driver-environment parity: the verify driver imports the engine
into ITS OWN SparkSession built with Spark 4 defaults (ANSI on, host
TZ, no legacy confs). Round 1's only blocker was an environment-drift
bug of exactly this class (events.ts TIMESTAMP_NTZ), caught nowhere
locally because every local test shared the engine's tuned session.

Round 4 widened this from 8 representatives to the FULL registry: a
DEFAULT-conf session in a subprocess (fresh JVM, no conf inheritance)
runs every oracle-backed query through the complete value-hash compare
and executes every rows-only query, so any conf the engine forgot to
pin at runtime (ensure_compat) fails here before a driver round does —
174 of 224 round-3 queries had never been driver-sampled, the single
biggest remaining de-risk (round-3 verdict item #1).

Marked ``slow`` (one JVM, whole registry, ~8 min): deselect with
``-m 'not slow'`` for quick iteration; the default run includes it.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

_SWEEP = r"""
import json, sys, traceback
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-env-parity")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"
from etl_pyspark_spark.registry import ORACLES, QUERIES
from tests.oracle_utils import compare, duckdb_connect
con = duckdb_connect(sf)
out = {}
for name in sorted(QUERIES):
    try:
        df = QUERIES[name](spark, sf)
        if name in ORACLES:
            out[name] = compare(df, con, ORACLES[name])
        else:
            # rows-only contract: must execute and return a stable,
            # non-erroring result under driver confs
            df.collect()
            out[name] = []
    except Exception:
        out[name] = ["raised: " + traceback.format_exc()[-800:]]
print("RESULT:" + json.dumps(out))
"""


@pytest.mark.slow
def test_driver_env_full_registry_parity():
    out = subprocess.run(
        [sys.executable, "-c", _SWEEP],
        capture_output=True, text=True, timeout=3000,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, out.stdout[-2000:]
    res = json.loads(line[-1][len("RESULT:"):])
    bad = {k: v for k, v in res.items() if v}
    assert not bad, f"{len(bad)} queries diverge under driver confs: {bad}"
    # the sweep is only meaningful if it actually covered the registry
    from etl_pyspark_spark.registry import QUERIES

    assert set(res) == set(QUERIES)
