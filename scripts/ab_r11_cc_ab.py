#!/usr/bin/env python3
"""Interleaved A/B for the connected-components / k-core broadcast
gates: alternate the module-level gate per rep inside ONE session so
JVM/codegen/cache warmth cannot favor either arm. Times the noop-sink
execution of each consumer query."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from etl_pyspark_spark.dedup import components
from etl_pyspark_spark.queries import graph_temporal
from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.session import get_session

spark = get_session(app_name="cc-ab",
                    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

GATE_ON = 2_000_000


def run(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


results = {}
for qname in ("entity_resolution_clusters", "graph_k_core"):
    # warm both arms once (edge-build caches, codegen)
    for gate in (0, GATE_ON):
        components._CC_BCAST_MAX_NODES = gate
        graph_temporal._KCORE_BCAST_MAX_EDGES = gate
        run(qname)
    rows = []
    for rep in range(REPS):
        for arm, gate in (("off", 0), ("on", GATE_ON)):
            components._CC_BCAST_MAX_NODES = gate
            graph_temporal._KCORE_BCAST_MAX_EDGES = gate
            sec = run(qname)
            rows.append((rep, arm, sec))
            print(f"{qname} rep={rep} arm={arm} {sec:.3f}s", flush=True)
    offs = sorted(s for _, a, s in rows if a == "off")
    ons = sorted(s for _, a, s in rows if a == "on")
    results[qname] = (offs[len(offs) // 2], ons[len(ons) // 2])

for q, (off, on) in results.items():
    print(f"MEDIAN {q}: gate-off {off:.3f}s -> gate-on {on:.3f}s")
spark.stop()
