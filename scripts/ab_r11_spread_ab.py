#!/usr/bin/env python3
"""Interleaved A/B for spread() additions: alternate spread <-> identity
per rep inside ONE session. Queries to test come from argv."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from etl_pyspark_spark.sources import io as srcio
from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.session import get_session

real_spread = srcio.spread

spark = get_session(app_name="spread-ab",
                    extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def run(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


for qname in sys.argv[1:]:
    for arm_fn in (lambda df: df, real_spread):  # warm both arms
        srcio.spread = arm_fn
        run(qname)
    rows = []
    for rep in range(REPS):
        for arm, fn in (("off", lambda df: df), ("on", real_spread)):
            srcio.spread = fn
            sec = run(qname)
            rows.append((arm, sec))
            print(f"{qname} rep={rep} arm={arm} {sec:.3f}s", flush=True)
    offs = sorted(s for a, s in rows if a == "off")
    ons = sorted(s for a, s in rows if a == "on")
    print(
        f"MEDIAN {qname}: spread-off {offs[len(offs) // 2]:.3f}s"
        f" -> spread-on {ons[len(ons) // 2]:.3f}s"
    )
srcio.spread = real_spread
spark.stop()
