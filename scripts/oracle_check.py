#!/usr/bin/env python3
"""Spot-check named queries against their DuckDB oracles at one SF.

Local replica of the driver's correctness run for a TARGETED list —
the per-change verification loop of the optimization rounds (the full
sweep lives in tests/test_driver_env.py).

Usage: python scripts/oracle_check.py [--sf-dir /root/testdata/sf0.01] name...
"""
from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from oracle_utils import compare, duckdb_connect

    from etl_pyspark_spark.registry import ORACLES, QUERIES
    from etl_pyspark_spark.session import get_session

    spark = get_session(
        app_name="oracle-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(args.sf_dir)
    bad = 0
    for name in args.names:
        if name not in QUERIES:
            print(f"UNKNOWN {name}")
            bad += 1
            continue
        if name not in ORACLES:
            print(f"ROWS-ONLY {name}: running engine side only")
            n = QUERIES[name](spark, args.sf_dir).count()
            print(f"  rows={n}")
            continue
        df = QUERIES[name](spark, args.sf_dir)
        problems = compare(df, con, ORACLES[name])
        if problems:
            bad += 1
            print(f"BAD {name}:")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"OK {name}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
