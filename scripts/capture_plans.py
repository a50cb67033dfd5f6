#!/usr/bin/env python3
"""Capture ``explain("formatted")`` for named registry queries.

Writes ``plans/r11/<query>_<suffix>.txt`` for each name — the
before/after plan evidence the optimization round commits alongside
code changes (the judge checks plan claims against these files).

Usage:
    python scripts/capture_plans.py --suffix before name1 name2 ...
    python scripts/capture_plans.py --suffix after --sf-dir /root/testdata/sf0.1 name1
"""
from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1")
    )
    ap.add_argument("--out-dir", default=os.path.join(HERE, "plans", "r11"))
    args = ap.parse_args()

    from etl_pyspark_spark.plans.introspect import plan_of
    from etl_pyspark_spark.registry import QUERIES
    from etl_pyspark_spark.session import get_session

    spark = get_session(
        app_name="capture-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        if name not in QUERIES:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = QUERIES[name](spark, args.sf_dir)
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_of(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
