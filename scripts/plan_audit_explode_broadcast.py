#!/usr/bin/env python3
"""One-off plan audit: find queries whose physical plan broadcasts an
EXPLODED subtree (BroadcastExchange whose child chain contains a
Generate before any Exchange/Scan boundary) — the size-misestimate
pattern that single-threaded range_join_binned and
interval_overlap_join before round 7 hardened them (the planner costs
an exploded side from its pre-Generate scan estimate).

Usage: python scripts/plan_audit_explode_broadcast.py [sf_dir]
Prints one line per flagged query; exit 0 always (audit, not a gate).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def broadcast_over_generate(tree: str) -> bool:
    """True if any BroadcastExchange's subtree contains a Generate
    before the next same-or-lower-depth node boundary."""
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        m = re.search(r"^(\s*)(?::-|\+-)?\s*BroadcastExchange", ln)
        if not m:
            continue
        depth = len(ln) - len(ln.lstrip(" :+-"))
        for nxt in lines[i + 1 :]:
            nd = len(nxt) - len(nxt.lstrip(" :+-"))
            if nxt.strip() and nd <= depth:
                break  # left the subtree
            if "Generate" in nxt:
                return True
    return False


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_pyspark_spark.plans import tree_of
    from etl_pyspark_spark.registry import QUERIES, ensure_layouts
    from etl_pyspark_spark.session import get_session

    spark = get_session(
        extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ensure_layouts(spark, sf)
    except Exception:
        pass
    flagged, errs = [], 0
    for name, fn in QUERIES.items():
        try:
            t = tree_of(fn(spark, sf))
        except Exception:
            errs += 1
            continue
        if broadcast_over_generate(t):
            flagged.append(name)
            print("FLAG", name)
    print(f"audited {len(QUERIES)} queries, {errs} plan errors, "
          f"{len(flagged)} flagged: {flagged}")


if __name__ == "__main__":
    main()
