#!/usr/bin/env python3
"""Per-query diff of two bench records (r9 verdict #5: adjudicate a
closing run against the best mid-round record IN the round, not after
it). Prints every query whose wall moved more than --ratio (default
2x) in either direction plus the aggregate story.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--ratio 2.0]
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=1.0)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    only_new = sorted(set(qn) - set(qo))
    so = sum(qo[k] for k in shared if qo[k] > 0)
    sn = sum(qn[k] for k in shared if qn[k] > 0)
    print(
        f"shared {len(shared)} queries: {so:.1f}s -> {sn:.1f}s "
        f"({sn / so:.2f}x like-for-like)"
    )
    if only_new:
        extra = sum(qn[k] for k in only_new if qn[k] > 0)
        print(f"new-only {len(only_new)} queries add {extra:.1f}s: "
              + ", ".join(f"{k}={qn[k]}" for k in only_new))
    rows = []
    for k in shared:
        a, b = qo[k], qn[k]
        if a <= 0 or b <= 0:
            if a < 0 or b < 0:
                rows.append((float("inf"), k, a, b))
            continue
        if max(a, b) < args.min_sec:
            continue
        r = b / a
        if r >= args.ratio or r <= 1 / args.ratio:
            rows.append((r, k, a, b))
    rows.sort(reverse=True)
    for r, k, a, b in rows:
        print(f"  {r:6.2f}x  {k:42s} {a:8.2f} -> {b:8.2f}")
    if not rows:
        print("  no per-query move beyond the ratio threshold")


if __name__ == "__main__":
    main()
