"""Allowlist pin for unpartitioned windows (r04 verdict #2).

``Window.orderBy(...)`` with no ``partitionBy`` forces the whole input
through ONE task — the classic scale-killer. The engine's rank/ntile/
cumsum machinery never does this (operators/ranks, machine-checked by
never-SinglePartition plan tests); the registry keeps a handful of
sites where the windowed input is BOUNDED BY CONSTRUCTION (calendar
days, 10 deciles, 20 bins, |days|^2 slope pairs...), which is safe —
but only as long as the boundedness convention holds.  This test makes
the convention machine-checked: every unpartitioned-window site in the
package must appear in the allowlist below WITH its documented bound,
and every allowlist entry must still exist, so

- a NEW query copying the pattern onto an unbounded input fails the
  build until its bound is reviewed and recorded here, and
- a refactor that removes a site must also clean up its entry.
"""

from __future__ import annotations

import ast
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "etl_pyspark_spark"

# function name -> documented input bound for its unpartitioned window
ALLOWLIST = {
    # one row per calendar day (fixture spans months; years at scale —
    # a ~10^4-row table even over 30 years)
    "q_skyline_orders": "per-day aggregate table (|days| rows)",
    "q_orders_running_share": "per-day aggregate table (|days| rows)",
    "q_anomaly_daily_counts": "per-day aggregate table (|days| rows)",
    # fixed-cardinality bucketings
    "q_score_decile_lift": "exactly 10 decile rows",
    "q_survival_hazard_table": "bounded duration buckets (weeks)",
    "q_isotonic_calibration": "20 calibration bins",
    # O(|days|^2) pairs of per-day points — bounded because the day
    # table is; documented in the query as the discrete-median variant
    "q_theil_sen_slope": "|days|^2 slope pairs over the day table",
    # two ranks over the per-day series pair table (|days| rows)
    "q_spearman_rank_correlation": "per-day series table (|days| rows)",
    # waterline search over the per-source demand table — |sources|
    # rows, a bounded catalog dimension (the fact-scale token count
    # is a keyed aggregation before this window)
    "q_token_budget_waterfill": "per-source demand table (|sources| rows)",
}


def _sites():
    """(module, enclosing function, line) of every Window.orderBy —
    i.e. every window built WITHOUT a leading partitionBy."""
    out = []
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text()
        if "Window.orderBy" not in src:
            continue
        tree = ast.parse(src)
        spans = [
            (n.name, n.lineno, max(c.lineno for c in ast.walk(n) if hasattr(c, "lineno")))
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for m in re.finditer(r"Window\.orderBy", src):
            line = src.count("\n", 0, m.start()) + 1
            owner = None
            for name, lo, hi in spans:
                if lo <= line <= hi and (
                    owner is None or lo > owner[1]
                ):
                    owner = (name, lo)
            out.append((path.name, owner[0] if owner else "<module>", line))
    return out


def test_every_unpartitioned_window_is_allowlisted():
    sites = [s for s in _sites() if s[0] != "ranks.py"]  # docstring
    unknown = [s for s in sites if s[1] not in ALLOWLIST]
    assert not unknown, (
        "unpartitioned Window.orderBy in un-reviewed function(s) "
        f"{unknown}: a global window ships its whole input through one "
        "task. Either partition it (operators/ranks has the "
        "distributed rank/ntile/cumsum machinery) or, if the input is "
        "bounded by construction, record the bound in "
        "tests/test_window_allowlist.py"
    )


def test_allowlist_has_no_stale_entries():
    owners = {s[1] for s in _sites()}
    stale = set(ALLOWLIST) - owners
    assert not stale, f"allowlist entries with no remaining site: {stale}"
