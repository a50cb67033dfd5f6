"""Cross-engine deterministic helpers.

Spark's ``round()`` converts doubles through ``Double.toString`` (the
shortest decimal representation) and then applies HALF_UP, while
DuckDB rounds the raw binary value — so e.g. ``round(2.09/32, 6)``
differs between the engines (0.065313 vs 0.065312). ``pround`` instead
computes ``floor(x * 10^k + 0.5) / 10^k``: pure IEEE double ops that
both engines evaluate bit-identically. Used for every float the
DuckDB oracle hashes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, k: int = 6) -> Column:
    """Portable round-half-up of a double to k decimals (see module doc)."""
    m = float(10**k)
    return F.floor(col * m + F.lit(0.5)) / F.lit(m)


def sql_pround(expr: str, k: int = 6) -> str:
    """The DuckDB twin of :func:`pround` — same IEEE operations."""
    m = float(10**k)
    return f"floor(({expr}) * {m!r} + 0.5) / {m!r}"
