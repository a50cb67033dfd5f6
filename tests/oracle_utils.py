"""Local replica of the driver's Spark-vs-DuckDB correctness compare.

The driver (per ``__spark_entry__.py`` docstring) runs each
``queries()[name]`` and its ``oracle_sql()[name]`` side by side and
compares row-count + schema + order-insensitive value hash. This
module reproduces that check so every operator can be verified locally
before the round's CORRECTNESS run.
"""

from __future__ import annotations

import math
import os

import duckdb

from etl_pyspark_spark.sources.io import FIXTURE_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the buffer pool and give it a spill dir: DuckDB's default
    # limit (80% of RAM) lets a long oracle sweep's pool grow until it
    # collides with the Spark JVM + Python workers sharing the host (a
    # full-registry sweep once died with bad_alloc on the 356th
    # oracle). 16 GB is ~100x any single oracle's working set.
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in FIXTURE_TABLES:
        # driver fixtures are single files; generated fixtures
        # (scale_smoke_gen, native_datagen) are Spark output
        # directories — glob those so oracle sweeps run on both
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr at 12 significant digits
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def _canon_duck_type(t) -> str:
    """Canonical dtype token for a DuckDB column type.

    Integer widths i8..i64 collapse to ``int`` (they stringify and
    hash identically on the driver), but HUGEINT stays distinct: the
    driver's pandas conversion turns int128 into float64, which is
    exactly the value-hash trap that broke ``shard_assignment`` in
    round 2. Any oracle whose ``sum()`` lands on HUGEINT must CAST."""
    t = str(t).upper()
    if t.endswith("[]"):
        return f"array<{_canon_duck_type(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.startswith("TIMESTAMP"):
        return "ts"
    m = {
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
        "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int",
        "UINTEGER": "int", "UBIGINT": "int",
        "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
        "DOUBLE": "f64", "FLOAT": "f32",
        "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    }
    return m.get(t, t.lower())


def _canon_spark_type(dt) -> str:
    s = dt.simpleString()
    if s.startswith("array<") and s.endswith(">"):
        inner = s[len("array<"):-1]
        return f"array<{_canon_spark_simple(inner)}>"
    return _canon_spark_simple(s)


def _canon_spark_simple(s: str) -> str:
    if s.startswith("decimal"):
        return s.replace(" ", "")
    if s.startswith("timestamp"):
        return "ts"
    m = {
        "tinyint": "int", "smallint": "int", "int": "int",
        "bigint": "int", "double": "f64", "float": "f32",
        "string": "str", "boolean": "bool", "date": "date",
    }
    return m.get(s, s)


def dtype_problems(spark_df, rel) -> list[str]:
    """Driver-parity dtype check: oracle column types must map onto
    the Spark schema under the canonical token mapping (see
    ``_canon_duck_type``); catches HUGEINT/decimal/float drift that
    value stringification hides locally but the driver's hash sees."""
    s_types = {f.name: _canon_spark_type(f.dataType)
               for f in spark_df.schema.fields}
    d_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    problems = []
    for name, dt in sorted(d_types.items()):
        st = s_types.get(name)
        if st is None:
            continue  # schema mismatch reported separately
        ct = _canon_duck_type(dt)
        if ct != st:
            problems.append(
                f"dtype[{name}]: spark={st} duckdb={dt} (canon {ct}) — "
                f"add a CAST in the oracle (HUGEINT trap?)"
            )
    return problems


def compare(spark_df, con, sql: str, max_diff_show: int = 5) -> list[str]:
    """Return a list of mismatch descriptions ([] == match)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    problems.extend(dtype_problems(spark_df, rel))
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
    _, sn = _norm_rows(s_cols, s_rows)
    _, dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        only_s = [r for r in sn if r not in set(dn)][:max_diff_show]
        only_d = [r for r in dn if r not in set(sn)][:max_diff_show]
        problems.append(
            f"values differ; spark-only={only_s} duckdb-only={only_d}"
        )
    return problems
