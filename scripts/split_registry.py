#!/usr/bin/env python3
"""One-shot mechanical splitter: registry.py -> etl_pyspark_spark/queries/*.

Per-round verdict item (r06 #5): the 21.5k-line registry becomes per-
family modules re-exported through the existing QUERIES/ORACLES
surface, with zero behavior change. The split is purely positional
(contiguous section groups, original statement order preserved via
facade import order); cross-module name references are satisfied by
auto-generated explicit imports from the LATEST earlier definer, which
reproduces single-file shadowing semantics exactly.

Run from the repo root. Safe to re-run (regenerates everything).
"""

from __future__ import annotations

import ast
import os
import re

SRC = "etl_pyspark_spark/registry.py"
PKG = "etl_pyspark_spark/queries"

# (module, start_line, end_line) — contiguous, 1-based inclusive,
# boundaries verified to sit on top-level statement starts.
MODULES = [
    ("core", 1, 69),
    ("flagship", 70, 139),
    ("aggregations", 140, 247),
    ("joins", 248, 543),
    ("sort_set_window", 544, 821),
    ("scalar_funcs", 822, 913),
    ("text_analysis", 914, 2076),
    ("dedup_queries", 2077, 2475),
    ("streaming_multimodal", 2476, 2669),
    ("sql_layer", 2670, 3351),
    ("io_lake", 3352, 4508),
    ("temporal_tpch", 4509, 5752),
    ("corpus_pipeline", 5753, 6510),
    ("widening_r3", 6511, 7527),
    ("training_growth", 7528, 9501),
    ("semdedup_tokenizer", 9502, 10659),
    ("eval_stats", 10660, 13321),
    ("graph_temporal", 13322, 15512),
    ("timeseries_entity", 15513, 17803),
    ("records_quality", 17804, 19980),
    ("round6_extensions", 19981, None),
]


# Names called at query RUNTIME by a module that precedes their
# definer (legal in the single file: module fully loaded before any
# query runs). The splitter injects a deferred-forwarding stub in the
# consuming module; the real definition later in the import order is
# what every subsequent module (and the facade) binds.
FORWARD_STUBS: dict[str, list[tuple[str, str]]] = {
    "text_analysis": [("_register_views", "sql_layer")],
    "widening_r3": [
        ("_ensure_skipping_lineitem", "eval_stats"),
        ("_ensure_deflate_sizes", "eval_stats"),
        ("_ensure_orders_mixed_spec", "training_growth"),
    ],
    "training_growth": [("_copurchase_edges", "graph_temporal")],
}


def _target_names(t: ast.expr) -> list[str]:
    if isinstance(t, ast.Name):
        return [t.id]
    if isinstance(t, (ast.Tuple, ast.List)):
        out: list[str] = []
        for e in t.elts:
            out.extend(_target_names(e))
        return out
    return []  # attribute/subscript targets bind no module global


def defined_names(body: list[ast.stmt]) -> list[str]:
    names: list[str] = []
    for s in body:
        if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(s.name)
        elif isinstance(s, ast.Assign):
            for t in s.targets:
                names.extend(_target_names(t))
        elif isinstance(s, ast.AnnAssign):
            names.extend(_target_names(s.target))
        elif isinstance(s, ast.AugAssign):
            names.extend(("<AUGASSIGN>" + n) for n in _target_names(s.target))
        elif isinstance(s, ast.Import):
            for a in s.names:
                names.append(a.asname or a.name.split(".")[0])
        elif isinstance(s, ast.ImportFrom):
            for a in s.names:
                names.append(a.asname or a.name)
        elif isinstance(s, (ast.If, ast.Try, ast.For, ast.While, ast.With)):
            for field in ("body", "orelse", "finalbody"):
                names.extend(defined_names(getattr(s, field, []) or []))
            for h in getattr(s, "handlers", []) or []:
                names.extend(defined_names(h.body))
    return names


def main() -> None:
    lines = open(SRC).readlines()
    if len(lines) < 20000:
        raise SystemExit(
            "registry.py is already the facade (split done); this "
            "script only applies to the pre-split single-file registry."
        )
    chunks: list[tuple[str, str]] = []
    for name, a, b in MODULES:
        text = "".join(lines[a - 1 : (b if b else len(lines))])
        chunks.append((name, text))

    # parse + per-chunk defined names
    defined: dict[str, list[str]] = {}
    for name, text in chunks:
        tree = ast.parse(text)
        defined[name] = [n for n in defined_names(tree.body) if n != "annotations"]

    # hazard report: top-level AugAssign, cross-module redefinition
    latest: dict[str, str] = {}
    for name, _ in chunks:
        for n in defined[name]:
            if n.startswith("<AUGASSIGN>"):
                print(f"HAZARD augassign {name}: {n}")
                continue
            if n in latest and latest[n] != name:
                print(f"NOTE redefinition: {n} in {latest[n]} then {name}")
            latest[n] = name

    # forward-reference report: word used in module i, defined only later
    order = [n for n, _ in chunks]
    pos = {n: i for i, n in enumerate(order)}
    all_defs: dict[str, list[str]] = {}
    for name, _ in chunks:
        for n in defined[name]:
            all_defs.setdefault(n, []).append(name)
    for i, (name, text) in enumerate(chunks):
        words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", text))
        for w in words:
            mods = all_defs.get(w)
            if not mods or w in defined[name]:
                continue
            if all(pos[m] > i for m in mods):
                print(f"FORWARD-REF? {name} uses {w} (defined in {mods})")

    # generate modules
    os.makedirs(PKG, exist_ok=True)
    with open(f"{PKG}/__init__.py", "w") as fh:
        fh.write(
            '"""Per-family query modules (split from the single-file '
            "registry).\n\nImport order matters: modules register into "
            "the shared QUERIES/ORACLES\ndicts in core and may reference "
            "helpers from earlier families.\nImport through "
            "``etl_pyspark_spark.registry`` (the facade), which loads\n"
            'every family in the original definition order."""\n'
        )

    earlier: dict[str, str] = {}  # name -> latest module so far
    for i, (name, text) in enumerate(chunks):
        header = ""
        if i > 0:
            words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", text))
            needs: dict[str, list[str]] = {}
            for w in sorted(words):
                m = earlier.get(w)
                if m is not None:
                    needs.setdefault(m, []).append(w)
            imp_lines = ["from __future__ import annotations\n\n"]
            for m in order:
                if m in needs:
                    ws = ", ".join(needs[m])
                    line = f"from etl_pyspark_spark.queries.{m} import {ws}"
                    if len(line) > 79:
                        body = ",\n    ".join(needs[m])
                        line = (
                            f"from etl_pyspark_spark.queries.{m} import (\n"
                            f"    {body},\n)"
                        )
                    imp_lines.append(line + "\n")
            stubs = ""
            for sname, definer in FORWARD_STUBS.get(name, []):
                stubs += (
                    f"\n\ndef {sname}(*a, **k):\n"
                    f"    # deferred forward ref: real definition in "
                    f"queries.{definer}\n"
                    f"    from etl_pyspark_spark.queries.{definer} import (\n"
                    f"        {sname} as _real,\n    )\n\n"
                    f"    return _real(*a, **k)\n"
                )
            header = (
                f'"""Query family: {name} (mechanically split from '
                'registry.py — see core)."""\n\n'
                + "".join(imp_lines)
                + stubs
                + "\n"
            )
        with open(f"{PKG}/{name}.py", "w") as fh:
            fh.write(header + text)
        for n in defined[name]:
            if not n.startswith("<AUGASSIGN>"):
                earlier[n] = name

    # facade
    with open("etl_pyspark_spark/registry.py.facade", "w") as fh:
        fh.write(
            '"""Query registry facade: QUERIES / ORACLES over per-family '
            "modules.\n\nThe registry was a single 21.5k-line module "
            "through round 6; it is now\nsplit per family under "
            "``etl_pyspark_spark/queries/`` (r06 verdict #5),\nimported "
            "here in the ORIGINAL definition order so module-level\n"
            "registration and cross-family helper shadowing behave "
            "identically.\nEvery public (and historically reachable "
            "private) name is re-exported\nso ``from "
            "etl_pyspark_spark.registry import X`` keeps working for "
            'every X\nthe old module defined."""\n\n'
            "from __future__ import annotations\n\n"
        )
        for m in order:
            fh.write(f"from etl_pyspark_spark.queries.{m} import *  # noqa: F401,F403\n")
        # star-import skips underscore names; re-bind them explicitly
        fh.write("\n# underscore names star-import skips, re-exported for"
                 "\n# backwards compatibility (tests import several)\n")
        for m in order:
            priv = [
                n for n in dict.fromkeys(defined[m])
                if n.startswith("_") and not n.startswith("<")
                and earlier.get(n) == m
            ]
            if priv:
                ws = ",\n    ".join(priv)
                fh.write(
                    f"from etl_pyspark_spark.queries.{m} import (  # noqa: F401\n"
                    f"    {ws},\n)\n"
                )
    print("generated", len(chunks), "modules + facade")


if __name__ == "__main__":
    main()
