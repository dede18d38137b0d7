#!/usr/bin/env python
"""One-shot refactoring script: carve the 11k-line driver_queries.py
monolith into a package of per-family modules, preserving every
top-level name on the package (``driver_queries.QUERIES``,
``driver_queries.q_daily_metrics``, ``driver_queries._round_sql`` all
keep working).

Mechanics: sections (the ``# ---`` banner blocks) are moved WHOLE —
code is relocated, never rewritten — so the full oracle sweep and
PLANS.md must come out identical. Cross-section helper references
(e.g. indicators' oracles reusing ``_DAILY_CLOSE_CTE``) become
explicit ``from .other import name`` lines, auto-derived from an AST
scan; the assignment below was chosen so those imports form a DAG.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

SRC = Path("real_time_stock_market_data_pipeline__spark/driver_queries.py")
PKG = Path("real_time_stock_market_data_pipeline__spark/driver_queries")

# section index -> module name (section 0 = the shared-SQL block after
# the header; -1 = the header itself; the last section is the registry)
ASSIGN = {
    -1: "_shared", 0: "_shared",
    1: "ohlcv", 2: "ohlcv",
    3: "dedup",
    4: "sources_cleaning", 8: "sources_cleaning",
    12: "sources_cleaning", 13: "sources_cleaning",
    5: "relational", 6: "relational", 17: "relational",
    22: "relational", 34: "relational",
    7: "similarity",
    9: "text", 10: "text", 16: "text", 23: "text", 33: "text", 38: "text",
    11: "multimodal", 29: "multimodal", 39: "multimodal",
    14: "indicators", 21: "indicators", 25: "indicators", 28: "indicators",
    15: "behavior", 26: "behavior", 31: "behavior", 41: "behavior",
    43: "behavior", 44: "behavior",
    18: "streaming", 30: "streaming",
    19: "microstructure", 20: "microstructure",
    24: "crosssection", 37: "crosssection",
    27: "drift", 40: "drift", 42: "drift",
    32: "mlprep", 35: "mlprep", 36: "mlprep",
    45: "__init__",
}

# import order written into __init__ (must be a topological order of
# the cross-module dependency DAG)
MODULE_ORDER = [
    "ohlcv", "dedup", "similarity", "relational", "indicators",
    "drift", "text", "sources_cleaning", "multimodal", "behavior",
    "microstructure", "streaming", "mlprep", "crosssection",
]

DOCS = {
    "ohlcv": "OHLCV daily metrics + dual sliding-window realtime metrics.",
    "dedup": "Deduplication family: exact, keep-last, MinHash-LSH, "
             "SimHash, clustering, incremental index.",
    "similarity": "Embedding similarity: brute/ANN/IVF top-k, kNN join, "
                  "quantize/outliers, PCA/JL.",
    "relational": "TPC-H-ish relational surface: joins, merge-upsert, "
                  "set ops, pivot/rollup, CDC.",
    "indicators": "Technical indicators over the daily-close series.",
    "drift": "Distribution drift: KS/PSI/chi-square, series, "
             "calibration, Ljung-Box, projections.",
    "text": "Text analysis and the training-corpus pipeline.",
    "sources_cleaning": "Cleaning/projection queries + partition-pruned "
                        "scan, provider ingest, kafka wire codec.",
    "multimodal": "Binary media plumbing: decode, resize, audio frames, "
                  "corpus report.",
    "behavior": "User-behavior analytics: funnels, cohorts, attribution, "
                "churn, graph rank.",
    "microstructure": "Market microstructure, feed health, forensics, "
                      "TWAP/profiling.",
    "streaming": "Structured Streaming queries (drained availableNow "
                 "with batch oracles).",
    "mlprep": "ML data prep: splits, balancing, feature hashing, "
              "leakage-free matrices.",
    "crosssection": "Calendar/cross-sectional analytics, classifier "
                    "eval, cohort LTV, bars.",
}

if not SRC.exists():
    sys.exit(
        "already applied: driver_queries.py was split into the "
        "driver_queries/ package by this script (round 8); kept for "
        "provenance only"
    )

src = SRC.read_text()
lines = src.splitlines(keepends=True)
SEP = re.compile(r"^# -{10,}")

starts = []
i = 0
while i < len(lines):
    if SEP.match(lines[i]):
        j = i + 1
        while j < len(lines) and lines[j].startswith("#") and not SEP.match(lines[j]):
            j += 1
        if j < len(lines) and SEP.match(lines[j]):
            starts.append(i)
            i = j + 1
            continue
    i += 1

bounds = {-1: (0, starts[0])}
for k, ln in enumerate(starts):
    bounds[k] = (ln, starts[k + 1] if k + 1 < len(starts) else len(lines))
assert set(ASSIGN) <= set(bounds), sorted(set(ASSIGN) - set(bounds))
assert set(bounds) <= set(ASSIGN), sorted(set(bounds) - set(ASSIGN))

# --- gather per-module section text, in original order -----------------
module_text: dict[str, list[str]] = {}
for sec in sorted(bounds):
    a, b = bounds[sec]
    module_text.setdefault(ASSIGN[sec], []).append("".join(lines[a:b]))

# --- top-level name -> module, via AST ---------------------------------
tree = ast.parse(src)


def sec_of(line0: int) -> int:
    for k, (a, b) in bounds.items():
        if a <= line0 < b:
            return k
    raise AssertionError(line0)


def node_names(node: ast.stmt) -> list[str]:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        return [t.id for t in node.targets if isinstance(t, ast.Name)]
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        return [(a.asname or a.name).split(".")[0] for a in node.names]
    return []


name_module: dict[str, str] = {}
for node in tree.body:
    mod = ASSIGN[sec_of(node.lineno - 1)]
    for n in node_names(node):
        name_module[n] = mod

shared_names = sorted(n for n, m in name_module.items() if m == "_shared")

# --- per-module referenced global names -> explicit cross imports ------
class Refs(ast.NodeVisitor):
    def __init__(self):
        self.names: set[str] = set()

    def visit_Name(self, n: ast.Name):  # noqa: N802
        if isinstance(n.ctx, ast.Load):
            self.names.add(n.id)


mod_refs: dict[str, set[str]] = {}
for node in tree.body:
    mod = ASSIGN[sec_of(node.lineno - 1)]
    v = Refs()
    v.visit(node)
    mod_refs.setdefault(mod, set()).update(v.names)

cross_imports: dict[str, dict[str, list[str]]] = {}
for mod, refs in mod_refs.items():
    if mod in ("_shared", "__init__"):
        continue
    need: dict[str, list[str]] = {}
    for nm in sorted(refs & set(name_module)):
        owner = name_module[nm]
        if owner not in (mod, "_shared", "__init__"):
            need.setdefault(owner, []).append(nm)
    if need:
        cross_imports[mod] = need

# cycle check over the explicit imports
order_idx = {m: i for i, m in enumerate(MODULE_ORDER)}
for mod, need in cross_imports.items():
    for owner in need:
        assert order_idx[owner] < order_idx[mod], (
            f"dependency {mod} <- {owner} breaks MODULE_ORDER"
        )

# --- emit --------------------------------------------------------------
PKG.mkdir(exist_ok=True)

shared_all = ",\n    ".join(f'"{n}"' for n in shared_names)
shared_src = "".join(module_text["_shared"]) + (
    "\n\n#: everything here (helpers, SQL fragments, the import surface)\n"
    "#: is re-exported into every family module via `from ._shared import *`\n"
    f"__all__ = [\n    {shared_all},\n]\n"
)
(PKG / "_shared.py").write_text(shared_src)

for mod in MODULE_ORDER:
    header = (
        f'"""{DOCS[mod]}\n\n'
        "Split out of the original single-file driver_queries module; "
        "sections\nare verbatim (code moved, not rewritten) so oracle "
        "parity is untouched.\n\"\"\"\n\n"
        "from __future__ import annotations\n\n"
        "from real_time_stock_market_data_pipeline__spark.driver_queries"
        "._shared import *  # noqa: F401,F403\n"
    )
    for owner, names in sorted(cross_imports.get(mod, {}).items()):
        names_s = ",\n    ".join(names)
        header += (
            f"from real_time_stock_market_data_pipeline__spark"
            f".driver_queries.{owner} import (  # noqa: F401\n"
            f"    {names_s},\n)\n"
        )
    own = sorted(
        n for n, m in name_module.items() if m == mod
    )
    all_s = ",\n    ".join(f'"{n}"' for n in own)
    body = "".join(module_text[mod])
    (PKG / f"{mod}.py").write_text(
        header + "\n\n" + body + f"\n\n__all__ = [\n    {all_s},\n]\n"
    )

init_header = (
    '"""Driver-facing query registry (package form).\n\n'
    "The original single-file module grew past 11k lines; it is now a\n"
    "package of per-family modules whose public surface is unchanged:\n"
    "``driver_queries.QUERIES`` / ``driver_queries.ORACLES`` plus every\n"
    "``q_*`` callable and oracle constant, star-imported below in\n"
    "dependency order. The registry dicts at the bottom keep their\n"
    "original driver-window ordering.\n"
    '"""\n\n'
    "from __future__ import annotations\n\n"
    "from real_time_stock_market_data_pipeline__spark.driver_queries"
    "._shared import *  # noqa: F401,F403\n"
)
for mod in MODULE_ORDER:
    init_header += (
        f"from real_time_stock_market_data_pipeline__spark"
        f".driver_queries.{mod} import *  # noqa: F401,F403\n"
    )
registry_body = "".join(module_text["__init__"])
(PKG / "__init__.py").write_text(init_header + "\n\n" + registry_body)

SRC.unlink()
print("wrote", PKG, "with", len(MODULE_ORDER) + 2, "modules")
for p in sorted(PKG.glob("*.py")):
    print(f"  {p.name:22s} {len(p.read_text().splitlines()):5d} lines")
