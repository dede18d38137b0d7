"""Registry drift lint: PLANS.md, COVERAGE.md, bench.py and the
QUERIES/ORACLES dicts are kept in sync by regeneration scripts and by
hand; these asserts make the "every registered query is oracle-checked
and plan-audited" claim self-enforcing — adding a query without its
PLANS.md row or COVERAGE.md mention fails CI instead of silently
shrinking the evidence surface.

No SparkSession needed: pure text/dict checks.
"""

from __future__ import annotations

import re
from pathlib import Path

from real_time_stock_market_data_pipeline__spark import driver_queries as dq

REPO = Path(__file__).resolve().parent.parent


def test_queries_and_oracles_keys_match():
    assert set(dq.QUERIES) == set(dq.ORACLES)


def test_every_query_has_plans_md_row():
    rows = {
        m.group(1)
        for m in re.finditer(
            r"^\| (\w+) \|", (REPO / "PLANS.md").read_text(), re.M
        )
        if m.group(1) != "query"
    }
    missing = set(dq.QUERIES) - rows
    stale = rows - set(dq.QUERIES)
    assert not missing, f"queries missing from PLANS.md: {sorted(missing)}"
    assert not stale, f"stale PLANS.md rows: {sorted(stale)}"


def test_every_query_mentioned_in_coverage_md():
    text = (REPO / "COVERAGE.md").read_text()
    mentioned = set(re.findall(r"`(\w+)`", text))
    missing = set(dq.QUERIES) - mentioned
    assert not missing, f"queries missing from COVERAGE.md: {sorted(missing)}"


def test_bench_suites_are_registered_and_disjoint():
    import bench

    assert set(bench.BENCH_QUERIES) <= set(dq.QUERIES)
    assert set(bench.TIER2_QUERIES) <= set(dq.QUERIES)
    assert not set(bench.BENCH_QUERIES) & set(bench.TIER2_QUERIES)


def test_registry_callables_named_after_keys():
    # q_<key> naming is what lets VERDICT/COVERAGE cite functions by
    # key; a mismatched rename would silently break those citations
    for key, fn in dq.QUERIES.items():
        assert callable(fn), key
        name = getattr(fn, "__name__", "")
        assert name == f"q_{key}" or name.startswith("load_") or key in name, (
            key,
            name,
        )


def test_family_modules_export_disjoint_names():
    # __init__ star-imports every family module; a name defined in two
    # would silently shadow depending on import order. Keep exports
    # pairwise disjoint (cross-module imports are excluded: __all__
    # lists only section-defined names).
    import ast as _ast
    import real_time_stock_market_data_pipeline__spark.driver_queries as pkg

    pkg_dir = Path(pkg.__file__).parent
    owners: dict[str, str] = {}
    clashes = []
    for mod in sorted(pkg_dir.glob("*.py")):
        if mod.name in ("__init__.py", "_shared.py"):
            continue
        tree = _ast.parse(mod.read_text())
        exported = None
        for node in tree.body:
            if (
                isinstance(node, _ast.Assign)
                and any(
                    isinstance(t, _ast.Name) and t.id == "__all__"
                    for t in node.targets
                )
            ):
                exported = [c.value for c in node.value.elts]
        assert exported is not None, f"{mod.name} lacks __all__"
        for name in exported:
            if name in owners:
                clashes.append((name, owners[name], mod.name))
            owners[name] = mod.name
    assert not clashes, f"duplicate exports across family modules: {clashes}"
