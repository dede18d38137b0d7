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


def test_coverage_md_totals_sentence_matches_registry():
    # Round-8 verdict found the totals line stale (said 261 when the
    # registry was 262): parse it and compare against len(QUERIES) so
    # any future drift fails here instead of in a judge review.
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"Totals: (\d+) registered queries — (\d+) oracle-checked, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md totals sentence not found / format changed"
    n_total, n_oracle, n_rows_only = map(int, m.groups())
    assert n_total == len(dq.QUERIES), (
        f"COVERAGE.md says {n_total} registered queries, "
        f"registry has {len(dq.QUERIES)}"
    )
    assert n_oracle == len(dq.ORACLES), (
        f"COVERAGE.md says {n_oracle} oracle-checked, "
        f"ORACLES has {len(dq.ORACLES)}"
    )
    assert n_rows_only == len(dq.QUERIES) - len(dq.ORACLES)


def test_driver_window_marker_sits_at_position_50():
    # Registry order is evidence policy (the driver checks the first
    # 50 entries); round-8 advisor found 58 entries above the
    # "below this line" marker. Enforce: exactly 50 dict entries
    # precede the marker comment in the registry source.
    src = (
        Path(dq.__file__).parent / "__init__.py"
    ).read_text()
    marker = src.index("below this line")
    n_above = len(
        re.findall(r'^    "(\w+)": q_\w+,', src[:marker], re.M)
    )
    assert n_above == 50, (
        f"{n_above} registry entries sit above the driver-window "
        "marker; the driver only checks the first 50"
    )
    # and the marker must match the actual dict order
    above = re.findall(r'^    "(\w+)": q_\w+,', src[:marker], re.M)
    assert above == list(dq.QUERIES)[:50]


def test_driver_window_prioritizes_never_verified_queries():
    # The rotation policy (round-9 verdict ask #7, made a check): a
    # query that has NEVER appeared in any committed driver-window
    # artifact (CORRECTNESS_r*.json) must not be displaced from the
    # 50-slot window by a multiply-green veteran. Concretely: the
    # number of never-driver-verified queries inside the first 50
    # slots must equal min(50, total never-verified). When a new
    # round's artifact lands this test forces the next reorder.
    #
    # Only git-TRACKED artifacts count (round-10 advice): the driver
    # drops CORRECTNESS_r{N}.json into the working tree before it is
    # committed, and the tripwire should fire at the commit that
    # records the artifact, not the instant the file appears.
    import json
    import subprocess

    try:
        tracked = set(
            subprocess.run(
                ["git", "ls-files", "CORRECTNESS_r*.json"],
                cwd=REPO,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.split()
        )
    except (OSError, subprocess.CalledProcessError):
        tracked = None  # no git available: fall back to every file

    driver_verified: set[str] = set()
    for art in sorted(REPO.glob("CORRECTNESS_r*.json")):
        if tracked is not None and art.name not in tracked:
            continue
        driver_verified.update(json.loads(art.read_text()).keys())
    never = [k for k in dq.QUERIES if k not in driver_verified]
    window = list(dq.QUERIES)[:50]
    in_window = [k for k in window if k not in driver_verified]
    want = min(50, len(never))
    assert len(in_window) == want, (
        f"{len(never)} registry queries lack driver evidence but only "
        f"{len(in_window)} sit in the 50-slot window; veterans "
        f"displacing them: "
        f"{sorted(set(window) & driver_verified)[:10]}"
    )


def test_driver_window_holds_the_stalest_queries():
    # Round-15 verdict ask #7: with every registry query now
    # driver-verified at least once, the never-verified-first rule
    # above is vacuous — extend it so old evidence keeps refreshing:
    # the 50-slot window must be the 50 LEAST-RECENTLY-verified
    # queries by last driver-GREEN round (green = no error, rows
    # match, hash match where checked). Ties at the staleness
    # boundary may fall on either side, so the assertion is
    # max(last_green inside window) <= min(last_green outside).
    import json
    import subprocess

    try:
        tracked = set(
            subprocess.run(
                ["git", "ls-files", "CORRECTNESS_r*.json"],
                cwd=REPO,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.split()
        )
    except (OSError, subprocess.CalledProcessError):
        tracked = None

    last_green: dict[str, int] = {}
    for art in sorted(REPO.glob("CORRECTNESS_r*.json")):
        if tracked is not None and art.name not in tracked:
            continue
        rnd = int(art.stem.split("_r")[1])
        for name, row in json.loads(art.read_text()).items():
            green = (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("hash_match") in (True, None)
            )
            if green and rnd >= last_green.get(name, -1):
                last_green[name] = rnd
    window = list(dq.QUERIES)[:50]
    outside = list(dq.QUERIES)[50:]
    worst_in = max(last_green.get(q, -1) for q in window)
    best_out = min(last_green.get(q, -1) for q in outside)
    assert worst_in <= best_out, (
        f"window holds a query last verified in r{worst_in} while "
        f"r{best_out}-stale queries sit outside; rotate "
        f"longest-unverified-first (staler outside: "
        f"{sorted(q for q in outside if last_green.get(q, -1) < worst_in)[:10]})"
    )


def test_py_oracles_subset_of_sql_oracles():
    # A PY_ORACLES entry is a stress-SF substitute, not a replacement:
    # the driver still runs the SQL form, so both must exist.
    assert set(dq.PY_ORACLES) <= set(dq.ORACLES)
    for fn in dq.PY_ORACLES.values():
        assert callable(fn)


def test_bench_suites_are_registered_and_disjoint():
    import bench

    tiers = [
        bench.BENCH_QUERIES,
        bench.TIER2_QUERIES,
        bench.TIER3_QUERIES,
        bench.TIER4_QUERIES,
    ]
    for t in tiers:
        assert set(t) <= set(dq.QUERIES)
    for i, a in enumerate(tiers):
        for b in tiers[i + 1 :]:
            assert not set(a) & set(b)


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
