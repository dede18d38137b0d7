#!/usr/bin/env python
"""Merge a delta `check_correctness.py --json` artifact into a base
sweep artifact.

Use case: a full sweep takes ~1.7 h at stress SF; when a query lands
mid-sweep, re-running everything to add one row is wasteful and
re-times 260+ unchanged queries under different machine load. Instead
run `check_correctness.py --only <new...> --json delta.json` under the
same conditions and fold it in here. The merge is mechanical (no
hand-edited numbers): per-query rows are copied verbatim, the summary
counters are recomputed from the merged rows, and a `merged_note`
records what came from where.

Usage:
  python scripts/merge_sweep_delta.py BASE.json DELTA.json --note "..."
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("delta")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    base = json.load(open(args.base))
    delta = json.load(open(args.delta))

    added, replaced = [], []
    for name, row in delta["queries"].items():
        (replaced if name in base["queries"] else added).append(name)
        base["queries"][name] = row

    statuses = [r.get("status") for r in base["queries"].values()]
    base["n_pass"] = sum(s in ("pass", "rows_only") for s in statuses)
    base["n_fail"] = sum(s == "fail" for s in statuses)
    base["n_skipped"] = sum(
        r.get("pandas_leg") == "skipped_oom" for r in base["queries"].values()
    )
    base["merged_note"] = (
        f"rows for {sorted(added + replaced)} merged from a follow-up "
        f"--only run ({args.note})" if args.note
        else f"rows for {sorted(added + replaced)} merged from a follow-up --only run"
    )
    with open(args.base, "w") as f:
        json.dump(base, f, indent=1)
    print(
        f"merged {len(added)} new + {len(replaced)} replaced rows into "
        f"{args.base}: n_pass={base['n_pass']} n_fail={base['n_fail']} "
        f"n_skipped={base['n_skipped']} total={len(base['queries'])}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
