#!/usr/bin/env python
"""Reconstruct a check_correctness --json artifact from its console log
(PASS/FAIL lines), for sweeps interrupted before the final write.

Usage: python scripts/sweep_log_to_json.py SWEEP.log SF_DIR OUT.json
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log, sf_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    results: dict[str, dict] = {}
    text = open(log, errors="replace").read()
    for m in re.finditer(
        r"PASS  (\w+): (\d+) rows, ([\d.]+)s", text
    ):
        results[m.group(1)] = {
            "status": "pass",
            "rows": int(m.group(2)),
            "sec": float(m.group(3)),
        }
    for m in re.finditer(r"FAIL  (\w+): (.+)", text):
        results[m.group(1)] = {
            "status": "fail",
            "problems": [m.group(2).strip()[:300]],
        }
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_fail = len(results) - n_pass
    json.dump(
        {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "queries": results,
            "note": f"reconstructed from {log}",
        },
        open(out, "w"),
        indent=1,
    )
    print(f"{out}: {n_pass} pass / {n_fail} fail ({len(results)} queries)")


if __name__ == "__main__":
    main()
