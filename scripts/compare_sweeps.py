#!/usr/bin/env python
"""Compare two `check_correctness.py --json` artifacts: status flips,
time ratios, and the slowest queries — the tool behind the
"no query >Nx its smaller-SF time" scale audit.

Usage: python scripts/compare_sweeps.py BASE.json BIG.json [--ratio 10]
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("big")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--min-sec", type=float, default=1.0,
                    help="ignore ratio breaches under this absolute time")
    args = ap.parse_args()

    base = json.load(open(args.base))["queries"]
    big = json.load(open(args.big))["queries"]

    flips = [
        (n, base.get(n, {}).get("status"), big.get(n, {}).get("status"))
        for n in sorted(set(base) | set(big))
        if base.get(n, {}).get("status") != big.get(n, {}).get("status")
        and "skipped" not in str(big.get(n, {}).get("status"))
    ]
    for n, a, b in flips:
        print(f"STATUS {n}: {a} -> {b}")

    breaches = []
    for n, r in big.items():
        b = base.get(n)
        if not b or r["status"] != "pass" or b["status"] != "pass":
            continue
        if r["sec"] >= args.min_sec and b["sec"] > 0 and r["sec"] / b["sec"] > args.ratio:
            breaches.append((r["sec"] / b["sec"], n, b["sec"], r["sec"]))
    for ratio, n, bs, rs in sorted(breaches, reverse=True):
        print(f"RATIO  {n}: {bs:.1f}s -> {rs:.1f}s ({ratio:.1f}x)")

    slow = sorted(
        ((n, r) for n, r in big.items() if "sec" in r),
        key=lambda kv: -kv[1]["sec"],
    )[:10]
    print("slowest at big SF: " + ", ".join(f"{n} {r['sec']:.0f}s" for n, r in slow))
    tb = sum(r.get("sec", 0) for r in base.values())
    tg = sum(r.get("sec", 0) for r in big.values())
    print(f"totals: base {tb:.0f}s, big {tg:.0f}s "
          f"({tg / tb:.1f}x for the SF step)")
    return 1 if flips else 0


if __name__ == "__main__":
    raise SystemExit(main())
