#!/usr/bin/env python
"""Targeted bench: time a comma-separated list of registered queries
with bench.py's exact methodology (noop sink, warmup, calibration
probe) without running the full tiers — for chasing per-query drift
against a prior BENCH artifact's figures at matched calib.

Usage: python scripts/bench_only.py q1,q2,... [--repeat N]
Prints one JSON line {"calib_sec": .., "queries": {...}} (with
--repeat, per-query values are the MEDIAN of N timed runs).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    from real_time_stock_market_data_pipeline__spark import driver_queries
    from real_time_stock_market_data_pipeline__spark.session import get_spark

    spark = get_spark("rtsmdp-bench-only")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        driver_queries.QUERIES["daily_metrics"](
            spark, args.sf_dir
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        # partial fixtures (documents/embeddings-only scale dirs) lack
        # events.parquet; a pure-JVM warmup still JITs the write path
        spark.range(1 << 24).selectExpr("sum(id) AS s").write.format(
            "noop"
        ).mode("overwrite").save()

    def calibrate() -> float:
        samples = []
        for _ in range(3):
            t0 = time.time()
            spark.range(1 << 33).selectExpr(
                "sum((id % 1000) * (id % 7)) AS s"
            ).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return round(sorted(samples)[1], 3)

    calib = calibrate()
    out: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(max(1, args.repeat)):
            t0 = time.time()
            driver_queries.QUERIES[name](spark, args.sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = round(sorted(samples)[len(samples) // 2], 3)
        spread[name] = [round(s, 3) for s in samples]
    print(json.dumps({"calib_sec": calib, "queries": out,
                      "samples": spread,
                      "sf_dir": args.sf_dir, "repeat": args.repeat}))
    spark.stop()


if __name__ == "__main__":
    main()
