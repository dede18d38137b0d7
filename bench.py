#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion through the ``noop`` sink (full
plan runs, nothing collected to the driver), which is the honest
executor-side cost — a ``collect()`` would add driver serialization
that a real pipeline doesn't pay.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

#: One representative per operator family (SURVEY §2 + extensions).
#: Streaming queries are excluded (they need checkpoint dirs and a
#: sink; bench measures pure executor-side query cost), as are the
#: pandas-UDF paths (media_features, cosine_topk_fast) so the headline
#: stays a JVM-plan number.
BENCH_QUERIES = [
    # OHLCV / window metrics
    "daily_metrics",
    "daily_metrics_lineitem",
    "daily_returns",
    "topk_movers",
    "realtime_metrics",
    "active_users_hourly",
    "value_quantiles",
    # dedup family
    "dedup_exact",
    "dedup_keep_last",
    "dedup_minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    # cleaning / relational / TPC-H-ish
    "tick_cast",
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "shipping_priority",
    "merge_upsert",
    "asof_join",
    "salted_join",
    # temporal
    "range_join_bands",
    "cascade_rollup",
    "sessionize",
    # similarity
    "cosine_topk",
    "ann_topk",
    "ivf_topk",
    "embedding_neardup_pairs",
    # text analysis
    "text_stats",
    "token_count",
    "term_stats",
    "lang_id",
    "doc_fingerprint",
    "hash_split",
    "chunk_documents",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    from real_time_stock_market_data_pipeline__spark import driver_queries
    from real_time_stock_market_data_pipeline__spark.session import get_spark

    spark = get_spark("rtsmdp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed section
    driver_queries.QUERIES["daily_metrics"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # Per-query isolation: one broken query must not destroy the whole
    # bench signal — it gets an "err" entry and a 0-cost timing instead.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        try:
            fn = driver_queries.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — bench must always emit
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # A failed query must not flatter the headline: with any error the
    # sum of the surviving timings is NOT comparable to an all-green
    # run, so `value` goes null and `failed_queries` says why.
    total = round(sum(timings.values()), 3) if not errors else None
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "failed_queries": len(errors),
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
