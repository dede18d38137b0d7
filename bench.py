#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
TWO JSON lines — a detailed one with every per-query timing at full
precision, then a COMPACT line LAST with the totals plus a
byte-budget-filtered per-query dict (0.1 s rounding, no spaces):

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, ...}
    {"metric": "...", "value": N, "unit": "sec", "tier2_total": ..,
     "calib_sec": .., "calib_tiers": {...}, "queries": {...},
     "compact": true, ...}

The compact line exists because the driver records only the final
~2000 chars of stdout: BENCH_r15's five-tier detailed line outgrew
that capture and the headline ``value`` was truncated away
(``parsed: null``), and BENCH_r16's totals-only compact line left
``PERF_r16.per_query`` empty. Round 17: the compact line carries the
per-query timings itself, dropping the globally smallest entries
until it fits the tail with margin (the dropped sub-second rows stay
in the detailed first line).

Calibration runs BEFORE tier 1 (``calib_sec``, the comparable
pre-round-16 key) and again AFTER EVERY TIER (``calib_tiers``):
rounds 14/15 showed equal pre-run calib with 1.7–1.9× tier inflation,
proving one probe cannot see contention that arrives mid-run.

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

#: Second tier, added round 8: the round-6/7 families (iterative graph,
#: CDC/SCD2, streaming stateful, corpus-ops, drift, high-fanout window
#: shapes) so regressions where the registry now lives show up in
#: BENCH_r{N}. Kept SEPARATE from BENCH_QUERIES so the headline
#: ``value`` stays sum-comparable with the round-3 self-baseline
#: (BASELINE.md); this tier reports its own ``tier2_total``.
TIER2_QUERIES = [
    # iterative / driver-paced loops
    "event_pagerank",
    "markov_absorption",
    "hierarchy",
    # CDC / SCD2
    "cdc_apply",
    "scd2_lookup",
    # streaming stateful (runs its drained availableNow query inside)
    "stream_bloom_dedup",
    # corpus-pipeline operational shell
    "corpus_report",
    "minhash_accuracy",
    "cluster_split",
    "hashed_bow",
    # drift monitoring / calibration
    "threshold_calibration",
    "drift_series",
    # high-fanout window / explode shapes
    "rolling_median",
    "dau_wau",
    "session_funnel",
    "volume_bars",
]

#: Third tier, added round 9: that round's new surface (stdlib PNG /
#: AIFF container decode, int8 scalar-quantized ANN, deterministic
#: HLL), so the newest operators get a perf baseline the round they
#: land instead of joining a frozen tier late. Same bookkeeping
#: conventions as tier 2: own total, own failure count.
TIER3_QUERIES = [
    "png_decode",
    "gif_decode",
    "aiff_decode",
    "ulaw_decode",
    "sq8_topk",
    "pq_topk",
    "hll_distinct",
    "semantic_dedup",
    "semantic_dedup_incremental",
    "stream_semantic_screen",
]

#: Round-13 additions (retrieval/selection layer + their at-rest and
#: streaming twins). Own tier so tiers 1-3 stay comparable to their
#: frozen anchors; round 13's BENCH artifact is THIS tier's anchor.
TIER4_QUERIES = [
    "bm25_topk",
    "bm25_topk_indexed",
    "stream_bm25_topk",
    "dsir_weights",
    "bq_topk",
    "bq_topk_indexed",
    "neardup_screen",
    "stream_neardup_screen",
    "bpe_train",
    "bpe_token_count",
]

#: Round-14 additions (hybrid retrieval, the ANN recall panel, the
#: iterative k-means trainer, the composed curation audit, and the
#: three foreachBatch streaming services). Own tier so tiers 1-4 stay
#: comparable to their frozen anchors; round 15's BENCH artifact is
#: THIS tier's anchor (round-14 verdict ask #4 — without it a
#: regression on these queries was invisible to BENCH_r{N}).
TIER5_QUERIES = [
    "rrf_hybrid_topk",
    "ann_recall_sweep",
    "kmeans_train",
    "curation_verdicts",
    "stream_contrastive_pairs",
    "stream_dsir_weights",
    "stream_curation_verdicts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    from real_time_stock_market_data_pipeline__spark import driver_queries
    from real_time_stock_market_data_pipeline__spark.session import (
        default_parallelism,
        get_spark,
        scale_profile,
    )

    # A/B flag: SPARK_GRAFT_SCALE_PROFILE=1 builds the session through
    # scale_profile()'s sizing math (AQE advisory sizes, broadcast
    # threshold, skew factors, zstd, RocksDB state) applied at the
    # LOCAL cluster shape — the sanity check that the 100 TB profile's
    # formulas don't regress a small suite. Both totals are recorded in
    # BASELINE.md's self-measured section.
    use_profile = os.environ.get("SPARK_GRAFT_SCALE_PROFILE", "") == "1"
    extra = (
        scale_profile(executors=1, executor_cores=default_parallelism())
        if use_profile
        else None
    )
    spark = get_spark("rtsmdp-bench", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed section
    driver_queries.QUERIES["daily_metrics"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # Machine-calibration probe (round 9): a FIXED pure-JVM workload
    # with no I/O and no Python — the same codegen'd range-agg every
    # round — so host-speed drift between bench environments is a
    # measured number, not an inference. Round 9 found builder-side
    # tier totals drifting ~35% between sessions on an idle machine;
    # comparing `calib_sec` across BENCH artifacts separates that VM
    # drift from genuine query regressions (query_time / calib_sec is
    # the machine-independent comparator). Median of three runs.
    def _calibrate() -> float:
        samples = []
        for _ in range(3):
            t0 = time.time()
            # bounded terms: a raw id product overflows int64 under
            # ANSI mode at this row count
            spark.range(1 << 33).selectExpr(
                "sum((id % 1000) * (id % 7)) AS s"
            ).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return round(sorted(samples)[1], 3)

    calib_sec = _calibrate()

    # Per-query isolation: one broken query must not destroy the whole
    # bench signal — it gets an "err" entry and a 0-cost timing instead.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def run_tier(names: list[str]) -> tuple[float | None, int]:
        tier_total = 0.0
        n_failed = 0
        for name in names:
            try:
                fn = driver_queries.QUERIES[name]
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                timings[name] = round(time.time() - t0, 3)
                tier_total += timings[name]
            except Exception as exc:  # noqa: BLE001 — bench must always emit
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                n_failed += 1
        return (round(tier_total, 3) if not n_failed else None), n_failed

    # A failed query must not flatter its tier total: the sum of the
    # surviving timings is NOT comparable to an all-green run, so the
    # tier total goes null and its failure count says why. `value`
    # remains the ORIGINAL 34-query headline so it stays comparable
    # with the round-3 self-baseline; tier2 covers the round-6/7
    # families under its own total. Failure counts are PER TIER
    # (`failed_queries` = tier 1 only, matching the pre-round-8
    # invariant failed_queries > 0 ⟺ value = null; tier 2 reports
    # its own `tier2_failed_queries`).
    # Per-tier calibration (round 16): one probe per tier boundary so a
    # contention burst that lands mid-run is attributable to the tier
    # it inflated, instead of being invisible behind an idle pre-run
    # probe (the BENCH_r14/r15 failure mode).
    calib_tiers: dict[str, float] = {}
    total, n_failed_t1 = run_tier(BENCH_QUERIES)
    calib_tiers["t1"] = _calibrate()
    tier2_total, n_failed_t2 = run_tier(TIER2_QUERIES)
    calib_tiers["t2"] = _calibrate()
    tier3_total, n_failed_t3 = run_tier(TIER3_QUERIES)
    calib_tiers["t3"] = _calibrate()
    tier4_total, n_failed_t4 = run_tier(TIER4_QUERIES)
    calib_tiers["t4"] = _calibrate()
    tier5_total, n_failed_t5 = run_tier(TIER5_QUERIES)
    calib_tiers["t5"] = _calibrate()
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "tier2_total": tier2_total,
        "tier3_total": tier3_total,
        "tier4_total": tier4_total,
        "tier5_total": tier5_total,
        "calib_sec": calib_sec,
        "calib_tiers": calib_tiers,
        "scale_profile": use_profile,
        "failed_queries": n_failed_t1,
        "tier2_failed_queries": n_failed_t2,
        "tier3_failed_queries": n_failed_t3,
        "tier4_failed_queries": n_failed_t4,
        "tier5_failed_queries": n_failed_t5,
        "sf": sf,
    }
    result = dict(compact)
    result["queries"] = timings
    if errors:
        result["errors"] = errors
    # Detailed line first (full precision, every query — the
    # pre-round-16 record, unchanged), then the compact totals line
    # LAST, now carrying a budget-filtered per-query dict (round-16
    # verdict ask #2 — per-query driver visibility was lost when the
    # detailed line outgrew the ~2000-char tail the driver keeps).
    # The per-query data rides the FINAL line itself — the format the
    # driver demonstrably parsed per_query from in rounds ≤ 14 (one
    # JSON line with a "queries" key) — rather than the separate
    # per-tier lines the verdict sketched, whose parsing is unproven;
    # the totals line is still last and still well-formed.
    print(json.dumps(result))
    compact["compact"] = True
    if errors:
        compact["error_queries"] = sorted(errors)[:10]

    # 0.1 s rounding, no spaces. All 77 names + values don't quite
    # fit the tail next to the totals, so retention is
    # byte-budget-aware: drop the globally SMALLEST timings (pure
    # fixed overhead at sf0.1, never the attribution targets) until
    # the line fits with margin. The dropped queries' full-precision
    # timings remain in the detailed first line above.
    def _fmt(v: float) -> float | int:
        v = round(v, 1)
        return int(v) if v == int(v) else v

    sel = dict(timings)

    def _render() -> str:
        compact["queries"] = {n: _fmt(v) for n, v in sel.items()}
        return json.dumps(compact, separators=(",", ":"))

    final_line = _render()
    while sel and len(final_line) + 1 > 1900:
        del sel[min(sel, key=sel.get)]
        final_line = _render()
    print(final_line)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
