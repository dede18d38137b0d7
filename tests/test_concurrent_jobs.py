"""Focused tests for sinks.run_jobs_concurrently — the round-16
overlap-independent-jobs primitive every multi-sink streaming service,
index builder, and eval harness now routes through (optimization guide
§2.6). The output-equality of the call sites is pinned by the existing
streaming/crash/text suites; these tests pin the helper's own contract:
argument-order results, all-submitted-settle-then-raise error
semantics, and real overlapping Spark jobs writing disjoint tables.
"""

from __future__ import annotations

import threading
import time

import pytest

from real_time_stock_market_data_pipeline__spark.sinks import (
    run_jobs_concurrently,
)


def test_results_in_argument_order():
    # deliberately finish out of submission order
    def slow():
        time.sleep(0.2)
        return "slow"

    def fast():
        return "fast"

    assert run_jobs_concurrently(slow, fast, lambda: 3) == [
        "slow",
        "fast",
        3,
    ]


def test_single_thunk_runs_inline():
    tid = threading.get_ident()
    ran_on = []
    out = run_jobs_concurrently(lambda: ran_on.append(threading.get_ident()) or 1)
    assert out == [1]
    assert ran_on == [tid]  # no pool for the degenerate case


def test_first_error_raises_after_all_settle():
    settled = []

    def ok_then_record():
        time.sleep(0.2)
        settled.append("ok")
        return "ok"

    def boom():
        raise ValueError("sink exploded")

    with pytest.raises(ValueError, match="sink exploded"):
        run_jobs_concurrently(boom, ok_then_record)
    # the healthy job was NOT abandoned mid-flight: it settled before
    # the error propagated (no orphaned in-flight write)
    assert settled == ["ok"]


def test_concurrent_spark_writes_disjoint_tables(spark, tmp_path):
    # two independent writes into disjoint paths, submitted together —
    # the real call-site shape (multi-sink micro-batch, index builder)
    a = spark.range(100).selectExpr("id", "id * 2 AS v")
    b = spark.range(50).selectExpr("id", "id * 3 AS w")
    pa, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    run_jobs_concurrently(
        lambda: a.write.mode("overwrite").parquet(pa),
        lambda: b.write.mode("overwrite").parquet(pb),
    )
    assert spark.read.parquet(pa).count() == 100
    assert spark.read.parquet(pb).count() == 50
    assert spark.read.parquet(pb).selectExpr("sum(w)").first()[0] == sum(
        i * 3 for i in range(50)
    )
