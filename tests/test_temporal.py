"""Range join and cascading rollup: semantics vs the naive form, and
the plan properties that make them scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark import plans
from real_time_stock_market_data_pipeline__spark.operators import temporal
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def _bands(spark, n=10, w=50.0):
    return spark.range(n).select(
        F.col("id").alias("band"),
        (F.col("id") * w).alias("lo"),
        ((F.col("id") + 1) * w).alias("hi"),
    )


def test_range_join_equals_naive_theta_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = _bands(spark)
    fast = temporal.range_join(ev, bands, "value", "lo", "hi", bucket_width=50.0)
    naive = ev.join(
        bands, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    cols = sorted(fast.columns)
    assert sorted(map(tuple, fast.select(*cols).collect())) == sorted(
        map(tuple, naive.select(*cols).collect())
    )


def test_range_join_no_nested_loop(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    fast = temporal.range_join(
        ev, _bands(spark), "value", "lo", "hi", bucket_width=50.0
    )
    plans.assert_no_cartesian(fast)


def test_range_join_bucket_width_invariance(spark, sf_dir):
    # quantization granularity must never change the result
    ev = load_table(spark, sf_dir, "events").select("event_id", "value").limit(500)
    bands = _bands(spark)
    rows = None
    for w in (7.0, 50.0, 400.0):
        got = sorted(
            map(
                tuple,
                temporal.range_join(ev, bands, "value", "lo", "hi", w)
                .select("event_id", "band")
                .collect(),
            )
        )
        assert rows is None or got == rows
        rows = got


def test_range_join_rejects_column_overlap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    with pytest.raises(ValueError, match="overlapping"):
        temporal.range_join(
            ev, ev.select("value", "event_id"), "value", "value", "event_id", 1.0
        )


def test_cascade_rollup_levels_consistent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = temporal.cascade_rollup(ev, "ts", "event_type", "value").cache()
    try:
        # every level totals the same row population
        per_level = {
            r["level"]: (r["rows"], r["total"])
            for r in out.groupBy("level")
            .agg(
                F.sum("n").alias("rows"),
                F.sum(F.col("total_value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        }
        assert len({v for v in per_level.values()}) == 1
        # day level == aggregating raw at day granularity directly
        direct_day = (
            ev.groupBy(
                F.col("event_type").alias("key"),
                F.date_trunc("day", "ts").alias("bucket_start"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )
        cols = ["key", "bucket_start", "n", "total_value", "min_value", "max_value"]
        assert sorted(
            map(tuple, out.filter(F.col("level") == "day").select(*cols).collect())
        ) == sorted(map(tuple, direct_day.select(*cols).collect()))
    finally:
        out.unpersist()


def test_cascade_rollup_scans_raw_once(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = temporal.cascade_rollup(ev, "ts", "event_type", "value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one physical scan feeds all levels (fan-out happens on partials)
    assert plan.count("Scan parquet") == 1


def test_sessionize_gap_laws(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    gap_s = 1800
    out = temporal.sessionize(ev, "user_id", "ts", "event_id", gap_s).cache()
    try:
        # sessions partition the events: counts add up
        assert (
            out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
        )
        # consecutive sessions of one key are separated by > gap
        # (session N+1 starts more than gap after session N ends)
        from pyspark.sql import Window

        w = Window.partitionBy("key").orderBy("session_id")
        viol = (
            out.withColumn("prev_end", F.lag("session_end").over(w))
            .filter(
                F.col("prev_end").isNotNull()
                & (
                    F.unix_micros("session_start") - F.unix_micros("prev_end")
                    <= gap_s * 1_000_000
                )
            )
            .count()
        )
        assert viol == 0
        # session ids are 1..n per key, no holes
        ids = out.groupBy("key").agg(
            F.min("session_id").alias("lo"),
            F.max("session_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        assert ids.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0
    finally:
        out.unpersist()


def test_intraday_bars_roll_up_to_daily(spark, sf_dir):
    """Bars re-aggregate exactly to the daily rollup: max of bar highs
    == daily high, earliest bar open == daily open (round commutes
    with min/max; the open/close are the same ticks)."""
    from real_time_stock_market_data_pipeline__spark.operators import ohlcv
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    kw = dict(symbol_col="event_type", ts_col="ts", price_col="value",
              id_col="event_id")
    bars = ohlcv.intraday_bars(ev, bar_seconds=300, **kw)
    daily = {
        (r["symbol"], str(r["date"])): r
        for r in ohlcv.daily_metrics(ev, **kw).collect()
    }
    rolled = (
        bars.groupBy(
            "symbol", F.to_date("bar_start").alias("date")
        )
        .agg(
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.min_by("open", F.col("bar_start")).alias("open"),
            F.max_by("close", F.col("bar_start")).alias("close"),
            F.sum("volume").alias("volume"),
        )
        .collect()
    )
    assert rolled
    for r in rolled:
        d = daily[(r["symbol"], str(r["date"]))]
        assert r["high"] == d["daily_high"] and r["low"] == d["daily_low"]
        assert r["open"] == d["daily_open"] and r["close"] == d["daily_close"]
        assert r["volume"] == d["daily_volume"]


def test_peak_concurrency_hand_case(spark):
    import datetime

    from real_time_stock_market_data_pipeline__spark.operators import temporal

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def iv(s, e):
        return (
            "k",
            t0 + datetime.timedelta(minutes=s),
            t0 + datetime.timedelta(minutes=e),
        )

    # [0,10], [5,15], [12,20]: pairwise overlaps but never all three
    # -> peak 2, first reached at minute 5
    df = spark.createDataFrame(
        [iv(0, 10), iv(5, 15), iv(12, 20)],
        "key string, session_start timestamp, session_end timestamp",
    )
    row = temporal.peak_concurrency(df).collect()[0]
    assert row.peak_concurrency == 2
    assert row.peak_first_at == t0 + datetime.timedelta(minutes=5)


def test_peak_concurrency_touching_endpoints_overlap(spark):
    import datetime

    from real_time_stock_market_data_pipeline__spark.operators import temporal

    t0 = datetime.datetime(2024, 1, 1)
    # closed intervals: [0,5] and [5,10] DO overlap at instant 5
    df = spark.createDataFrame(
        [
            ("k", t0, t0 + datetime.timedelta(seconds=5)),
            ("k", t0 + datetime.timedelta(seconds=5), t0 + datetime.timedelta(seconds=10)),
        ],
        "key string, session_start timestamp, session_end timestamp",
    )
    row = temporal.peak_concurrency(df).collect()[0]
    assert row.peak_concurrency == 2


def test_resample_interp_hand_case(spark):
    import datetime

    from real_time_stock_market_data_pipeline__spark.operators import temporal

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", t0, 1, 10.0),
        # gap of two empty 1-minute cells, then an observation at 30.0
        ("k", t0 + datetime.timedelta(minutes=3), 2, 40.0),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, event_id long, value double"
    )
    out = {
        r.bucket_ts.minute: r
        for r in temporal.resample_interp(
            df, "key", "ts", "value", step_seconds=60, id_col="event_id"
        ).collect()
    }
    assert out[0].value == 10.0 and out[0].is_observed == 1
    # linear between 10 at min 0 and 40 at min 3
    assert abs(out[1].value - 20.0) < 1e-9 and out[1].is_observed == 0
    assert abs(out[2].value - 30.0) < 1e-9
    assert out[3].value == 40.0 and out[3].is_observed == 1
