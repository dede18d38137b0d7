"""Laws for the feed-health / quant-estimator operators:
interarrival_stats, duplicate_ticks, intraday_vol, roll_spread."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import (
    indicators,
    temporal,
)


def _ticks(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts string, price double, id bigint"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_interarrival_stats_exact_small_case(spark):
    # gaps for A: 10s, 20s, 30s  -> mean 20s, min 10s, max 30s
    df = _ticks(
        spark,
        [
            ("A", "2024-01-01 00:00:00", 1.0, 1),
            ("A", "2024-01-01 00:00:10", 1.0, 2),
            ("A", "2024-01-01 00:00:30", 1.0, 3),
            ("A", "2024-01-01 00:01:00", 1.0, 4),
            ("B", "2024-01-01 00:00:00", 1.0, 5),
        ],
    )
    out = {
        r.key: r
        for r in temporal.interarrival_stats(
            df, key_col="symbol", ts_col="ts", id_col="id"
        ).collect()
    }
    a = out["A"]
    assert a.n_gaps == 3
    assert a.mean_gap_us == 20_000_000.0
    assert a.min_gap_us == 10_000_000
    assert a.max_gap_us == 30_000_000
    # sample stddev of (10,20,30)s = 10s
    assert a.stddev_gap_us == 10_000_000.0
    # quantile_disc picks actual values
    assert a.p5_gap_us in (10_000_000, 20_000_000)
    assert a.p95_gap_us == 30_000_000
    # a single-tick key has no gaps at all
    assert "B" not in out


def test_interarrival_large_gaps_no_overflow(spark):
    # day-scale gaps: (86400s)^2 in us^2 overflows int64; the DECIMAL
    # moment path must survive where a BIGINT sum would ANSI-throw.
    df = _ticks(
        spark,
        [
            ("A", "2024-01-01 00:00:00", 1.0, 1),
            ("A", "2024-01-02 00:00:00", 1.0, 2),
            ("A", "2024-01-04 00:00:00", 1.0, 3),
        ],
    )
    row = temporal.interarrival_stats(
        df, key_col="symbol", ts_col="ts", id_col="id"
    ).collect()[0]
    day_us = 86_400 * 1_000_000
    assert row.n_gaps == 2
    assert row.mean_gap_us == 1.5 * day_us
    # sample stddev of (1d, 2d) = d/sqrt(2)
    assert abs(row.stddev_gap_us - day_us / math.sqrt(2)) < 1.0


def test_duplicate_ticks_flags_only_multi_event_cells(spark):
    df = _ticks(
        spark,
        [
            ("A", "2024-01-01 00:00:01", 1.0, 1),
            ("A", "2024-01-01 00:00:59", 2.0, 2),  # same minute as id 1
            ("A", "2024-01-01 00:01:30", 3.0, 3),  # alone in its minute
            ("B", "2024-01-01 00:00:30", 4.0, 4),  # same minute, other key
        ],
    )
    out = temporal.duplicate_ticks(
        df, key_col="symbol", ts_col="ts", id_col="id", granularity="minute"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.key, r.n_dups, r.first_id, r.last_id) == ("A", 2, 1, 2)


def test_intraday_vol_single_return_exact(spark):
    # one return of ln(121/100); rv = lr^2, vol = |lr|
    df = _ticks(
        spark,
        [
            ("A", "2024-01-01 10:00:00", 100.0, 1),
            ("A", "2024-01-01 11:00:00", 121.0, 2),
        ],
    )
    r = indicators.intraday_vol(
        df, symbol_col="symbol", ts_col="ts", price_col="price", id_col="id"
    ).collect()[0]
    lr = round(math.log(121.0 / 100.0), 6)
    assert r.n_returns == 1
    assert r.realized_var == round(lr * lr, 6)
    assert r.realized_vol == round(abs(lr), 6)


def test_intraday_vol_guards_nonpositive_prices(spark):
    df = _ticks(
        spark,
        [
            ("A", "2024-01-01 10:00:00", 0.0, 1),
            ("A", "2024-01-01 11:00:00", 100.0, 2),
            ("A", "2024-01-01 12:00:00", 110.0, 3),
        ],
    )
    r = indicators.intraday_vol(
        df, symbol_col="symbol", ts_col="ts", price_col="price", id_col="id"
    ).collect()[0]
    # only the 100->110 pair classifies; the 0-price pair is skipped
    assert r.n_returns == 1


def test_roll_spread_bid_ask_bounce_recovers_spread(spark):
    # perfect bounce around mid 100 with half-spread 0.5:
    # prices alternate 99.5, 100.5 -> dp alternates +1, -1,
    # serial cov = -1 (in the n-1 normalization with mean ~0),
    # roll spread estimate = 2*sqrt(1) = 2*half_spread*2 ... for the
    # textbook infinite series it converges to the full spread 1.0.
    prices = [99.5, 100.5] * 12
    rows = [
        ("A", f"2024-01-01 10:{i:02d}:00", p, i) for i, p in enumerate(prices)
    ]
    r = indicators.roll_spread(
        _ticks(spark, rows),
        symbol_col="symbol",
        ts_col="ts",
        price_col="price",
        id_col="id",
    ).collect()[0]
    assert r.n_pairs == len(prices) - 2
    assert r.serial_cov < 0
    # cov of alternating ±1 series ≈ -(slightly more than 1) under the
    # sample (n-1) normalization; spread = 2*sqrt(-cov) ≈ 2.0
    assert abs(r.roll_spread - 2.0) < 0.15


def test_roll_spread_trending_prices_yield_null(spark):
    # monotone random-walk-free trend: dp always +1 -> serial cov >= 0
    rows = [
        ("A", f"2024-01-01 10:{i:02d}:00", 100.0 + i, i) for i in range(10)
    ]
    r = indicators.roll_spread(
        _ticks(spark, rows),
        symbol_col="symbol",
        ts_col="ts",
        price_col="price",
        id_col="id",
    ).collect()[0]
    assert r.roll_spread is None
