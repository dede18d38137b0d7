"""Laws for the microstructure / feed-health operators: tick_gaps,
resample_ffill, daily_extreme_times, tick_rule, rolling_beta,
benford_digits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    q_benford_digits,
    q_daily_extreme_times,
    q_daily_metrics,
    q_resample_ffill,
    q_rolling_beta,
    q_tick_gaps,
)
from real_time_stock_market_data_pipeline__spark.operators import (
    indicators,
    temporal,
)


def _ticks(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts string, price double, id bigint"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_tick_gaps_are_consecutive_and_above_threshold(spark, sf_dir):
    gaps = q_tick_gaps(spark, sf_dir).collect()
    assert gaps, "sf0.001 events must contain >=1h gaps"
    for g in gaps:
        assert g.gap_us >= 3600 * 1_000_000
        assert g.gap_end > g.gap_start


def test_resample_ffill_grid_is_dense_and_filled(spark, sf_dir):
    out = q_resample_ffill(spark, sf_dir)
    step = 21600 * 1_000_000
    rows = sorted(
        out.collect(), key=lambda r: (r.key, r.bucket_ts)
    )
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    for key, rs in by_key.items():
        # dense regular grid, no holes
        for a, b in zip(rs, rs[1:]):
            assert (
                b.bucket_ts - a.bucket_ts
            ).total_seconds() * 1_000_000 == step, key
        # every grid cell carries a value (grid starts at first tick)
        assert all(r.value is not None for r in rs)
        # empty buckets exist and inherit the previous value
        empties = [i for i, r in enumerate(rs) if r.n_ticks == 0]
        for i in empties:
            assert i > 0
            assert rs[i].value == rs[i - 1].value


def test_resample_ffill_carries_last_tick_of_bucket(spark):
    df = _ticks(
        spark,
        [
            ("X", "2024-01-01 00:00:01", 1.0, 1),
            ("X", "2024-01-01 00:00:02", 2.0, 2),  # last of bucket 0
            # bucket 1 empty
            ("X", "2024-01-01 00:02:05", 9.0, 3),
        ],
    )
    out = temporal.resample_ffill(
        df, key_col="symbol", ts_col="ts", value_col="price",
        step_seconds=60, id_col="id",
    )
    rows = sorted(out.collect(), key=lambda r: r.bucket_ts)
    assert [r.value for r in rows] == [2.0, 2.0, 9.0]
    assert [r.n_ticks for r in rows] == [2, 0, 1]


def test_daily_extremes_match_daily_metrics(spark, sf_dir):
    ext = {
        (r.symbol, r.date): r for r in q_daily_extreme_times(spark, sf_dir).collect()
    }
    for m in q_daily_metrics(spark, sf_dir).collect():
        e = ext[(m.symbol, m.date)]
        # daily_metrics rounds to 4, extreme times to 6
        assert round(e.daily_high, 4) == pytest.approx(m.daily_high)
        assert round(e.daily_low, 4) == pytest.approx(m.daily_low)
        assert e.low_ts != e.high_ts or e.daily_high == e.daily_low


def test_tick_rule_zero_tick_inherits_direction(spark):
    df = _ticks(
        spark,
        [
            ("X", "2024-01-01 00:00:00", 10.0, 1),  # unclassified
            ("X", "2024-01-01 00:00:01", 11.0, 2),  # +1
            ("X", "2024-01-01 00:00:02", 11.0, 3),  # zero-tick -> +1
            ("X", "2024-01-01 00:00:03", 10.0, 4),  # -1
            ("X", "2024-01-01 00:00:04", 10.0, 5),  # zero-tick -> -1
        ],
    )
    out = indicators.tick_rule(df, id_col="id").collect()[0]
    assert (out.n_buy, out.n_sell, out.n_unclassified) == (2, 2, 1)
    assert out.buy_ratio == pytest.approx(0.5)


def test_rolling_beta_of_market_vs_itself_is_one(spark):
    # two symbols with identical returns: market == each symbol, beta == 1
    rows = []
    vals = [0.01, -0.02, 0.03, 0.005, -0.01, 0.02, 0.0, 0.01]
    for sym in ("A", "B"):
        for i, v in enumerate(vals):
            rows.append((sym, f"2024-01-{i + 1:02d}", v))
    daily = spark.createDataFrame(rows, "symbol string, date string, ret double")
    daily = daily.withColumn("date", F.col("date").cast("date"))
    out = indicators.rolling_beta(daily, window_days=4).collect()
    assert out, "complete windows expected"
    for r in out:
        assert r.beta == pytest.approx(1.0, abs=1e-9)


def test_rolling_beta_driver_rows_have_complete_windows(spark, sf_dir):
    out = q_rolling_beta(spark, sf_dir)
    assert out.count() > 0
    assert {r.symbol for r in out.select("symbol").distinct().collect()}


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = q_benford_digits(spark, sf_dir).collect()
    by_key: dict[str, float] = {}
    for r in rows:
        assert 1 <= r.digit <= 9
        by_key[r.key] = by_key.get(r.key, 0.0) + r.share
    for key, s in by_key.items():
        assert s == pytest.approx(1.0, abs=1e-4), key


def test_kyle_lambda_positive_and_exact_toy(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_kyle_lambda,
    )
    from real_time_stock_market_data_pipeline__spark.operators import indicators

    rows = q_kyle_lambda(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # tick-rule signs are derived from the very price moves being
        # regressed, so impact is mechanically positive
        assert r.kyle_lambda is not None and r.kyle_lambda > 0
        assert r.n_ticks >= 2
    # constructed alternating series: +2 on every up-tick, -2 on every
    # down-tick -> x in {+1,-1}, y = 2x exactly, so lambda == 2
    base = []
    p = 10.0
    for i in range(20):
        p = p + 2.0 if i % 2 == 0 else p - 2.0
        base.append(("A", f"2024-01-01 00:{i:02d}:00", p, i))
    df = (
        spark.createDataFrame(base, ["symbol", "ts", "price", "id"])
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = indicators.kyle_lambda(df, id_col="id").collect()[0]
    assert out.kyle_lambda == 2.0
    assert out.intercept == 0.0


def test_corwin_schultz_bounds_and_known_case(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_corwin_schultz,
    )
    from real_time_stock_market_data_pipeline__spark.operators import indicators

    rows = q_corwin_schultz(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.beta >= 0 and r.gamma >= 0
        assert 0.0 <= r.spread < 2.0
    # identical flat days (high == low): zero ranges -> zero spread
    flat = spark.createDataFrame(
        [("X", f"2024-01-{d:02d}", 10.0, 10.0) for d in range(1, 6)],
        "symbol string, date string, daily_high double, daily_low double",
    )
    out = indicators.corwin_schultz(flat).collect()
    assert out and all(
        r.beta == 0 and r.gamma == 0 and r.spread == 0 for r in out
    )


def test_ofi_bounds_and_consistency_with_tick_rule(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_ofi_bars,
        q_tick_rule,
    )

    bars = q_ofi_bars(spark, sf_dir).collect()
    assert bars
    for b in bars:
        assert -1.0 - 1e-9 <= b.ofi <= 1.0 + 1e-9
    # bar-level buys/sells sum to the day-level tick_rule counts
    import collections

    by_day = collections.Counter()
    for b in bars:
        by_day[(b.symbol, b.bar_start.date())] += b.n_buy - b.n_sell
    for r in q_tick_rule(spark, sf_dir).collect():
        assert by_day[(r.symbol, r.date)] == r.n_buy - r.n_sell


def test_vpin_bounds_and_one_sided_pin(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_vpin

    rows = q_vpin(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.imbalance <= 1.0
        assert 0.0 <= r.vpin <= 1.0
        assert r.n_ticks >= 1


def test_vpin_strict_uptrend_is_one(spark):
    import datetime

    from real_time_stock_market_data_pipeline__spark.operators import indicators

    rows = [
        ("X", datetime.datetime(2024, 1, 1, 10, 0, i), 100.0 + i, i)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, id long"
    )
    out = indicators.vpin(df, bucket_ticks=10, n_buckets=3).collect()
    assert out
    for r in out:
        # every classified tick is a buy; only the very first tick of
        # the day is unclassified (sign 0), diluting bucket 0 which
        # has rolled out of every surviving window or not: imbalance
        # of full-buy buckets is 1
        assert r.vpin > 0.9


def test_dollar_bars_target_notional(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import ohlcv
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "lid", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    bars = ohlcv.dollar_bars(
        li, bar_notional=20_000_000, symbol_col="l_returnflag",
        ts_col="l_shipdate", price_col="l_extendedprice",
        volume_col="l_quantity", id_col="lid",
    ).collect()
    assert bars
    # notional conservation across bars per symbol
    by_sym = {}
    for b in bars:
        by_sym.setdefault(b.symbol, 0.0)
        by_sym[b.symbol] += b.bar_notional
        assert b.bar_low <= b.bar_open <= b.bar_high
        assert b.bar_low <= b.bar_close <= b.bar_high
    want = {
        r[0]: r[1]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,6)")
                * F.col("l_quantity").cast("decimal(12,2)")
            ).cast("double")
        )
        .collect()
    }
    for sym, tot in by_sym.items():
        assert abs(tot - want[sym]) < 1.0
