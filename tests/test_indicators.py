"""Laws for the technical-indicator operators (operators.indicators).

The bit-exact oracle equivalence lives in the driver gate
(`scripts/check_correctness.py`); these tests pin the *semantic*
invariants that an oracle mismatch alone would not localize.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    _daily_close,
    q_bollinger,
    q_drawdown,
    q_ema_macd,
    q_pairwise_correlation,
    q_rsi,
    q_sma_crossover,
)
from real_time_stock_market_data_pipeline__spark.operators import indicators


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    df = _daily_close(spark, sf_dir)
    df.cache().count()
    return df


def test_sma_signal_matches_sign(spark, sf_dir):
    rows = q_sma_crossover(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect = (r.sma_short > r.sma_long) - (r.sma_short < r.sma_long)
        assert r.signal == expect
        assert r.cross in (-1, 0, 1)


def test_sma_warmup_rows_dropped(daily):
    out = indicators.sma_crossover(daily, short=3, long=7, close_col="close")
    per_sym_in = {r.symbol: r.n for r in daily.groupBy("symbol").agg(F.count("*").alias("n")).collect()}
    per_sym_out = {
        r.symbol: r.n
        for r in out.groupBy("symbol").agg(F.count("*").alias("n")).collect()
    }
    for sym, n_in in per_sym_in.items():
        assert per_sym_out.get(sym, 0) == max(0, n_in - 6)


def test_bollinger_band_ordering(spark, sf_dir):
    for r in q_bollinger(spark, sf_dir).collect():
        assert r.bb_lower <= r.bb_mid <= r.bb_upper
        # %B is the close's position inside the band
        if r.pct_b is not None and 0 <= r.pct_b <= 1:
            assert r.bb_lower - 1e-6 <= r.close <= r.bb_upper + 1e-6


def test_rsi_bounds_and_flat_series(spark, sf_dir):
    rows = q_rsi(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.rsi <= 100.0 for r in rows)
    # constant series → no gains, no losses → RSI pegs at 100 by convention
    flat = spark.createDataFrame(
        [("X", f"2024-01-{d:02d}", 10.0) for d in range(1, 21)],
        "symbol string, date string, close string",
    ).select("symbol", F.col("date").cast("date").alias("date"), F.col("close").cast("double").alias("close"))
    out = indicators.rsi(flat, n=5, close_col="close").collect()
    assert out and all(r.rsi == 100.0 for r in out)


def test_drawdown_nonpositive_and_peak_monotone(spark, sf_dir):
    rows = q_drawdown(spark, sf_dir).collect()
    assert rows
    peaks: dict[str, float] = {}
    for r in sorted(rows, key=lambda r: (r.symbol, r.date)):
        assert r.drawdown <= 0.0
        assert r.close <= r.peak_close
        if r.symbol in peaks:
            assert r.peak_close >= peaks[r.symbol]
        peaks[r.symbol] = r.peak_close


def test_pairwise_correlation_bounds_and_self_corr(spark, sf_dir, daily):
    rows = q_pairwise_correlation(spark, sf_dir).collect()
    n_sym = daily.select("symbol").distinct().count()
    assert len(rows) == n_sym * (n_sym - 1) // 2
    assert all(-1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9 for r in rows if r.corr is not None)
    # a series correlates perfectly with itself: feed two copies
    twin = daily.select("symbol", "date", "close").union(
        daily.select(F.concat(F.col("symbol"), F.lit("~b")).alias("symbol"), "date", "close")
    )
    out = {
        (r.symbol_a, r.symbol_b): r.corr
        for r in indicators.pairwise_correlation(twin, close_col="close").collect()
    }
    for r in daily.select("symbol").distinct().collect():
        assert out[(r.symbol, r.symbol + "~b")] == pytest.approx(1.0, abs=1e-9)


def test_ema_macd_identity_and_seed(spark, sf_dir):
    rows = q_ema_macd(spark, sf_dir).collect()
    by_sym: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.symbol, r.date)):
        by_sym.setdefault(r.symbol, []).append(r)
    for series in by_sym.values():
        first = series[0]
        # seed: both EMAs start at close₀, so macd and signal start at 0
        assert first.ema_fast == first.ema_slow == round(first.close, 6)
        assert first.macd == 0.0 and first.macd_signal == 0.0
        for r in series:
            assert math.isclose(r.macd, r.ema_fast - r.ema_slow, abs_tol=2e-6)
            assert math.isclose(r.macd_hist, r.macd - r.macd_signal, abs_tol=2e-6)


def test_ema_converges_to_constant():
    # EMA of a constant series is that constant, every span
    import pandas as pd  # noqa: F401  (applyInPandas path)

    from real_time_stock_market_data_pipeline__spark.session import get_spark

    spark = get_spark("rtsmdp-tests", shuffle_partitions=8)
    flat = spark.createDataFrame(
        [("X", f"2024-02-{d:02d}", 42.0) for d in range(1, 28)],
        "symbol string, date string, close double",
    ).select("symbol", F.col("date").cast("date").alias("date"), "close")
    out = indicators.ema_macd(flat, close_col="close").collect()
    assert out
    for r in out:
        assert r.ema_fast == 42.0 and r.ema_slow == 42.0
        assert r.macd == 0.0 and r.macd_signal == 0.0 and r.macd_hist == 0.0


def test_atr_dominates_daily_range(spark, sf_dir):
    """TR ≥ high-low by construction, so ATR ≥ 0 and every TR must be
    at least that day's range; hand-check the gap-day case."""
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_atr

    rows = q_atr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.tr >= 0 and r.atr >= 0

    base = [
        ("A", "2024-01-01", 10.0, 8.0, 9.0),
        ("A", "2024-01-02", 20.0, 19.0, 19.5),  # gap up: TR from prev close
    ]
    df = spark.createDataFrame(
        base, ["symbol", "date", "daily_high", "daily_low", "daily_close"]
    ).withColumn("date", F.col("date").cast("date"))
    out = {r["date"].isoformat(): r for r in indicators.atr(df, n=1).collect()}
    assert out["2024-01-01"]["tr"] == 2.0  # first day: high - low
    assert out["2024-01-02"]["tr"] == 11.0  # |high - prev_close| dominates


def test_obv_telescopes_to_signed_sum(spark, sf_dir):
    """Final OBV per symbol == sum of its signed volumes; flat/first
    days contribute zero."""
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_obv

    df = q_obv(spark, sf_dir)
    final = df.groupBy("symbol").agg(
        F.max_by("obv", "date").alias("last_obv"),
        F.sum("signed_volume").alias("total_signed"),
    )
    for r in final.collect():
        assert r.last_obv == r.total_signed
    firsts = df.groupBy("symbol").agg(F.min_by("signed_volume", "date").alias("sv"))
    assert all(r.sv == 0 for r in firsts.collect())


def test_stochastic_bounds_and_extremes(spark, sf_dir):
    """%K and %D live in [0, 100]; closing exactly at the window's
    extreme pins %K to the bound."""
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_stochastic,
    )

    rows = q_stochastic(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.pct_k is not None:
            assert 0.0 <= r.pct_k <= 100.0
        if r.pct_d is not None:
            assert 0.0 <= r.pct_d <= 100.0

    base = [
        ("A", f"2024-01-{d:02d}", 10.0 + d, 8.0 + d, 10.0 + d) for d in range(1, 6)
    ]
    df = spark.createDataFrame(
        base, ["symbol", "date", "daily_high", "daily_low", "daily_close"]
    ).withColumn("date", F.col("date").cast("date"))
    out = indicators.stochastic_oscillator(df, n=3, d_periods=2)
    # close == rolling max(high) every day -> %K pinned at 100
    for r in out.collect():
        assert r.pct_k == 100.0
        assert r.pct_d == 100.0


def test_donchian_channel_bounds_and_breakout(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_donchian

    rows = q_donchian(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lower <= r.mid <= r.upper
        # close always sits inside the channel that includes today
        assert r.lower - 1e-9 <= r.close <= r.upper + 1e-9
        assert r.breakout in (-1, 0, 1)
    # constructed series: flat 10s, then a close above every prior
    # high fires +1, a close below every prior low fires -1
    bars = [("X", f"2024-01-{d:02d}", 10.0, 10.5, 9.5, 10.0) for d in range(1, 11)]
    bars.append(("X", "2024-01-11", 10.0, 12.0, 10.0, 11.9))
    bars.append(("X", "2024-01-12", 11.0, 11.0, 8.0, 8.2))
    toy = spark.createDataFrame(
        bars,
        "symbol string, date string, daily_open double, daily_high double,"
        " daily_low double, daily_close double",
    )
    out = {r.date: r.breakout for r in indicators.donchian(toy, n=5).collect()}
    assert out["2024-01-11"] == 1
    assert out["2024-01-12"] == -1
    assert out["2024-01-10"] == 0


def test_amihud_positive_and_counts(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_amihud

    rows = q_amihud(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.amihud >= 0
        assert r.n_days >= 1


def test_return_autocorr_bounds_and_perfect_series(spark, sf_dir, daily):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_return_autocorr,
    )

    for r in q_return_autocorr(spark, sf_dir).collect():
        if r.autocorr is not None:
            assert -1 - 1e-9 <= r.autocorr <= 1 + 1e-9
    # lag-0 self-correlation of any non-constant return series is 1
    out = indicators.return_autocorr(daily, lag=0, close_col="close").collect()
    assert out
    for r in out:
        if r.autocorr is not None:
            assert abs(r.autocorr - 1.0) < 1e-6


def test_ohlc_volatility_nonnegative_and_flat_zero(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_ohlc_volatility,
    )

    rows = q_ohlc_volatility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.park_vol_annual >= 0
        assert r.gk_vol_annual >= 0
    # a flat OHLC series has zero range ⇒ both estimators exactly 0
    flat = spark.createDataFrame(
        [("X", f"2024-01-{d:02d}", 10.0, 10.0, 10.0, 10.0) for d in range(1, 11)],
        "symbol string, date string, daily_open double, daily_high double,"
        " daily_low double, daily_close double",
    )
    out = indicators.ohlc_volatility(flat).collect()
    assert out[0].park_vol_annual == 0.0
    assert out[0].gk_vol_annual == 0.0


def test_return_streaks_partition_and_signs(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_return_streaks,
    )

    rows = q_return_streaks(spark, sf_dir).collect()
    assert rows
    total_days = 0
    for r in rows:
        assert r.direction in (-1, 1)
        assert r.length >= 1
        assert r.streak_start <= r.streak_end
        # streak return sign agrees with direction
        if r.streak_return is not None:
            assert (r.streak_return > 0) == (r.direction == 1)
        total_days += r.length
    # streaks partition the non-flat return days: no overlaps
    spans = sorted((r.symbol, r.streak_start, r.streak_end) for r in rows)
    for (s1, a1, b1), (s2, a2, b2) in zip(spans, spans[1:]):
        if s1 == s2:
            assert b1 < a2


def test_heikin_ashi_candle_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_daily_metrics,
        q_heikin_ashi,
    )

    rows = {
        (r.symbol, r.date): r for r in q_heikin_ashi(spark, sf_dir).collect()
    }
    assert rows
    daily = {
        (r.symbol, r.date): r for r in q_daily_metrics(spark, sf_dir).collect()
    }
    assert set(rows) == set(daily)
    for key, r in rows.items():
        # HA candle envelope contains its own open/close
        assert r.ha_low <= min(r.ha_open, r.ha_close) + 1e-9
        assert r.ha_high >= max(r.ha_open, r.ha_close) - 1e-9
        # and the raw bar's high/low bound it
        assert r.ha_high >= daily[key].daily_high - 1e-9
        assert r.ha_low <= daily[key].daily_low + 1e-9
        assert r.direction in (-1, 0, 1)
        if r.ha_close > r.ha_open:
            assert r.direction == 1
    # first day seeds ha_open at the bar midpoint
    by_sym = {}
    for (sym, d), r in rows.items():
        by_sym.setdefault(sym, []).append((d, r))
    for sym, series in by_sym.items():
        d0, r0 = min(series)
        bar = daily[(sym, d0)]
        assert r0.ha_open == pytest.approx(
            (bar.daily_open + bar.daily_close) / 2, abs=1e-6
        )


def test_weekly_bars_envelope_and_day_partition(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_daily_metrics,
        q_weekly_bars,
    )

    weekly = q_weekly_bars(spark, sf_dir).collect()
    assert weekly
    n_daily = q_daily_metrics(spark, sf_dir).count()
    assert sum(r.n_days for r in weekly) == n_daily
    for r in weekly:
        assert r.low <= min(r.open, r.close) + 1e-9
        assert r.high >= max(r.open, r.close) - 1e-9
        assert r.week_start.weekday() == 0  # ISO weeks start Monday
        assert 1 <= r.n_days <= 7


def test_momentum_rank_is_dense_per_date(spark, sf_dir):
    from collections import defaultdict

    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_momentum_rank,
    )

    rows = q_momentum_rank(spark, sf_dir).collect()
    assert rows
    by_date = defaultdict(list)
    for r in rows:
        by_date[r.date].append(r)
    for day_rows in by_date.values():
        ranks = sorted(r.rank for r in day_rows)
        assert ranks == list(range(1, len(day_rows) + 1))
        # rank order follows momentum order
        by_rank = sorted(day_rows, key=lambda r: r.rank)
        for a, b in zip(by_rank, by_rank[1:]):
            assert a.mom_5d >= b.mom_5d


def test_portfolio_index_compounds_day_means(spark, sf_dir):
    import math

    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_portfolio_index,
    )

    rows = sorted(q_portfolio_index(spark, sf_dir).collect(), key=lambda r: r.date)
    assert rows
    acc = 0.0
    for r in rows:
        acc += round(math.log(1 + r.mean_ret), 6)
        assert abs(r.cum_log_growth - acc) < 1e-4
        assert r.n_symbols >= 1


def test_underwater_spells_partition_drawdown_days(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_drawdown,
        q_underwater_spells,
    )

    spells = q_underwater_spells(spark, sf_dir).collect()
    assert spells
    dd_rows = q_drawdown(spark, sf_dir).collect()
    n_under = sum(
        1 for r in dd_rows if r.drawdown is not None and r.drawdown < 0
    )
    assert sum(r.n_days for r in spells) == n_under
    for r in spells:
        assert r.spell_start <= r.spell_end
        assert r.max_depth < 0
        assert isinstance(r.recovered, bool)
    # spells never overlap within a symbol
    spans = sorted((r.symbol, r.spell_start, r.spell_end) for r in spells)
    for (s1, a1, b1), (s2, a2, b2) in zip(spans, spans[1:]):
        if s1 == s2:
            assert b1 < a2
    # the spell running to a symbol's last underwater day with no
    # later peak is unrecovered
    last = {}
    for r in sorted(spells, key=lambda r: (r.symbol, r.spell_end)):
        last[r.symbol] = r
    by_sym_last_date = {}
    for r in dd_rows:
        d = by_sym_last_date.get(r.symbol)
        if d is None or r.date > d:
            by_sym_last_date[r.symbol] = r.date
    for sym, spell in last.items():
        if spell.spell_end == by_sym_last_date[sym]:
            assert spell.recovered is False


def test_sharpe_sortino_laws(spark, sf_dir, daily):
    out = indicators.sharpe_sortino(daily, close_col="close").collect()
    assert out
    for r in out:
        # downside deviation can never exceed the full stddev by much:
        # it omits the positive deviations but is divided by the same
        # n-1; for a mean near 0 it is bounded by std (loose sanity).
        assert r.downside_dev is None or r.downside_dev >= 0
        if r.std_return and r.sharpe_annual is not None:
            assert math.isclose(
                r.sharpe_annual,
                round(r.mean_return / r.std_return * math.sqrt(252), 2),
                abs_tol=0.05,
            )
        # Sortino >= Sharpe when mean > 0 (downside_dev <= std for
        # these symmetric-ish synthetic returns is not a law, so only
        # check the sign relationship)
        if r.sharpe_annual is not None and r.sortino_annual is not None:
            assert (r.sharpe_annual > 0) == (r.sortino_annual > 0)


def test_sharpe_sortino_hand_case(spark):
    import datetime

    rows = [
        ("X", datetime.date(2024, 1, 1 + i), c)
        for i, c in enumerate([100.0, 110.0, 99.0, 108.9])
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.sharpe_sortino(df, close_col="close").collect()[0]
    # returns: +0.1, -0.1, +0.1  -> mean = 0.1/3
    assert out.n_returns == 3
    assert math.isclose(out.mean_return, 0.033333, abs_tol=1e-6)
    # downside: only -0.1 -> sqrt(0.01 / 2)
    assert math.isclose(out.downside_dev, math.sqrt(0.01 / 2), abs_tol=1e-5)
    assert out.sortino_annual > out.sharpe_annual > 0


def test_var_cvar_laws(spark, sf_dir, daily):
    out = indicators.var_cvar(daily, alpha_pct=5, close_col="close").collect()
    assert out
    for r in out:
        # CVaR (mean of the k worst returns) can never exceed VaR
        # (the best of those k returns).
        assert r.cvar_5pct <= r.var_5pct + 1e-9
        # k = ceil(0.05 * n), always >= 1
        assert r.k_tail == -(-r.n_returns * 5 // 100)
        assert r.k_tail >= 1


def test_var_cvar_hand_case(spark):
    import datetime

    closes = [100.0]
    # 20 returns: -10%, then +1% nineteen times
    closes.append(closes[-1] * 0.9)
    for _ in range(19):
        closes.append(closes[-1] * 1.01)
    rows = [
        ("X", datetime.date(2024, 1, 1) + datetime.timedelta(days=i), c)
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.var_cvar(df, alpha_pct=5, close_col="close").collect()[0]
    # n=20 returns, k = ceil(1.0) = 1 -> VaR = CVaR = worst return = -10%
    assert out.n_returns == 20
    assert out.k_tail == 1
    assert math.isclose(out.var_5pct, -0.1, abs_tol=1e-6)
    assert math.isclose(out.cvar_5pct, -0.1, abs_tol=1e-6)


def test_adx_bounds_and_trend(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_adx

    rows = q_adx(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for v in (r.di_plus, r.di_minus, r.adx):
            if v is not None:
                assert -1e-9 <= v <= 100 + 1e-9


def test_adx_pure_uptrend_has_zero_minus_di(spark):
    import datetime

    # strictly rising bars: every day's high/low above yesterday's
    rows = [
        (
            "X",
            datetime.date(2024, 1, 1 + i),
            102.0 + 2 * i,  # high
            100.0 + 2 * i,  # low
            101.0 + 2 * i,  # close
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, date date, daily_high double, daily_low double, daily_close double"
    )
    out = indicators.adx(df, n=14).orderBy("date").collect()
    # -DM is 0 every day -> di_minus == 0 after day 1, dx == 100,
    # adx == 100 once seeded
    for r in out[1:]:
        assert r.di_minus == 0.0
        assert r.di_plus > 0
        assert r.adx == 100.0


def test_trend_ols_exact_line(spark):
    import datetime

    # perfectly linear series -> slope 2, intercept 100, r2 == 1
    rows = [
        ("X", datetime.date(2024, 1, 1 + i), 100.0 + 2.0 * i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    r = indicators.trend_ols(df, close_col="close").collect()[0]
    assert r.n_days == 10
    assert abs(r.slope - 2.0) < 1e-9
    assert abs(r.intercept - 100.0) < 1e-9
    assert abs(r.r2 - 1.0) < 1e-9


def test_trend_ols_flat_series_null_r2(spark):
    import datetime

    rows = [("X", datetime.date(2024, 1, 1 + i), 50.0) for i in range(5)]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    r = indicators.trend_ols(df, close_col="close").collect()[0]
    assert r.slope == 0.0
    assert r.r2 is None


def test_hurst_bounds_and_columns(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_hurst

    rows = q_hurst(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # R/S averages are positive where defined; H plausibly in (0, 1.5)
        for v in (r.rs_4, r.rs_8, r.rs_16):
            assert v is None or v > 0
        if r.hurst is not None:
            assert -0.5 < r.hurst < 1.5


def test_hurst_trending_beats_alternating(spark):
    import datetime

    # strictly trending closes vs strictly alternating ones: the
    # trending series must score a (much) higher Hurst exponent
    base = datetime.date(2024, 1, 1)
    # persistent deviations: the return itself drifts upward, so
    # within every block the cumulative mean-deviation sweeps a wide
    # range (constant returns would give zero std and drop the block)
    closes, c = [], 100.0
    for i in range(65):
        closes.append(c)
        c *= 1.0 + 0.001 * i
    trend = [
        ("T", base + datetime.timedelta(days=i), closes[i]) for i in range(65)
    ]
    alt = [
        ("A", base + datetime.timedelta(days=i), 100.0 + (5.0 if i % 2 else -5.0))
        for i in range(65)
    ]
    df = spark.createDataFrame(
        trend + alt, "symbol string, date date, close double"
    )
    out = {r.symbol: r for r in indicators.hurst_rs(df, close_col="close").collect()}
    assert out["T"].hurst is not None and out["A"].hurst is not None
    assert out["T"].hurst > out["A"].hurst


def test_seasonal_decompose_reconstruction(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_seasonal_decompose,
    )

    rows = q_seasonal_decompose(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # additive identity up to the two 4-dp roundings
        assert abs(r.close - (r.trend + r.seasonal + r.resid)) < 2e-4


def test_candle_patterns_hand_cases(spark):
    import datetime

    rows = [
        # day 1: bearish candle (o=110 > c=100)
        ("X", datetime.date(2024, 1, 1), 110.0, 112.0, 98.0, 100.0),
        # day 2: bullish engulfing (o=99 <= pc=100, c=111 >= po=110)
        ("X", datetime.date(2024, 1, 2), 99.0, 113.0, 97.0, 111.0),
        # day 3: doji (body 0.2 <= 0.1 * range 4)
        ("X", datetime.date(2024, 1, 3), 100.0, 102.0, 98.0, 100.2),
        # day 4: hammer, not doji (lower shadow 9 >= 2*body 2,
        # upper shadow 0.3 <= 2; body 2 > 0.1*range 1.13)
        ("X", datetime.date(2024, 1, 4), 100.0, 102.3, 91.0, 102.0),
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, date date, daily_open double, daily_high double,"
        " daily_low double, daily_close double",
    )
    out = {r.date.day: r for r in indicators.candle_patterns(df).collect()}
    assert out[2].bull_engulf == 1 and out[2].bear_engulf == 0
    assert out[3].doji == 1
    assert out[4].hammer == 1 and out[4].doji == 0
    assert out[1].bull_engulf == 0  # no previous candle


def test_rank_portfolio_bucket_counts(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_rank_portfolio,
    )

    rows = q_rank_portfolio(spark, sf_dir).collect()
    assert rows
    per_date = {}
    for r in rows:
        per_date.setdefault(r.date, []).append(r)
        assert 1 <= r.bucket <= 3
    for date, group in per_date.items():
        # ntile spreads the symbols across buckets, sizes differ by <= 1
        sizes = [g.n_symbols for g in group]
        assert max(sizes) - min(sizes) <= 1


def test_calendar_coverage_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_calendar_coverage,
    )

    for r in q_calendar_coverage(spark, sf_dir).collect():
        assert r.days_present <= r.span_days
        assert 0 < r.coverage_ratio <= 1.0
        assert r.longest_gap_days >= 0
        if r.days_present == r.span_days:
            assert r.longest_gap_days == 0


def test_event_study_offsets_complete(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_event_study,
    )

    rows = {r.off: r for r in q_event_study(spark, sf_dir).collect()}
    assert set(rows) <= {-2, -1, 0, 1, 2}
    for r in rows.values():
        assert r.n_obs >= 1
        assert r.mean_return is not None


# ---------------------------------------------------------------------------
# Round-7 batch: channel oscillators, flow indicators, gaps, VWAP
# ---------------------------------------------------------------------------


def _ohlcv_df(spark, bars):
    import datetime

    rows = [
        ("X", datetime.date(2024, 1, 1) + datetime.timedelta(days=i), o, h, l, c, v)
        for i, (o, h, l, c, v) in enumerate(bars)
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, date date, daily_open double, daily_high double, "
        "daily_low double, daily_close double, daily_volume long",
    )


def test_williams_r_bounds_and_pins(spark):
    bars = [(100.0, 110.0, 90.0, 100.0 + i, 10) for i in range(6)]
    # last close printed at the channel high -> %R = 0; at the low -> -100
    bars.append((100.0, 110.0, 90.0, 110.0, 10))
    bars.append((100.0, 110.0, 90.0, 90.0, 10))
    out = indicators.williams_r(_ohlcv_df(spark, bars), n=3).orderBy("date").collect()
    assert out
    for r in out:
        assert -100 - 1e-9 <= r.pct_r <= 1e-9
        assert r.ll <= r.close <= r.hh or r.pct_r in (0.0, -100.0)
    assert out[-2].pct_r == 0.0
    assert out[-1].pct_r == -100.0


def test_roc_momentum_exact(spark, daily):
    out = indicators.roc_momentum(daily, n=5, close_col="close")
    joined = {(r.symbol, r.date): r for r in out.collect()}
    assert joined
    for r in joined.values():
        assert math.isclose(r.momentum, round(r.close - r.ref_close, 6), abs_tol=1e-9)
        if r.ref_close:
            assert math.isclose(
                r.roc, round(100.0 * (r.close / r.ref_close - 1), 6), abs_tol=1e-4
            )


def test_mfi_bounds_and_all_up_pin(spark):
    # monotone rising typical price -> all flow positive -> MFI = 100
    bars = [(100.0, 101.0 + i, 99.0 + i, 100.0 + i, 10) for i in range(8)]
    out = indicators.mfi(_ohlcv_df(spark, bars), n=4).collect()
    assert out
    for r in out:
        assert -1e-9 <= r.mfi <= 100 + 1e-9
        assert r.mfi == 100.0
        assert r.neg_flow_sum == 0.0


def test_cmf_bounds(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_cmf

    rows = q_cmf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.cmf is not None:
            # the multiplier is in [-1, 1] so CMF is too
            assert -1 - 1e-9 <= r.cmf <= 1 + 1e-9


def test_ulcer_flat_series_is_zero(spark):
    bars = [(100.0, 100.0, 100.0, 100.0, 10)] * 30
    out = indicators.ulcer_index(
        _ohlcv_df(spark, bars), n=5, close_col="daily_close"
    ).collect()
    assert out
    for r in out:
        assert r.ulcer_index == 0.0
        assert r.dd_pct == 0.0


def test_ulcer_nonnegative(spark, daily):
    for r in indicators.ulcer_index(daily, n=5, close_col="close").collect():
        assert r.ulcer_index >= 0
        assert r.dd_pct <= 1e-9


def test_keltner_band_ordering(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_keltner

    rows = q_keltner(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kc_lower <= r.kc_mid <= r.kc_upper


def test_gap_stats_hand_case(spark):
    bars = [
        (100.0, 105.0, 95.0, 100.0, 10),
        # gap up 2% that fills (low trades back through 100)
        (102.0, 106.0, 99.0, 104.0, 10),
        # gap down that does NOT fill (high stays below prev close 104)
        (101.0, 103.0, 100.0, 102.0, 10),
        # no gap
        (102.0, 103.0, 101.0, 102.5, 10),
    ]
    out = indicators.gap_stats(_ohlcv_df(spark, bars)).orderBy("date").collect()
    assert [r.gap_dir for r in out] == [1, -1, 0]
    assert [r.gap_filled for r in out] == [1, 0, 1]
    assert math.isclose(out[0].gap_pct, 2.0, abs_tol=1e-9)


def test_aroon_bounds_and_new_high_pin(spark):
    # strictly rising highs: every day is the n-period high -> aroon_up = 100
    bars = [(100.0, 100.0 + i, 90.0 - i, 95.0, 10) for i in range(15)]
    out = indicators.aroon(_ohlcv_df(spark, bars), n=5).collect()
    assert out
    for r in out:
        assert abs(r.aroon_up - 100.0) < 1e-9  # today is always the high
        assert abs(r.aroon_down - 100.0) < 1e-9  # and the low (falling lows)
    rows = indicators.aroon(_ohlcv_df(spark, [(100.0, 100.0, 90.0, 95.0, 10)] * 12), n=5).collect()
    for r in rows:
        # flat series: ties resolve to the most recent bar
        assert 0 - 1e-9 <= r.aroon_up <= 100 + 1e-9
        assert r.aroon_osc == 0.0


def test_cci_flat_window_is_null_and_symmetry(spark):
    flat = [(100.0, 100.0, 100.0, 100.0, 10)] * 25
    out = indicators.cci(_ohlcv_df(spark, flat), n=5).collect()
    assert out
    for r in out:
        assert r.cci is None  # zero mean deviation
        assert r.mean_dev == 0.0


def test_cci_matches_definition_small(spark):
    import datetime

    closes = [100.0, 102.0, 101.0, 104.0, 103.0, 106.0, 105.0]
    bars = [(c, c + 1, c - 1, c, 10) for c in closes]
    out = indicators.cci(_ohlcv_df(spark, bars), n=3).orderBy("date").collect()
    # hand-verify the last row: tps are the closes (high+low+close)/3 = close
    tps = closes
    window = tps[-3:]
    sma = round(sum(window) / 3, 6)
    md = round(sum(abs(t - sma) for t in window) / 3, 6)
    expect = round((tps[-1] - sma) / (0.015 * md), 6)
    last = out[-1]
    assert math.isclose(last.cci, expect, abs_tol=1e-6)
    assert len(out) == len(closes) - 2


def test_vwap_unit_volume_is_mean_and_hand_case(spark):
    import datetime

    rows = [
        ("X", datetime.datetime(2024, 1, 1, 10, 0), 100.0, 2.0),
        ("X", datetime.datetime(2024, 1, 1, 11, 0), 110.0, 1.0),
        ("X", datetime.datetime(2024, 1, 2, 10, 0), 50.0, 0.0),
    ]
    from real_time_stock_market_data_pipeline__spark.operators import ohlcv

    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, volume double"
    )
    out = {r.date.isoformat(): r for r in ohlcv.vwap_daily(df).collect()}
    # (100*2 + 110*1) / 3
    assert math.isclose(out["2024-01-01"].vwap, 310.0 / 3, abs_tol=1e-6)
    assert out["2024-01-01"].n_trades == 2
    # zero-volume day falls back to the unweighted mean
    assert math.isclose(out["2024-01-02"].vwap, 50.0, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# Round-7 batch 4: ichimoku, pivots, ER, vortex
# ---------------------------------------------------------------------------


def test_ichimoku_midlines_inside_channel_and_displacement(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_daily_metrics,
    )

    daily = q_daily_metrics(spark, sf_dir)
    out = indicators.ichimoku(
        daily, tenkan_n=5, kijun_n=10, senkou_b_n=20, shift=5
    )
    rows = out.orderBy("symbol", "date").collect()
    assert rows
    by_sym = {}
    for r in rows:
        by_sym.setdefault(r.symbol, []).append(r)
    bars = {}
    for b in daily.collect():
        bars.setdefault(b.symbol, []).append(b)
    for sym in bars:
        bars[sym].sort(key=lambda b: b.date)
    for sym, series in by_sym.items():
        for i, r in enumerate(series):
            # chikou is the close 5 bars ahead
            if i + 5 < len(series):
                assert r.chikou == series[i + 5].close
            else:
                assert r.chikou is None
            # tenkan = midpoint of the trailing 5-bar high/low channel
            if r.tenkan is not None:
                window = bars[sym][max(0, i - 4): i + 1]
                hh = max(b.daily_high for b in window)
                ll = min(b.daily_low for b in window)
                assert ll - 1e-9 <= r.tenkan <= hh + 1e-9
    # displacement: senkou_a at t equals the midline average computed 5 bars back
    for sym, series in by_sym.items():
        for i in range(5, len(series)):
            prev = series[i - 5]
            if prev.tenkan is not None and prev.kijun is not None:
                expect = round((prev.tenkan + prev.kijun) / 2, 6)
                assert abs(series[i].senkou_a - expect) < 1e-9


def test_pivot_ladder_ordering(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_pivot_points,
    )

    for r in q_pivot_points(spark, sf_dir).collect():
        assert r.s3 <= r.s2 + 1e-9
        assert r.s2 <= r.s1 + 1e-9
        assert r.s1 <= r.pivot + 1e-9
        assert r.pivot <= r.r1 + 1e-9
        assert r.r1 <= r.r2 + 1e-9
        assert r.r2 <= r.r3 + 1e-9


def test_kaufman_er_bounds_and_trend_pin(spark):
    import datetime

    rows = [
        ("X", datetime.date(2024, 1, 1 + i), 100.0 + 2.0 * i)
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.kaufman_er(df, n=5, close_col="close").collect()
    assert out
    for r in out:
        assert 0.0 - 1e-9 <= r.er <= 1.0 + 1e-9
        # monotone trend: |net| == path length -> ER exactly 1
        assert r.er == 1.0


def test_vortex_uptrend_dominance(spark):
    bars = [(100.0, 102.0 + 3 * i, 98.0 + 3 * i, 100.0 + 3 * i, 10) for i in range(20)]
    out = indicators.vortex(_ohlcv_df(spark, bars), n=5).collect()
    assert out
    for r in out:
        assert r.vi_plus >= 0 and r.vi_minus >= 0
        assert r.vi_plus > r.vi_minus  # rising bars: +VM dominates


def test_kama_constant_series_is_flat(spark):
    import datetime

    rows = [("X", datetime.date(2024, 1, 1 + i), 50.0) for i in range(20)]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.kama(df, n=5, close_col="close").collect()
    assert out
    for r in out:
        assert r.kama == 50.0


def test_kama_tracks_strong_trend_faster_than_chop(spark):
    import datetime

    # trending series: ER = 1 -> sc = alpha_fast^2-ish, kama moves
    trend = [("T", datetime.date(2024, 1, 1 + i), 100.0 + 2.0 * i) for i in range(25)]
    df = spark.createDataFrame(trend, "symbol string, date date, close double")
    rows = sorted(indicators.kama(df, n=5, close_col="close").collect(), key=lambda r: r.date)
    # kama strictly increases once past the seed and lags below close
    for a, b in zip(rows, rows[1:]):
        assert b.kama > a.kama - 1e-9
        assert b.kama <= b.close + 1e-9


def test_holt_linear_tracks_exact_line(spark):
    import datetime

    # on a perfect line, level == close and trend == slope forever
    rows = [
        ("X", datetime.date(2024, 1, 1 + i), 100.0 + 3.0 * i) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = sorted(
        indicators.holt_linear(df, close_col="close").collect(),
        key=lambda r: r.date,
    )
    assert len(out) == 14  # first row consumed by the seed
    for r in out:
        assert abs(r.level - r.close) < 1e-6
        assert abs(r.trend - 3.0) < 1e-6
        assert abs(r.forecast - (r.close + 3.0)) < 1e-6


def test_feature_matrix_no_lookahead(spark, sf_dir):
    """The label at (symbol, t) must equal the feature ret_1d at
    (symbol, t+1) — and features must be reproducible from data
    truncated at t (backward-only)."""
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_daily_metrics,
    )

    daily = q_daily_metrics(spark, sf_dir)
    fm = indicators.feature_matrix(daily, n=5)
    rows = sorted(fm.collect(), key=lambda r: (r.symbol, r.date))
    by_key = {(r.symbol, r.date): r for r in rows}
    assert rows
    for r in rows:
        nxt = [
            x for x in rows
            if x.symbol == r.symbol and x.date > r.date
        ]
        if nxt and (r.symbol, min(n.date for n in nxt)) in by_key:
            n0 = by_key[(r.symbol, min(n.date for n in nxt))]
            # consecutive matrix rows: label(t) == ret_1d(t+1)
            if (n0.date - r.date).days == 1:
                assert abs(r.label_next_ret - n0.ret_1d) < 1e-9
    for r in rows:
        assert 0.0 - 1e-9 <= r.channel_pos <= 1.0 + 1e-9
        assert r.ret_vol >= 0


def test_market_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from real_time_stock_market_data_pipeline__spark import jobs

    run = jobs.market_pipeline(
        spark, f"{sf_dir}/events.parquet", str(tmp_path / "out")
    )
    assert run.ok
    names = [r.name for r in run.results]
    assert names == ["gate", "ingest", "daily_bars", "features", "risk"]
    assert run.value("features") > 0
    assert run.value("risk") > 0
    feats = spark.read.parquet(str(tmp_path / "out" / "features"))
    assert "label_next_ret" in feats.columns
    risk = spark.read.parquet(str(tmp_path / "out" / "risk"))
    assert {"sharpe_annual", "var_5pct"} <= set(risk.columns)


def test_forecast_eval_perfect_line_has_positive_skill(spark):
    import datetime

    # Holt locks onto a perfect line (level=close, trend=slope), so
    # its one-step error is ~0 while naive's is the slope
    rows = [
        ("X", datetime.date(2024, 1, 1 + i), 100.0 + 3.0 * i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.forecast_eval(df, close_col="close").collect()[0]
    assert out.mae_holt < 1e-5
    assert abs(out.mae_naive - 3.0) < 1e-6
    assert out.skill > 0.99


def test_ljung_box_iid_vs_trending(spark):
    import datetime

    # strongly autocorrelated returns (long alternating blocks) must
    # produce a much larger Q than the same values shuffled-ish
    rows = []
    c = 100.0
    for i in range(60):
        c *= 1.01 if (i // 10) % 2 == 0 else 0.99  # 10-day momentum blocks
        rows.append(("A", datetime.date(2024, 1, 1) + datetime.timedelta(days=i), c))
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.ljung_box(df, h=5, close_col="close").collect()[0]
    assert out.lb_q is not None and out.lb_q > 30  # strong dependence
    assert abs(out.rho_1) <= 1.0 + 1e-9


def test_ljung_box_short_series_null(spark):
    import datetime

    rows = [("X", datetime.date(2024, 1, 1 + i), 100.0 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = indicators.ljung_box(df, h=5, close_col="close").collect()[0]
    assert out.lb_q is None  # n <= h+1: no test
