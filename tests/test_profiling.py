"""Laws for TWAP, histogram, z-score anomaly, and profiling operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    q_daily_metrics,
    q_twap,
    q_value_histogram,
)
from real_time_stock_market_data_pipeline__spark.operators import metrics, ohlcv


def test_twap_within_daily_range(spark, sf_dir):
    twap = {(r.symbol, r.date): r.twap for r in q_twap(spark, sf_dir).collect()}
    for r in q_daily_metrics(spark, sf_dir).collect():
        t = twap[(r.symbol, r.date)]
        assert r.daily_low - 1e-6 <= t <= r.daily_high + 1e-6


def test_twap_weights_time_not_ticks(spark):
    # price 10 held for 9s, then price 100 for 1s, then closes at 50:
    # TWAP = (10*9 + 100*1) / 10 = 19 — a tick-average would say 53.3
    rows = [
        ("X", "2024-01-01 00:00:00", 10.0, 1),
        ("X", "2024-01-01 00:00:09", 100.0, 2),
        ("X", "2024-01-01 00:00:10", 50.0, 3),
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, ts string, price double, id bigint"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = ohlcv.twap_daily(ticks, id_col="id").collect()[0]
    assert out.twap == pytest.approx(19.0)
    assert out.span_us == 10_000_000
    # single-tick day falls back to the price itself
    one = spark.createDataFrame(
        [("Y", "2024-01-01 00:00:00", 42.5, 1)],
        "symbol string, ts string, price double, id bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = ohlcv.twap_daily(one, id_col="id").collect()[0]
    assert r.twap == 42.5 and r.span_us == 0


def test_histogram_partitions_rows(spark, sf_dir):
    rows = q_value_histogram(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r.n for r in rows) == ev.count()
    by_key: dict = {}
    for r in rows:
        assert r.bucket_lo == r.bucket * 10.0
        by_key.setdefault(r.key, 0.0)
        by_key[r.key] += r.share
    for total in by_key.values():
        assert total == pytest.approx(1.0, abs=1e-3)  # rounded shares


def test_zscore_flags_planted_outlier(spark):
    rows = [(i, "X", "2024-01-01", 100.0 + (i % 7) * 0.1) for i in range(50)]
    rows.append((99, "X", "2024-01-01", 500.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, date string, value double"
    ).withColumn("date", F.col("date").cast("date"))
    out = metrics.zscore_anomalies(
        df, key_cols=["event_type", "date"], value_col="value", id_cols=["event_id"]
    ).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].zscore > 3


def test_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, "b"), (3, 5.0, None), (4, 7.5, "a")],
        "id bigint, x double, cat string",
    )
    out = {
        r.column: r
        for r in metrics.profile_columns(
            df, numeric_cols=["id", "x"], categorical_cols=["cat"]
        ).collect()
    }
    assert out["id"].n_rows == 4 and out["id"].n_null == 0
    assert out["id"].n_distinct == 4 and out["id"].min_val == 1.0
    assert out["x"].n_null == 1 and out["x"].n_distinct == 2
    assert out["x"].max_val == 7.5
    assert out["cat"].n_null == 1 and out["cat"].n_distinct == 2
    assert out["cat"].min_val is None and out["cat"].max_val is None


def test_mad_anomalies_robust_to_planted_outlier(spark, sf_dir):
    """A huge planted outlier must be flagged, and unlike the
    mean/stddev gate, must not unflag everything else by inflating the
    spread."""
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_mad_anomalies,
    )
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    rows = q_mad_anomalies(spark, sf_dir).collect()
    for r in rows:
        assert abs(r.robust_z) > 3.5
        assert r.mad > 0
    base = [(i, "g", float(i % 7)) for i in range(50)] + [(999, "g", 1e6)]
    df = spark.createDataFrame(base, "id long, k string, v double")
    out = metrics.mad_anomalies(
        df, key_cols=["k"], value_col="v", id_cols=["id"]
    ).collect()
    assert any(r.id == 999 for r in out)
    # median/MAD of the bulk are untouched by the outlier
    flagged = {r.id for r in out}
    assert len(flagged - {999}) == 0


def test_trimmed_mean_ignores_planted_outlier(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    rows = [("g", float(i)) for i in range(1, 100)] + [("g", 1_000_000.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    r = metrics.trimmed_mean(df, ["k"], "value", trim_pct=10).collect()[0]
    assert r.n == 100 and r.k_each_side == 10
    # untrimmed mean is dragged by the planted outlier; trimmed is not
    assert r.mean_all > 10000
    assert 40 <= r.mean_trimmed <= 60


# ---------------------------------------------------------------------------
# Round-7: drift-detection family
# ---------------------------------------------------------------------------


def _two_sample_df(spark, a_vals, b_vals):
    rows = [("g", v, 0) for v in a_vals] + [("g", v, 1) for v in b_vals]
    return spark.createDataFrame(rows, "grp string, val double, is_b int")


def test_ks_identical_samples_is_zero(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    vals = [1.0, 2.0, 3.0, 4.0, 5.0] * 4
    out = metrics.ks_drift(
        _two_sample_df(spark, vals, vals), "grp", "is_b", "val"
    ).collect()[0]
    assert out.ks_stat == 0.0


def test_ks_disjoint_supports_is_one(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    out = metrics.ks_drift(
        _two_sample_df(spark, [1.0, 2.0, 3.0], [10.0, 11.0]),
        "grp", "is_b", "val",
    ).collect()[0]
    assert out.ks_stat == 1.0
    assert out.n_a == 3 and out.n_b == 2


def test_ks_bounds_on_real_data(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_ks_drift

    for r in q_ks_drift(spark, sf_dir).collect():
        if r.ks_stat is not None:
            assert 0.0 <= r.ks_stat <= 1.0


def test_psi_identical_samples_is_zero(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    vals = [float(v) for v in range(0, 200, 10)]
    out = metrics.psi_drift(
        _two_sample_df(spark, vals, vals), "grp", "is_b", "val"
    ).collect()[0]
    assert out.psi == 0.0


def test_psi_shifted_distribution_is_large(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    a = [5.0] * 50          # all in bin 0
    b = [180.0] * 50        # all in the top bin
    out = metrics.psi_drift(
        _two_sample_df(spark, a, b), "grp", "is_b", "val"
    ).collect()[0]
    # total-mass swap across bins: PSI far beyond the 0.25 "shifted" bar
    assert out.psi > 1.0


def test_chi_square_independent_table_is_zero(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    # perfectly proportional table: o == e in every cell -> chi2 = 0
    rows = []
    for a, na in [("x", 2), ("y", 4)]:
        for b, nb in [(1, 3), (2, 6)]:
            rows += [(a, b)] * (na * nb)
    df = spark.createDataFrame(rows, "a string, b int")
    out = metrics.chi_square_independence(df, "a", "b").collect()[0]
    assert out.chi2 == 0.0
    assert out.dof == 1
    assert out.n == len(rows)


def test_chi_square_dof_on_real_data(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_chi_square,
    )

    out = q_chi_square(spark, sf_dir).collect()[0]
    assert out.chi2 >= 0.0
    assert out.dof >= 1


def test_gini_pins(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    equal = spark.createDataFrame(
        [("g", 5.0)] * 10, "grp string, val double"
    )
    out = metrics.gini(equal, "grp", "val").collect()[0]
    assert out.gini == 0.0
    # one holder of everything: G = (n-1)/n
    onehot = spark.createDataFrame(
        [("g", 0.0)] * 9 + [("g", 100.0)], "grp string, val double"
    )
    out = metrics.gini(onehot, "grp", "val").collect()[0]
    assert abs(out.gini - 0.9) < 1e-9


def test_gini_bounds_on_real_data(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import q_gini

    for r in q_gini(spark, sf_dir).collect():
        if r.gini is not None:
            assert -1e-9 <= r.gini <= 1.0


def test_mann_whitney_identity_and_hand_case(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    # textbook: a = {1,2,3}, b = {4,5} -> b holds ranks 4,5 ->
    # R_b = 9, U_b = 9 - 3 = 6, U_a = 0
    df = spark.createDataFrame(
        [("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 0), ("g", 4.0, 1), ("g", 5.0, 1)],
        "grp string, val double, is_b int",
    )
    out = metrics.mann_whitney_u(df, "grp", "is_b", "val").collect()[0]
    assert out.u_b == 6.0 and out.u_a == 0.0 and out.u_stat == 0.0
    # ties: all values equal -> every avg_rank = (n+1)/2, U_a = U_b = n_a*n_b/2
    tied = spark.createDataFrame(
        [("g", 7.0, i % 2) for i in range(10)], "grp string, val double, is_b int"
    )
    t = metrics.mann_whitney_u(tied, "grp", "is_b", "val").collect()[0]
    assert t.u_a == t.u_b == t.n_a * t.n_b / 2


def test_mann_whitney_sum_identity_real_data(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_mann_whitney,
    )

    for r in q_mann_whitney(spark, sf_dir).collect():
        if r.u_a is not None:
            assert abs(r.u_a + r.u_b - r.n_a * r.n_b) < 1e-6
            assert r.u_stat == min(r.u_a, r.u_b)


def test_spearman_pins(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    # perfect monotone association -> rho = 1; anti-monotone -> -1
    mono = spark.createDataFrame(
        [("g", float(i), float(i * i)) for i in range(1, 11)],
        "grp string, xv double, yv double",
    )
    out = metrics.spearman_corr(mono, "grp", "xv", "yv").collect()[0]
    assert out.spearman_rho == 1.0
    anti = spark.createDataFrame(
        [("g", float(i), float(-i)) for i in range(1, 11)],
        "grp string, xv double, yv double",
    )
    out = metrics.spearman_corr(anti, "grp", "xv", "yv").collect()[0]
    assert out.spearman_rho == -1.0
    # constant side -> NULL (zero variance)
    flat = spark.createDataFrame(
        [("g", float(i), 5.0) for i in range(1, 11)],
        "grp string, xv double, yv double",
    )
    out = metrics.spearman_corr(flat, "grp", "xv", "yv").collect()[0]
    assert out.spearman_rho is None


def test_rolling_median_robust_to_outlier(spark):
    import datetime

    from real_time_stock_market_data_pipeline__spark.operators import metrics

    closes = [10.0, 11.0, 12.0, 9.0, 10.5, 1000.0, 11.5, 10.8, 9.9, 11.2]
    rows = [
        ("X", datetime.date(2024, 1, 1 + i), c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = {
        r.date.day: r.rolling_median
        for r in metrics.rolling_median(df, "symbol", "date", "close", n=5).collect()
    }
    # every 5-window containing the 1000.0 spike still reports a sane
    # middle value
    for day, med in out.items():
        assert med < 100.0
    # hand-check one window: days 2..6 -> sorted [9,10.5,11,12,1000] -> 11
    assert out[6] == 11.0
    # windows before day 5 are incomplete and absent
    assert set(out) == set(range(5, 11))


def test_qq_quantiles_monotone_and_identical_sides(spark):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    vals = [float(v) for v in range(1, 41)]
    df = spark.createDataFrame(
        [("g", v, 0) for v in vals] + [("g", v, 1) for v in vals],
        "grp string, val double, is_b int",
    )
    r = metrics.qq_quantiles(df, "grp", "is_b", "val").collect()[0]
    # identical samples: every gap is exactly 0
    for l in ("p10", "p25", "p50", "p75", "p90"):
        assert r[f"{l}_gap"] == 0.0
    # quantiles are monotone across levels
    assert r.p10_ref <= r.p25_ref <= r.p50_ref <= r.p75_ref <= r.p90_ref
    # discrete convention: p50 of 40 values = 20th smallest = 20.0
    assert r.p50_ref == 20.0


def test_drift_series_covers_all_later_weeks(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_drift_series,
    )

    rows = q_drift_series(spark, sf_dir).collect()
    assert rows
    # grp = "<type>|<week>", one row per (type, later week); baseline
    # side always populated, ks within bounds
    for r in rows:
        etype, week = r.grp.split("|")
        assert r.n_a > 0  # replicated baseline present for every week
        if r.ks_stat is not None:
            assert 0.0 <= r.ks_stat <= 1.0
