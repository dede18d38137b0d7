"""OHLCV daily metrics + dual sliding-window realtime metrics.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403


# --------------------------------------------------------------------------
# OHLCV / daily metrics family
# --------------------------------------------------------------------------

_DAILY_EVENTS_ORACLE = """
SELECT DISTINCT
  event_type AS symbol,
  CAST(ts AS DATE) AS date,
  round(first_value(value) OVER w, 4) AS daily_open,
  round(max(value) OVER w, 4) AS daily_high,
  round(min(value) OVER w, 4) AS daily_low,
  round(last_value(value) OVER w, 4) AS daily_close,
  count(*) OVER w AS daily_volume,
  round(CASE WHEN first_value(value) OVER w <> 0 THEN
      (last_value(value) OVER w - first_value(value) OVER w)
      / first_value(value) OVER w * 100 END, 4) AS daily_change
FROM events
WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_intraday_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute OHLCV bars from the event ticks
    (`operators/ohlcv.py:intraday_bars`)."""
    return ohlcv.intraday_bars(
        _events(spark, sf_dir),
        bar_seconds=300,
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_INTRADAY_BARS_ORACLE = """
SELECT DISTINCT
  event_type AS symbol,
  make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000) AS bar_start,
  round(first_value(value) OVER w, 4) AS open,
  round(max(value) OVER w, 4) AS high,
  round(min(value) OVER w, 4) AS low,
  round(last_value(value) OVER w, 4) AS close,
  count(*) OVER w AS volume
FROM events
WINDOW w AS (PARTITION BY event_type, epoch_us(ts) // 300000000
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.daily_returns(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_DAILY_RETURNS_ORACLE = """
WITH d AS (
  SELECT DISTINCT
    event_type AS symbol,
    CAST(ts AS DATE) AS date,
    round(last_value(value) OVER w, 4) AS daily_close,
    count(*) OVER w AS daily_volume
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT symbol, date, daily_close,
       lag(daily_close) OVER ws AS prev_close,
       CASE WHEN lag(daily_close) OVER ws <> 0
            THEN (daily_close / lag(daily_close) OVER ws - 1) * 100 END
         AS return_pct,
       CAST(sum(daily_volume) OVER wc AS BIGINT) AS cum_volume
FROM d
WINDOW ws AS (PARTITION BY symbol ORDER BY date),
       wc AS (PARTITION BY symbol ORDER BY date
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.daily_metrics(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


def q_daily_metrics_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.daily_metrics_window(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


def q_daily_metrics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLCV semantics with a true volume column: l_quantity sums, not
    row counts (the r02 volume bug, now parameterized)."""
    li = _table("lineitem")(spark, sf_dir).withColumn(
        "lid", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    return ohlcv.daily_metrics(
        li,
        symbol_col="l_returnflag",
        ts_col="l_shipdate",
        price_col="l_extendedprice",
        id_col="lid",
        volume_col="l_quantity",
    )


_DAILY_LINEITEM_ORACLE = """
SELECT DISTINCT
  l_returnflag AS symbol,
  CAST(l_shipdate AS DATE) AS date,
  round(first_value(l_extendedprice) OVER w, 4) AS daily_open,
  round(max(l_extendedprice) OVER w, 4) AS daily_high,
  round(min(l_extendedprice) OVER w, 4) AS daily_low,
  round(last_value(l_extendedprice) OVER w, 4) AS daily_close,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS BIGINT) AS daily_volume,
  round(CASE WHEN first_value(l_extendedprice) OVER w <> 0 THEN
      (last_value(l_extendedprice) OVER w - first_value(l_extendedprice) OVER w)
      / first_value(l_extendedprice) OVER w * 100 END, 4) AS daily_change
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag, CAST(l_shipdate AS DATE)
             ORDER BY l_shipdate, l_orderkey * 100 + l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.topk_movers(q_daily_metrics(spark, sf_dir), k=10)


_TOPK_ORACLE = f"""
SELECT * FROM ({_DAILY_EVENTS_ORACLE})
ORDER BY abs(daily_change) DESC NULLS LAST, symbol, date
LIMIT 10
"""

# --------------------------------------------------------------------------
# Dual sliding-window realtime metrics
# --------------------------------------------------------------------------


def q_realtime_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.realtime_metrics(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
    )


def _window_cte(name: str, slide_us: int, dur_us: int, n: int, suffix: str) -> str:
    """Sliding-window agg as epoch-bucket arithmetic: an event at t
    belongs to the windows starting at slide*floor(t/slide) - i*slide
    for i in 0..n-1 (n = duration/slide) — exactly `F.window`'s epoch
    alignment."""
    return f"""
{name} AS (
  SELECT
    event_type AS symbol,
    make_timestamp((epoch_us(ts) // {slide_us} - g.i) * {slide_us}) AS window_start,
    {_round_sql(_EXAVG.format(col="value"), 4)} AS moving_avg_price_{suffix},
    {_round_sql(_EXSTD.format(col="value"), 4)} AS price_volatility_{suffix},
    count(*) AS total_volume_{suffix},
    {_round_sql("min(value)", 4)} AS min_price_{suffix},
    {_round_sql("max(value)", 4)} AS max_price_{suffix}
  FROM events CROSS JOIN (SELECT unnest(range({n})) AS i) g
  GROUP BY 1, 2
)"""


_REALTIME_ORACLE = f"""
WITH {_window_cte("m15", 300_000_000, 900_000_000, 3, "15m")},
{_window_cte("m1h", 600_000_000, 3_600_000_000, 6, "1h")}
SELECT
  m15.symbol,
  m15.window_start,
  m15.window_start + INTERVAL 15 MINUTE AS window_15m_end,
  m15.window_start + INTERVAL 1 HOUR AS window_1h_end,
  moving_avg_price_15m,
  moving_avg_price_1h,
  price_volatility_15m,
  price_volatility_1h,
  total_volume_15m,
  total_volume_1h
FROM m15 JOIN m1h ON m15.symbol = m1h.symbol AND m15.window_start = m1h.window_start
"""



__all__ = [
    "_DAILY_EVENTS_ORACLE",
    "_DAILY_LINEITEM_ORACLE",
    "_DAILY_RETURNS_ORACLE",
    "_INTRADAY_BARS_ORACLE",
    "_REALTIME_ORACLE",
    "_TOPK_ORACLE",
    "_window_cte",
    "q_daily_metrics",
    "q_daily_metrics_lineitem",
    "q_daily_metrics_window",
    "q_daily_returns",
    "q_intraday_bars",
    "q_realtime_metrics",
    "q_topk_movers",
]
