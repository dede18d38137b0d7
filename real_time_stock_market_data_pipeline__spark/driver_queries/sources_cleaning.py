"""Cleaning/projection queries + partition-pruned scan, provider ingest, kafka wire codec.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.ohlcv import (  # noqa: F401
    _DAILY_EVENTS_ORACLE,
)


# --------------------------------------------------------------------------
# Cleaning / projection family
# --------------------------------------------------------------------------


def q_tick_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips a synthesized stringly tick frame through
    cast_tick_types (P1–P4): timestamps, doubles, the %-suffixed
    change_percent, and an int volume all re-typed from strings."""
    ev = _events(spark, sf_dir)
    raw = ev.select(
        "event_id",
        F.col("ts").cast("string").alias("timestamp"),
        F.col("value").cast("string").alias("price"),
        F.col("value").cast("string").alias("change"),
        F.concat(
            F.round("value", 2).cast("decimal(18,2)").cast("string"), F.lit("%")
        ).alias("change_percent"),
        F.col("user_id").cast("string").alias("volume"),
        F.col("value").cast("string").alias("today_low"),
        F.col("value").cast("string").alias("today_high"),
    )
    return cleaning.cast_tick_types(raw).select(
        "event_id",
        "timestamp",
        "price",
        "change",
        "change_percent",
        "volume",
        "today_low",
        "today_high",
    )


_TICK_CAST_ORACLE = """
SELECT event_id,
       ts AS "timestamp",
       value AS price,
       value AS change,
       round(value, 2) AS change_percent,
       CAST(user_id AS INT) AS volume,
       value AS today_low,
       value AS today_high
FROM events
"""


def q_normalize_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pads symbols with whitespace (and blanks out 'error' rows) then
    normalizes: trim + drop null/empty keys (P11/P12)."""
    ev = _events(spark, sf_dir)
    padded = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("   "))
        .otherwise(F.concat(F.lit("  "), F.col("event_type"), F.lit(" ")))
        .alias("symbol"),
    )
    return cleaning.normalize_symbol(padded)


_NORMALIZE_ORACLE = """
SELECT event_id, event_type AS symbol FROM events WHERE event_type <> 'error'
"""


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select("event_id", *cleaning.date_parts("ts"))


_DATE_PARTS_ORACLE = """
SELECT event_id,
       CAST(year(ts) AS INT) AS year,
       CAST(month(ts) AS INT) AS month,
       CAST(day(ts) AS INT) AS day
FROM events
"""


def q_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id", cleaning.json_int_field("props", "$.k").alias("k")
    )


_JSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
"""

# --------------------------------------------------------------------------
# Provider ingestion normalization + calendar backfill (S5 logic, exercised)
# --------------------------------------------------------------------------


def _daily_provider_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLCV of events reshaped to the generic (symbol, date,
    open..volume) schema — input fixture for normalize/backfill."""
    daily = ohlcv.daily_metrics(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )
    return daily.select(
        "symbol",
        "date",
        F.col("daily_open").alias("open"),
        F.col("daily_high").alias("high"),
        F.col("daily_low").alias("low"),
        F.col("daily_close").alias("close"),
        F.col("daily_volume").alias("volume"),
    )


def q_provider_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference fetcher's rename → date-normalize → symbol-stamp →
    column-order → batch-stamp chain (`batch_data_producer.py:76-98`)
    exercised end-to-end: a provider-shaped frame (yfinance
    capitalization + extra columns that must be dropped) built
    deterministically from the events table, normalized by
    ``sources.external.normalize_provider_ohlcv``."""
    from real_time_stock_market_data_pipeline__spark.sources import external

    ensure_engine_conf(spark)
    provider = (
        _daily_provider_shape(spark, sf_dir)
        .filter(F.col("symbol") == "click")
        .select(
            F.col("date").cast("timestamp").alias("Date"),
            F.col("open").alias("Open"),
            F.col("high").alias("High"),
            F.col("low").alias("Low"),
            F.col("close").alias("Close"),
            F.col("volume").alias("Volume"),
            F.lit(0.0).alias("Dividends"),
            F.lit(0.0).alias("Stock Splits"),
        )
    )
    return external.normalize_provider_ohlcv(
        provider, symbol="CLICK", batch_id="B0001", batch_date="2024-02-01"
    )


_PROVIDER_NORMALIZE_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE})
SELECT 'CLICK' AS symbol, date,
       daily_open AS open, daily_high AS high, daily_low AS low,
       daily_close AS close, daily_volume AS volume,
       'B0001' AS batch_id, DATE '2024-02-01' AS batch_date
FROM d WHERE symbol = 'click'
"""


def q_ohlcv_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: knock deterministic holes into the daily
    table (every day-of-month divisible by 3), then
    ``ohlcv.backfill_ohlcv_calendar`` forward-fills them with
    carried-close rows flagged ``is_backfilled``. The oracle replays
    the skeleton (per-symbol generate_series), the left join, and the
    IGNORE NULLS forward fill in SQL."""
    ensure_engine_conf(spark)
    sparse = _daily_provider_shape(spark, sf_dir).filter(
        F.dayofmonth("date") % 3 != 0
    )
    return ohlcv.backfill_ohlcv_calendar(sparse)


_OHLCV_BACKFILL_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
sparse AS (
  SELECT symbol, date, daily_open AS open, daily_high AS high,
         daily_low AS low, daily_close AS close, daily_volume AS volume
  FROM d WHERE extract(day FROM date) % 3 <> 0
),
cal AS (
  SELECT symbol, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                             CAST(d1 AS TIMESTAMP),
                                             INTERVAL 1 DAY)) AS DATE) AS date
  FROM (SELECT symbol, min(date) AS d0, max(date) AS d1
        FROM sparse GROUP BY 1)
),
j AS (
  SELECT c.symbol, c.date, s.open, s.high, s.low, s.close, s.volume
  FROM cal c LEFT JOIN sparse s ON c.symbol = s.symbol AND c.date = s.date
),
f AS (
  SELECT symbol, date, open, high, low, close, volume,
         last_value(close IGNORE NULLS) OVER (
           PARTITION BY symbol ORDER BY date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
  FROM j
)
SELECT symbol, date,
  coalesce(open, carried) AS open,
  coalesce(high, carried) AS high,
  coalesce(low, carried) AS low,
  carried AS close,
  coalesce(volume, 0) AS volume,
  close IS NULL AS is_backfilled
FROM f
"""


# --------------------------------------------------------------------------
# Partition-pruned batch scan (S2), exercised end-to-end
# --------------------------------------------------------------------------


def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 end-to-end: write events into a ``year=/month=/day=`` hive
    layout (P15 partition keys, reference `batch_data_consumer.py:76` /
    `spark_batch_processor.py:42-69`), then read it back with a
    partition predicate. The predicate lands in the scan's
    PartitionFilters (plan-asserted in tests/test_plans.py): at 100 TB
    the filter skips directories, it doesn't read-then-drop rows. The
    oracle applies the same predicate to the raw table — pruning must
    be invisible to the result."""
    import os
    import tempfile

    from real_time_stock_market_data_pipeline__spark import sinks

    ev = _events(spark, sf_dir)
    dest = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_partitioned",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    part = ev.select(
        "event_id", "event_type", "value", *cleaning.date_parts("ts")
    )
    sinks.write_parquet_partitioned(
        part, dest, ["year", "month", "day"], mode="overwrite"
    )
    return (
        spark.read.parquet(dest)
        .where(F.col("day").between(10, 12))
        .select("event_id", "event_type", "value", "year", "month", "day")
    )


_PARTITIONED_SCAN_ORACLE = """
SELECT event_id, event_type, value,
       CAST(year(ts) AS INT) AS year,
       CAST(month(ts) AS INT) AS month,
       CAST(day(ts) AS INT) AS day
FROM events
WHERE day(ts) BETWEEN 10 AND 12
"""


# --------------------------------------------------------------------------
# Kafka wire codec (batch-testable decode of the broker-bound source)
# --------------------------------------------------------------------------


def q_kafka_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka consumer's value-decode semantics, oracle-checked
    without a broker: events → ``sinks.encode_keyed_json`` (the
    producer wire shape, reference `src/kafka/producer`) →
    ``streaming.pipeline.decode_keyed_json`` (the consumer projection,
    reference `realtime_data_consumer.py:92`). The decode is the exact
    function `read_kafka_stream` applies to the broker frame, so only
    the ``.format("kafka")`` builder lines remain unexecuted in this
    container. Round-trip is lossless (micro-precision timestampFormat,
    shortest-repr doubles), hence the oracle is the identity
    projection."""
    from real_time_stock_market_data_pipeline__spark import sinks
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    wire = sinks.encode_keyed_json(ev, key_col="event_type")
    return pipeline.decode_keyed_json(wire, ev.schema)


_KAFKA_DECODE_ORACLE = """
SELECT event_type AS symbol_key,
       event_id, ts, user_id, event_type, value, props
FROM events
"""




__all__ = [
    "_DATE_PARTS_ORACLE",
    "_JSON_ORACLE",
    "_KAFKA_DECODE_ORACLE",
    "_NORMALIZE_ORACLE",
    "_OHLCV_BACKFILL_ORACLE",
    "_PARTITIONED_SCAN_ORACLE",
    "_PROVIDER_NORMALIZE_ORACLE",
    "_TICK_CAST_ORACLE",
    "_daily_provider_shape",
    "q_date_parts",
    "q_json_field",
    "q_kafka_decode",
    "q_normalize_symbol",
    "q_ohlcv_backfill",
    "q_partitioned_scan",
    "q_provider_normalize",
    "q_tick_cast",
]
