"""Market microstructure, feed health, forensics, TWAP/profiling.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403


# --------------------------------------------------------------------------
# TWAP / histogram / anomaly / profiling
# --------------------------------------------------------------------------


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.twap_daily(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_TWAP_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS pq,
         coalesce(lead(epoch_us(ts)) OVER w - epoch_us(ts), 0) AS w_us
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id)
)
SELECT symbol, date,
       round(CASE WHEN sum(w_us) > 0
                  THEN CAST(sum(CAST(pq AS DECIMAL(24,6))
                                * CAST(w_us AS DECIMAL(12,0))) AS DOUBLE)
                       / sum(w_us)
                  ELSE CAST(sum(pq) AS DOUBLE) / count(*) END, 6) AS twap,
       CAST(sum(w_us) AS BIGINT) AS span_us,
       count(*) AS n_ticks
FROM t GROUP BY 1, 2
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.value_histogram(
        _events(spark, sf_dir), key_col="event_type", value_col="value", width=10.0
    )


_VALUE_HISTOGRAM_ORACLE = """
WITH c AS (
  SELECT event_type AS "key",
         CAST(floor(value / 10.0) AS BIGINT) AS bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT "key", bucket, bucket * CAST(10.0 AS DOUBLE) AS bucket_lo, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY "key") AS BIGINT), 6) AS share
FROM c
"""


def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _events(spark, sf_dir).select(
        "event_id", "event_type", F.to_date("ts").alias("date"), "value"
    )
    return metrics.zscore_anomalies(
        base,
        key_cols=["event_type", "date"],
        value_col="value",
        id_cols=["event_id"],
        z_threshold=3.0,
    )


_ZSCORE_ORACLE = """
WITH b AS (
  SELECT event_id, event_type, CAST(ts AS DATE) AS date, value FROM events
),
s AS (
  SELECT *, count(*) OVER w AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              OVER w AS DOUBLE) AS sxx
  FROM b WINDOW w AS (PARTITION BY event_type, date)
),
z AS (
  SELECT event_id, event_type, date, value,
         round(CASE WHEN (CASE WHEN n >= 2 THEN
                   sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END) > 0
               THEN (value - sx / n)
                    / (CASE WHEN n >= 2 THEN
                       sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END)
               END, 4) AS zscore
  FROM s
)
SELECT * FROM z WHERE abs(zscore) > 3.0
"""

_PROFILE_NUMERIC = ["event_id", "user_id", "value"]
_PROFILE_CATEGORICAL = ["event_type", "props"]


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.profile_columns(
        _events(spark, sf_dir),
        numeric_cols=_PROFILE_NUMERIC,
        categorical_cols=_PROFILE_CATEGORICAL,
    )


def _profile_oracle() -> str:
    aggs = ["count(*) AS n_rows"]
    for c in _PROFILE_NUMERIC + _PROFILE_CATEGORICAL:
        aggs.append(f"count({c}) AS nn_{c}")
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
    for c in _PROFILE_NUMERIC:
        aggs.append(f"min(CAST({c} AS DOUBLE)) AS min_{c}")
        aggs.append(f"max(CAST({c} AS DOUBLE)) AS max_{c}")
    branches = []
    for c in _PROFILE_NUMERIC + _PROFILE_CATEGORICAL:
        is_num = c in _PROFILE_NUMERIC
        mn = f"min_{c}" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"max_{c}" if is_num else "CAST(NULL AS DOUBLE)"
        branches.append(
            f"SELECT '{c}' AS \"column\", n_rows,"
            f" n_rows - nn_{c} AS n_null, nd_{c} AS n_distinct,"
            f" {mn} AS min_val, {mx} AS max_val FROM a"
        )
    return (
        "WITH a AS (SELECT " + ", ".join(aggs) + " FROM events)\n"
        + "\nUNION ALL\n".join(branches)
    )


# --------------------------------------------------------------------------
# Market microstructure / feed health / data forensics
# --------------------------------------------------------------------------


def q_tick_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.tick_gaps(
        _events(spark, sf_dir),
        key_col="event_type",
        ts_col="ts",
        min_gap_seconds=3600,
        id_col="event_id",
    )


_TICK_GAPS_ORACLE = """
WITH t AS (
  SELECT event_type AS "key", ts,
         lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT "key", ts AS gap_start, nxt AS gap_end,
       epoch_us(nxt) - epoch_us(ts) AS gap_us
FROM t WHERE epoch_us(nxt) - epoch_us(ts) >= 3600000000
"""


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.resample_ffill(
        _events(spark, sf_dir),
        key_col="event_type",
        ts_col="ts",
        value_col="value",
        step_seconds=21600,
        id_col="event_id",
    )


_RESAMPLE_FFILL_ORACLE = """
WITH t AS (
  SELECT event_type AS "key",
         make_timestamp(epoch_us(ts) - (epoch_us(ts) % 21600000000)) AS bucket_ts,
         ts, event_id, value
  FROM events
),
cells AS (
  SELECT "key", bucket_ts, value AS lastv, n FROM (
    SELECT *, row_number() OVER (PARTITION BY "key", bucket_ts
                                 ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY "key", bucket_ts) AS n
    FROM t) WHERE rn = 1
),
ext AS (SELECT "key", min(bucket_ts) AS lo, max(bucket_ts) AS hi
        FROM cells GROUP BY 1),
grid AS (
  SELECT "key",
         unnest(generate_series(lo, hi, INTERVAL 21600 SECOND)) AS bucket_ts
  FROM ext
)
SELECT g."key", g.bucket_ts,
       last_value(c.lastv IGNORE NULLS)
         OVER (PARTITION BY g."key" ORDER BY g.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       coalesce(c.n, 0) AS n_ticks
FROM grid g LEFT JOIN cells c
  ON c."key" = g."key" AND c.bucket_ts = g.bucket_ts
"""


def q_daily_extreme_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.daily_extreme_times(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_DAILY_EXTREME_TIMES_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date, ts, event_id,
         round(value, 6) AS pq
  FROM events
),
h AS (SELECT symbol, date, pq, ts,
        row_number() OVER (PARTITION BY symbol, date
                           ORDER BY pq DESC, ts ASC, event_id DESC) AS rn
      FROM t),
l AS (SELECT symbol, date, pq, ts,
        row_number() OVER (PARTITION BY symbol, date
                           ORDER BY pq ASC, ts ASC, event_id ASC) AS rn
      FROM t),
n AS (SELECT symbol, date, count(*) AS n_ticks FROM t GROUP BY 1, 2)
SELECT n.symbol, n.date,
       h.pq AS daily_high, h.ts AS high_ts,
       l.pq AS daily_low, l.ts AS low_ts, n.n_ticks
FROM n
JOIN h ON h.symbol = n.symbol AND h.date = n.date AND h.rn = 1
JOIN l ON l.symbol = n.symbol AND l.date = n.date AND l.rn = 1
"""


def q_tick_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.tick_rule(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_TICK_RULE_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date, ts, event_id,
         round(value, 6) AS pq
  FROM events
),
s AS (
  SELECT symbol, date, ts, event_id,
         CASE WHEN pq > lag(pq) OVER w THEN 1
              WHEN pq < lag(pq) OVER w THEN -1 END AS raw
  FROM t WINDOW w AS (PARTITION BY symbol, date ORDER BY ts, event_id)
),
c AS (
  SELECT symbol, date,
         last_value(raw IGNORE NULLS)
           OVER (PARTITION BY symbol, date ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS side
  FROM s
)
SELECT symbol, date,
       count(CASE WHEN side = 1 THEN 1 END) AS n_buy,
       count(CASE WHEN side = -1 THEN 1 END) AS n_sell,
       count(CASE WHEN side IS NULL THEN 1 END) AS n_unclassified,
       round(CAST(count(CASE WHEN side = 1 THEN 1 END) AS DOUBLE)
             / greatest(count(side), 1), 6) AS buy_ratio
FROM c GROUP BY 1, 2
"""


def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = ohlcv.daily_metrics(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )
    wl = Window.partitionBy("symbol").orderBy("date")
    prev = F.lag("daily_close").over(wl)
    ret = F.when(prev != 0, F.col("daily_close") / prev - 1)
    base = daily.select(
        "symbol", "date", F.round(ret, 6).alias("ret")
    ).where(F.col("ret").isNotNull())
    return indicators.rolling_beta(base, window_days=10)


_ROLLING_BETA_ORACLE = """
WITH d AS (
  SELECT DISTINCT event_type AS symbol, CAST(ts AS DATE) AS date,
    round(last_value(value) OVER w, 4) AS daily_close
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
r AS (
  SELECT symbol, date,
    round(CASE WHEN lag(daily_close) OVER ws <> 0
          THEN daily_close / lag(daily_close) OVER ws - 1 END, 6) AS ret
  FROM d WINDOW ws AS (PARTITION BY symbol ORDER BY date)
),
b AS (SELECT symbol, date, CAST(ret AS DECIMAL(18,6)) AS x
      FROM r WHERE ret IS NOT NULL),
m AS (SELECT date,
        CAST(round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS y
      FROM b GROUP BY 1),
j AS (SELECT b.symbol, b.date, b.x, m.y FROM b JOIN m USING (date)),
s AS (
  SELECT symbol, date, x, y,
    count(*) OVER w AS n,
    CAST(sum(x) OVER w AS DOUBLE) AS sx,
    CAST(sum(y) OVER w AS DOUBLE) AS sy,
    CAST(sum(x * y) OVER w AS DOUBLE) AS sxy,
    CAST(sum(y * y) OVER w AS DOUBLE) AS syy
  FROM j WINDOW w AS (PARTITION BY symbol ORDER BY date
                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT symbol, date, CAST(x AS DOUBLE) AS ret, CAST(y AS DOUBLE) AS market_ret,
  round(CASE WHEN (syy - sy * sy / n) / (n - 1) > 0
        THEN ((sxy - sx * sy / n) / (n - 1))
             / ((syy - sy * sy / n) / (n - 1)) END, 6) AS beta
FROM s WHERE n = 10
"""


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.benford_digits(
        _events(spark, sf_dir), key_col="event_type", value_col="value"
    )


_BENFORD_ORACLE = """
WITH d AS (
  SELECT event_type AS "key",
         regexp_extract(CAST(CAST(abs(value) AS DECIMAL(18,6)) AS VARCHAR),
                        '[1-9]') AS digit
  FROM events
),
c AS (SELECT "key", digit, count(*) AS n FROM d
      WHERE digit <> '' GROUP BY 1, 2)
SELECT "key", CAST(digit AS INT) AS digit, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY "key"), 6)
         AS share,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_expected
FROM c
"""


def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.interarrival_stats(
        _events(spark, sf_dir),
        key_col="event_type",
        ts_col="ts",
        id_col="event_id",
    )


_INTERARRIVAL_ORACLE = """
WITH t AS (
  SELECT event_type AS "key",
         epoch_us(lead(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
),
g AS (SELECT "key", gap_us, CAST(gap_us AS HUGEINT) AS d
      FROM t WHERE gap_us IS NOT NULL)
SELECT "key", count(*) AS n_gaps,
  CAST(sum(d) AS DOUBLE) / count(*) AS mean_gap_us,
  CASE WHEN count(*) >= 2 THEN sqrt(greatest(
    (CAST(sum(d * d) AS DOUBLE)
     - CAST(sum(d) AS DOUBLE) * CAST(sum(d) AS DOUBLE) / count(*))
    / (count(*) - 1), 0.0)) END AS stddev_gap_us,
  min(gap_us) AS min_gap_us,
  max(gap_us) AS max_gap_us,
  quantile_disc(gap_us, 0.5) AS p5_gap_us,
  quantile_disc(gap_us, 0.95) AS p95_gap_us
FROM g GROUP BY 1
"""


def q_duplicate_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.duplicate_ticks(
        _events(spark, sf_dir),
        key_col="event_type",
        ts_col="ts",
        id_col="event_id",
        granularity="minute",
    )


_DUPLICATE_TICKS_ORACLE = """
SELECT event_type AS "key", date_trunc('minute', ts) AS cell_ts,
       count(*) AS n_dups, min(event_id) AS first_id,
       max(event_id) AS last_id
FROM events GROUP BY 1, 2 HAVING count(*) > 1
"""


def q_intraday_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.intraday_vol(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_INTRADAY_VOL_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date,
         round(value, 6) AS pq, ts, event_id
  FROM events
),
r AS (
  SELECT symbol, date,
         CAST(round(CASE WHEN pq > 0 AND lag(pq) OVER w > 0
               THEN ln(pq / lag(pq) OVER w) END, 6) AS DECIMAL(18,6)) AS lr
  FROM t WINDOW w AS (PARTITION BY symbol, date ORDER BY ts, event_id)
)
SELECT symbol, date, count(*) AS n_returns,
       round(CAST(sum(lr * lr) AS DOUBLE), 6) AS realized_var,
       round(sqrt(CAST(sum(lr * lr) AS DOUBLE)), 6) AS realized_vol
FROM r WHERE lr IS NOT NULL GROUP BY 1, 2
"""


def q_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.roll_spread(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_ROLL_SPREAD_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date, ts, event_id,
         round(value, 6) AS pq
  FROM events
),
d AS (
  SELECT symbol, date, ts, event_id,
         round(pq - lag(pq) OVER w, 6) AS dp
  FROM t WINDOW w AS (PARTITION BY symbol, date ORDER BY ts, event_id)
),
p AS (
  SELECT symbol, date, dp AS x,
         lag(dp) OVER (PARTITION BY symbol, date ORDER BY ts, event_id) AS y
  FROM d
),
s AS (
  SELECT symbol, date, count(*) AS n,
    CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
    CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)))
         AS DOUBLE) AS sxy
  FROM p WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2
)
SELECT symbol, date, n AS n_pairs,
  round(CASE WHEN n >= 2
        THEN (sxy - sx * sy / n) / (n - 1) END, 6) + 0.0 AS serial_cov,
  round(CASE WHEN n >= 2 AND (sxy - sx * sy / n) / (n - 1) < 0
        THEN 2 * sqrt(-((sxy - sx * sy / n) / (n - 1))) END, 6)
    AS roll_spread
FROM s
"""




__all__ = [
    "_BENFORD_ORACLE",
    "_DAILY_EXTREME_TIMES_ORACLE",
    "_DUPLICATE_TICKS_ORACLE",
    "_INTERARRIVAL_ORACLE",
    "_INTRADAY_VOL_ORACLE",
    "_PROFILE_CATEGORICAL",
    "_PROFILE_NUMERIC",
    "_RESAMPLE_FFILL_ORACLE",
    "_ROLLING_BETA_ORACLE",
    "_ROLL_SPREAD_ORACLE",
    "_TICK_GAPS_ORACLE",
    "_TICK_RULE_ORACLE",
    "_TWAP_ORACLE",
    "_VALUE_HISTOGRAM_ORACLE",
    "_ZSCORE_ORACLE",
    "_profile_oracle",
    "q_benford_digits",
    "q_daily_extreme_times",
    "q_duplicate_ticks",
    "q_interarrival_stats",
    "q_intraday_vol",
    "q_profile_events",
    "q_resample_ffill",
    "q_roll_spread",
    "q_rolling_beta",
    "q_tick_gaps",
    "q_tick_rule",
    "q_twap",
    "q_value_histogram",
    "q_zscore_anomalies",
]
