"""Technical indicators over the daily-close series.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.ohlcv import (  # noqa: F401
    _DAILY_EVENTS_ORACLE,
    q_daily_metrics,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.relational import (  # noqa: F401
    _SESSIONIZE_ORACLE,
    q_sessionize,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.similarity import (  # noqa: F401
    _COSINE_TOPK_ORACLE,
    _ann_topk_oracle,
    _query_vector,
)


# --------------------------------------------------------------------------
# Technical indicators (operators.indicators) — the analytics layer
# above the reference's daily_change (spark_batch_processor.py:100-101)
# --------------------------------------------------------------------------

#: Shared oracle CTE body: the per-(symbol, day) close series — the
#: proven-green `daily_metrics` close, projected to three columns.
_DAILY_CLOSE_CTE = """
  SELECT DISTINCT
    event_type AS symbol,
    CAST(ts AS DATE) AS date,
    round(last_value(value) OVER w, 4) AS close
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def _daily_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv.daily_metrics(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    ).select("symbol", "date", F.col("daily_close").alias("close"))


def q_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.sma_crossover(
        _daily_close(spark, sf_dir), short=5, long=20, close_col="close"
    )


_SMA_CROSSOVER_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
s AS (
  SELECT symbol, date, close,
         round(CAST(sum(CAST(close AS DECIMAL(18,6))) OVER ws AS DOUBLE)
               / count(*) OVER ws, 6) AS sma_short,
         round(CAST(sum(CAST(close AS DECIMAL(18,6))) OVER wl AS DOUBLE)
               / count(*) OVER wl, 6) AS sma_long,
         row_number() OVER wn AS rn
  FROM d
  WINDOW ws AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wl AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
),
sig AS (
  SELECT symbol, date, close, sma_short, sma_long,
         CASE WHEN sma_short > sma_long THEN 1
              WHEN sma_short < sma_long THEN -1 ELSE 0 END AS signal
  FROM s WHERE rn >= 20
)
SELECT symbol, date, close, sma_short, sma_long, signal,
       CASE WHEN lag(signal) OVER wp IS NULL THEN 0
            WHEN signal = 1 AND lag(signal) OVER wp <= 0 THEN 1
            WHEN signal = -1 AND lag(signal) OVER wp >= 0 THEN -1
            ELSE 0 END AS cross
FROM sig
WINDOW wp AS (PARTITION BY symbol ORDER BY date)
"""


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.bollinger_bands(
        _daily_close(spark, sf_dir), n=20, k=2.0, close_col="close"
    )


_BOLLINGER_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
b AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS mid,
         count(*) OVER w AS n,
         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(sum(CAST(close AS DECIMAL(18,6)) * CAST(close AS DECIMAL(18,6)))
              OVER w AS DOUBLE) AS sxx,
         row_number() OVER wn AS rn
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
),
c AS (
  SELECT symbol, date, close, mid, rn,
         CASE WHEN n >= 2
              THEN sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) END AS sd
  FROM b
)
SELECT symbol, date, close,
       round(mid, 6) AS bb_mid,
       round(mid + 2.0 * sd, 6) AS bb_upper,
       round(mid - 2.0 * sd, 6) AS bb_lower,
       round(CASE WHEN mid + 2.0 * sd <> mid - 2.0 * sd
                  THEN (close - (mid - 2.0 * sd))
                       / ((mid + 2.0 * sd) - (mid - 2.0 * sd)) END, 6) AS pct_b,
       round(CASE WHEN mid <> 0
                  THEN ((mid + 2.0 * sd) - (mid - 2.0 * sd)) / mid END, 6)
         AS bandwidth
FROM c WHERE rn >= 20
"""


def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.rsi(_daily_close(spark, sf_dir), n=14, close_col="close")


_RSI_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
delta AS (
  SELECT symbol, date, close,
         round(greatest(close - lag(close) OVER wl, 0.0), 6) AS gain,
         round(greatest(-(close - lag(close) OVER wl), 0.0), 6) AS loss
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM delta WHERE gain IS NOT NULL),
r AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(gain AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS avg_gain,
         CAST(sum(CAST(loss AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS avg_loss,
         row_number() OVER wn AS rn
  FROM f
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(avg_gain, 6) AS avg_gain,
       round(avg_loss, 6) AS avg_loss,
       round(CASE WHEN avg_loss = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END, 6) AS rsi
FROM r WHERE rn >= 14
"""


def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.drawdown(_daily_close(spark, sf_dir), close_col="close")


_DRAWDOWN_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE})
SELECT symbol, date, close,
       max(close) OVER w AS peak_close,
       CASE WHEN max(close) OVER w <> 0
            THEN round(close / max(close) OVER w - 1, 6) END AS drawdown
FROM d
WINDOW w AS (PARTITION BY symbol ORDER BY date
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.realized_volatility(
        _daily_close(spark, sf_dir), trading_days=252, close_col="close"
    )


_VOLATILITY_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
lr AS (
  SELECT symbol, round(ln(close / lag(close) OVER wl), 6) AS lr
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM lr WHERE lr IS NOT NULL),
a AS (
  SELECT symbol, count(*) AS n_returns,
         CAST(sum(CAST(lr AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(lr AS DECIMAL(18,6)) * CAST(lr AS DECIMAL(18,6)))
              AS DOUBLE) AS sxx
  FROM f GROUP BY symbol
)
SELECT symbol, n_returns,
       round(CASE WHEN n_returns >= 2
                  THEN sqrt(greatest((sxx - sx * sx / n_returns)
                                     / (n_returns - 1), 0.0)) END, 6) AS vol_daily,
       round((CASE WHEN n_returns >= 2
                   THEN sqrt(greatest((sxx - sx * sx / n_returns)
                                      / (n_returns - 1), 0.0)) END)
             * sqrt(252.0), 6) AS vol_annual
FROM a
"""


def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range over the daily OHLCV series (Cutler-style
    SMA of TR; `operators/indicators.py:atr`)."""
    return indicators.atr(q_daily_metrics(spark, sf_dir), n=14)


_ATR_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
t AS (
  SELECT symbol, date, daily_close AS close,
         round(CASE WHEN lag(daily_close) OVER wl IS NULL
                    THEN daily_high - daily_low
                    ELSE greatest(
                        daily_high - daily_low,
                        abs(daily_high - lag(daily_close) OVER wl),
                        abs(daily_low - lag(daily_close) OVER wl)) END,
               6) AS tr
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
r AS (
  SELECT symbol, date, close, tr,
         CAST(sum(CAST(tr AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS atr,
         row_number() OVER wn AS rn
  FROM t
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close, tr, round(atr, 6) AS atr FROM r WHERE rn >= 14
"""


def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Balance Volume — all-integer signed running volume
    (`operators/indicators.py:obv`)."""
    return indicators.obv(q_daily_metrics(spark, sf_dir))


_OBV_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
s AS (
  SELECT symbol, date, daily_close AS close,
         CAST(daily_volume AS BIGINT) AS volume,
         CASE WHEN round(daily_close - lag(daily_close) OVER wl, 6) > 0
              THEN CAST(daily_volume AS BIGINT)
              WHEN round(daily_close - lag(daily_close) OVER wl, 6) < 0
              THEN -CAST(daily_volume AS BIGINT)
              ELSE 0 END AS signed_volume
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close, volume, signed_volume,
       CAST(sum(signed_volume) OVER (PARTITION BY symbol ORDER BY date
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
FROM s
"""


def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K/%D over the daily OHLCV series
    (`operators/indicators.py:stochastic_oscillator`)."""
    return indicators.stochastic_oscillator(q_daily_metrics(spark, sf_dir))


_STOCHASTIC_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
kk AS (
  SELECT symbol, date, daily_close AS close,
         round(CASE WHEN max(daily_high) OVER w <> min(daily_low) OVER w
                    THEN 100.0 * (daily_close - min(daily_low) OVER w)
                         / (max(daily_high) OVER w - min(daily_low) OVER w)
               END, 6) AS pct_k,
         row_number() OVER wn AS rn
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM kk WHERE rn >= 14),
dd AS (
  SELECT symbol, date, close, pct_k,
         CASE WHEN count(pct_k) OVER wd = 3
              THEN round(CAST(sum(CAST(pct_k AS DECIMAL(18,6))) OVER wd
                              AS DOUBLE) / count(*) OVER wd, 6) END AS pct_d,
         row_number() OVER wn2 AS rn2
  FROM f
  WINDOW wd AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         wn2 AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close, pct_k, pct_d FROM dd WHERE rn2 >= 3
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (`operators/behavior.py:event_transitions`)."""
    return behavior.event_transitions(_events(spark, sf_dir))


_EVENT_TRANSITIONS_ORACLE = """
WITH p AS (
  SELECT event_type AS from_event,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_event
  FROM events
),
c AS (
  SELECT from_event, to_event, count(*) AS n
  FROM p WHERE to_event IS NOT NULL GROUP BY from_event, to_event
)
SELECT from_event, to_event, n,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_event)
                                AS DOUBLE) AS p
FROM c
"""


def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance over the customer dimension
    (`operators/relational.py:scd2_apply`): every third customer moves
    to a new market segment effective 2024-06-15 (old version closed,
    new version opened); every 3k+1-th customer receives a *no-op*
    update (identical attributes — must not version); the rest are
    untouched. The oracle is the closed-form union of the three
    outcomes."""
    ensure_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    current = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    eff = F.lit("2024-06-15").cast("date").alias("effective_date")
    changed_u = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", F.lit("MOVED").alias("c_mktsegment"), "c_acctbal", eff
    )
    noop_u = cust.filter(F.col("c_custkey") % 3 == 1).select(
        "c_custkey", "c_mktsegment", "c_acctbal", eff
    )
    return relational.scd2_apply(
        current,
        changed_u.unionByName(noop_u),
        key_cols=["c_custkey"],
        attr_cols=["c_mktsegment", "c_acctbal"],
    )


_SCD2_ORACLE = """
WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer)
SELECT c_custkey, c_mktsegment, c_acctbal,
       DATE '2024-01-01' AS valid_from,
       CASE WHEN c_custkey % 3 = 0 THEN DATE '2024-06-15' END AS valid_to,
       c_custkey % 3 <> 0 AS is_current
FROM base
UNION ALL
SELECT c_custkey, 'MOVED', c_acctbal, DATE '2024-06-15', NULL, TRUE
FROM base WHERE c_custkey % 3 = 0
"""


def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the event stream
    (`operators/metrics.py:data_expectations`): four row-level rules in
    one full-table pass plus a key-uniqueness rule. Rule semantics are
    SQL three-valued (a NULL condition is not a violation — write
    rules null-safely), which is exactly what the oracle's
    ``CASE WHEN NOT(...)`` replays."""
    ensure_engine_conf(spark)
    ev = _events(spark, sf_dir)
    return metrics.data_expectations(
        ev,
        rules={
            "value_not_null": F.col("value").isNotNull(),
            "value_nonnegative": F.col("value") >= 0,
            "known_event_type": F.col("event_type").isin(
                "click", "view", "purchase", "signup", "error"
            ),
            "value_below_250": F.col("value") < 250,
        },
        unique_keys=["event_id"],
    )


_DATA_EXPECTATIONS_ORACLE = """
WITH s AS (
  SELECT count(*) AS n,
    sum(CASE WHEN NOT (value IS NOT NULL) THEN 1 ELSE 0 END) AS r1,
    sum(CASE WHEN NOT (value >= 0) THEN 1 ELSE 0 END) AS r2,
    sum(CASE WHEN NOT (event_type IN
        ('click','view','purchase','signup','error')) THEN 1 ELSE 0 END) AS r3,
    sum(CASE WHEN NOT (value < 250) THEN 1 ELSE 0 END) AS r4
  FROM events
),
u AS (
  SELECT sum(c - 1) AS viol, sum(c) AS n
  FROM (SELECT event_id, count(*) AS c FROM events GROUP BY event_id)
)
SELECT 'value_not_null' AS rule, n AS n_rows,
       CAST(r1 AS BIGINT) AS violations, r1 = 0 AS passed FROM s
UNION ALL
SELECT 'value_nonnegative', n, CAST(r2 AS BIGINT), r2 = 0 FROM s
UNION ALL
SELECT 'known_event_type', n, CAST(r3 AS BIGINT), r3 = 0 FROM s
UNION ALL
SELECT 'value_below_250', n, CAST(r4 AS BIGINT), r4 = 0 FROM s
UNION ALL
SELECT 'unique(event_id)', CAST(n AS BIGINT), CAST(viol AS BIGINT),
       viol = 0 FROM u
"""


def q_pairwise_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.pairwise_correlation(
        _daily_close(spark, sf_dir), close_col="close"
    )


_PAIRWISE_CORR_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
r AS (
  SELECT symbol, date, round(close / lag(close) OVER wl - 1, 6) AS ret
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM r WHERE ret IS NOT NULL),
g AS (
  SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
         count(*) AS n_days,
         CAST(sum(CAST(a.ret AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(b.ret AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         -- DECIMAL(19,6) operands: 19+19=38 keeps the product inside
         -- DuckDB's max decimal width (18+18 hits the int64 physical
         -- type, which overflowed on fat-tailed returns at sf0.1)
         CAST(sum(CAST(a.ret AS DECIMAL(19,6)) * CAST(b.ret AS DECIMAL(19,6)))
              AS DOUBLE) AS sxy,
         CAST(sum(CAST(a.ret AS DECIMAL(19,6)) * CAST(a.ret AS DECIMAL(19,6)))
              AS DOUBLE) AS sxx,
         CAST(sum(CAST(b.ret AS DECIMAL(19,6)) * CAST(b.ret AS DECIMAL(19,6)))
              AS DOUBLE) AS syy
  FROM f a JOIN f b ON a.date = b.date AND a.symbol < b.symbol
  GROUP BY 1, 2
)
SELECT symbol_a, symbol_b, n_days,
       round(CASE WHEN sqrt(n_days * sxx - sx * sx)
                       * sqrt(n_days * syy - sy * sy) <> 0
                  THEN (n_days * sxy - sx * sy)
                       / (sqrt(n_days * sxx - sx * sx)
                          * sqrt(n_days * syy - sy * sy)) END, 6) AS corr
FROM g
"""


def q_ema_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return indicators.ema_macd(
        _daily_close(spark, sf_dir), fast=12, slow=26, signal=9, close_col="close"
    )


# EMA recursion replayed declaratively: DuckDB recursive CTE walking
# each symbol's close series by row_number, with the identical
# two-multiply-one-add update (same operand order → same IEEE doubles).
_EMA_MACD_ORACLE = f"""
WITH RECURSIVE d AS ({_DAILY_CLOSE_CTE}),
b AS (
  SELECT symbol, date, close,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
rec AS (
  SELECT symbol, date, close, rn,
         close AS ema_fast, close AS ema_slow,
         CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS macd_signal
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.date, b.close, b.rn,
         2.0/13 * b.close + (1 - 2.0/13) * r.ema_fast,
         2.0/27 * b.close + (1 - 2.0/27) * r.ema_slow,
         (2.0/13 * b.close + (1 - 2.0/13) * r.ema_fast)
           - (2.0/27 * b.close + (1 - 2.0/27) * r.ema_slow),
         2.0/10 * ((2.0/13 * b.close + (1 - 2.0/13) * r.ema_fast)
                   - (2.0/27 * b.close + (1 - 2.0/27) * r.ema_slow))
           + (1 - 2.0/10) * r.macd_signal
  FROM b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, date, close,
       round(ema_fast, 6) AS ema_fast,
       round(ema_slow, 6) AS ema_slow,
       round(macd, 6) AS macd,
       round(macd_signal, 6) AS macd_signal,
       round(macd - macd_signal, 6) AS macd_hist
FROM rec
"""


def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped 'who holds excess stock' (adapted: shipped
    lineitem quantity stands in for partsupp availability). Suppliers
    in one region who, for at least one '%red%' part, shipped more
    than 15% of that part's total quantity (threshold tuned so the
    screen is selective-but-nonempty on the synthetic data). The original's nested
    IN-subqueries become one aggregation + a window share + two
    broadcast semi-joins — no correlated rescans.

    Quantity sums are integer-valued DECIMALs — exact everywhere.
    """
    li = _table("lineitem")(spark, sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    parts = (
        _table("part")(spark, sf_dir)
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    per_ps = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty")
        )
    )
    wpart = Window.partitionBy("l_partkey")
    excess = per_ps.withColumn(
        "part_total", F.sum(F.col("qty").cast("decimal(18,6)")).over(wpart).cast("double")
    ).where(F.col("qty") > F.col("part_total") * F.lit(0.15))
    supp = _table("supplier")(spark, sf_dir)
    nation = _table("nation")(spark, sf_dir).select("n_nationkey", "n_name")
    region_suppliers = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        region_suppliers.join(
            excess.select("l_suppkey").distinct(),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "n_name")
    )


_EXCESS_SUPPLIERS_ORACLE = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
  GROUP BY 1, 2
),
ex AS (
  SELECT *, CAST(sum(CAST(qty AS DECIMAL(18,6)))
                 OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_total
  FROM per_ps
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT DISTINCT l_suppkey FROM ex WHERE qty > part_total * 0.15
)
"""


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the schema's foreign keys:
    orphaned child rows per relationship (lineitem→orders/part/
    supplier, orders→customer, customer/supplier→nation) — the
    data-quality gate a warehouse load runs before publishing
    (complements `metrics.data_expectations`, which is row-local).

    Each check is one left-anti join against a (broadcastable or
    key-projected) parent; counts union into a long-form report. At
    100 TB the two big anti-joins shuffle on their join key once;
    dimension parents broadcast.
    """
    li = _table("lineitem")(spark, sf_dir)
    orders = _table("orders")(spark, sf_dir)
    customer = _table("customer")(spark, sf_dir)
    supplier = _table("supplier")(spark, sf_dir)
    part = _table("part")(spark, sf_dir)
    nation = _table("nation")(spark, sf_dir)

    def orphans(child, child_key, parent, parent_key, rel):
        cnt = (
            child.join(
                parent.select(parent_key),
                F.col(child_key) == F.col(parent_key),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(
                F.lit(rel).alias("relationship"),
                "n_orphans",
            )
        )
        return cnt

    checks = [
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        orphans(li, "l_partkey", part, "p_partkey", "lineitem->part"),
        orphans(li, "l_suppkey", supplier, "s_suppkey", "lineitem->supplier"),
        orphans(orders, "o_custkey", customer, "c_custkey", "orders->customer"),
        orphans(customer, "c_nationkey", nation, "n_nationkey", "customer->nation"),
        orphans(supplier, "s_nationkey", nation, "n_nationkey", "supplier->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


_FK_INTEGRITY_ORACLE = """
SELECT 'lineitem->orders' AS relationship,
       (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
         (SELECT o_orderkey FROM orders)) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
         (SELECT p_partkey FROM part))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
         (SELECT s_suppkey FROM supplier))
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM orders WHERE o_custkey NOT IN
         (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
         (SELECT n_nationkey FROM nation))
UNION ALL
SELECT 'supplier->nation',
       (SELECT count(*) FROM supplier WHERE s_nationkey NOT IN
         (SELECT n_nationkey FROM nation))
"""


def q_pairs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-trading log-spread with rolling z-score for a fixed
    symbol pair (view vs click): spread = ln(a) − ln(b) on shared
    dates, z-scored against a trailing 10-day exact mean/std —
    the stat-arb entry/exit signal. One date-aligned self-join of the
    tiny daily frame + one symbol-pair window."""
    daily = _daily_close(spark, sf_dir)
    a = daily.where(F.col("symbol") == "view").select(
        "date", F.col("close").alias("close_a")
    )
    b = daily.where(F.col("symbol") == "click").select(
        "date", F.col("close").alias("close_b")
    )
    j = a.join(b, "date")
    spread = F.round(F.log("close_a") - F.log("close_b"), 6)
    base = j.select("date", "close_a", "close_b", spread.alias("spread"))
    w = Window.orderBy("date").rowsBetween(-9, 0)
    cnt = F.count(F.lit(1)).over(w)
    d = F.col("spread").cast("decimal(18,6)")
    sx = F.sum(d).over(w).cast("double")
    sxx = F.sum(d * d).over(w).cast("double")
    mean = sx / cnt
    var = (sxx - sx * sx / cnt) / (cnt - F.lit(1))
    std = F.when(cnt >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
    z = F.when((cnt == 10) & (std > 0), (F.col("spread") - mean) / std)
    return base.select(
        "date",
        "spread",
        F.round(mean, 6).alias("spread_ma10"),
        F.round(z, 4).alias("zscore"),
    )


_PAIRS_SPREAD_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
a AS (SELECT date, close AS close_a FROM d WHERE symbol = 'view'),
b AS (SELECT date, close AS close_b FROM d WHERE symbol = 'click'),
j AS (
  SELECT a.date, round(ln(close_a) - ln(close_b), 6) AS spread
  FROM a JOIN b ON a.date = b.date
),
r AS (
  SELECT date, spread,
    count(*) OVER w AS cnt,
    CAST(sum(CAST(spread AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
    CAST(sum(CAST(spread AS DECIMAL(18,6)) * CAST(spread AS DECIMAL(18,6)))
         OVER w AS DOUBLE) AS sxx
  FROM j
  WINDOW w AS (ORDER BY date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT date, spread,
  {_round_sql("sx / cnt", 6)} AS spread_ma10,
  {_round_sql(
      "CASE WHEN cnt = 10 AND "
      "sqrt(greatest((sxx - sx * sx / cnt) / (cnt - 1), 0.0)) > 0 "
      "THEN (spread - sx / cnt) "
      "/ sqrt(greatest((sxx - sx * sx / cnt) / (cnt - 1), 0.0)) END", 4)}
    AS zscore
FROM r
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5% furthest-from-centroid embeddings per label
    (`operators/similarity.py:embedding_outliers`)."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_outliers(embs, top_pct=5)


_EMBEDDING_OUTLIERS_ORACLE = f"""
WITH x AS (
  SELECT vec_id AS vid, label AS lbl, dim,
         round(CAST(embedding[dim] AS DOUBLE), 6) AS x6
  FROM embeddings, unnest(range(1, 65)) AS t(dim)
),
cents AS (
  SELECT label AS lbl, i AS dim,
    floor((CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                 AS DECIMAL(18,6))) AS DOUBLE) / count(*))
          * 1000000.0 + 0.5) / 1000000.0 AS c6
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  GROUP BY 1, 2
),
d AS (
  SELECT vid, lbl,
    CAST(sum(CAST(floor((x6 - c6) * (x6 - c6) * 1000000.0 + 0.5)
                  / 1000000.0 AS DECIMAL(18,6))) AS DOUBLE) AS dist2
  FROM x JOIN cents USING (lbl, dim) GROUP BY 1, 2
),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY lbl ORDER BY dist2 DESC, vid) AS rnk,
    count(*) OVER (PARTITION BY lbl) AS n
  FROM d
)
SELECT vid AS vec_id, lbl AS label,
       floor(dist2 * 1000000.0 + 0.5) / 1000000.0 AS dist2, rnk AS outlier_rank
FROM r WHERE rnk <= (n * 5 + 99) // 100
"""


def q_rank_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tercile momentum portfolios and their next-day returns
    (`operators/indicators.py:rank_portfolio_returns`)."""
    return indicators.rank_portfolio_returns(
        _daily_close(spark, sf_dir), lookback=5, n_buckets=3, close_col="close"
    )


_RANK_PORTFOLIO_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
r AS (
  SELECT symbol, date,
    round(close / lag(close, 5) OVER ws - 1, 6) AS r_past,
    round(lead(close) OVER ws / close - 1, 6) AS r_fwd
  FROM d
  WINDOW ws AS (PARTITION BY symbol ORDER BY date)
),
b AS (
  SELECT date, r_fwd,
    ntile(3) OVER (PARTITION BY date ORDER BY r_past, symbol) AS bucket
  FROM r WHERE r_past IS NOT NULL AND r_fwd IS NOT NULL
)
SELECT date, bucket, count(*) AS n_symbols,
  {_round_sql("CAST(sum(CAST(r_fwd AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)}
    AS mean_fwd_return
FROM b GROUP BY 1, 2
"""


def q_calendar_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol day-level feed-health report
    (`operators/temporal.py:calendar_coverage`)."""
    return temporal.calendar_coverage(q_daily_metrics(spark, sf_dir))


_CALENDAR_COVERAGE_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
dd AS (SELECT DISTINCT symbol AS key, date AS d FROM d),
g AS (
  SELECT key, d,
    date_diff('day', lag(d) OVER (PARTITION BY key ORDER BY d), d) AS gap
  FROM dd
)
SELECT key, min(d) AS first_date, max(d) AS last_date,
  count(*) AS days_present,
  date_diff('day', min(d), max(d)) + 1 AS span_days,
  round(CAST(count(*) AS DOUBLE)
        / (date_diff('day', min(d), max(d)) + 1), 6) AS coverage_ratio,
  coalesce(max(gap), 1) - 1 AS longest_gap_days
FROM g GROUP BY 1
"""


def q_pii_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII span extraction (audit twin of pii_redact) over the same
    seeded corpus (`operators/text.py:pii_spans`)."""
    docs = _table("documents")(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com tel 55512340"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.pii_spans(seeded)


_PII_SPANS_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com tel 55512340' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id, 'email' AS span_type,
       CAST(generate_subscripts(l, 1) AS INT) AS occurrence,
       unnest(l) AS span_text
FROM (SELECT doc_id,
        regexp_extract_all(text, '{text.EMAIL_PATTERN}') AS l FROM seeded)
UNION ALL
SELECT doc_id, 'long_number' AS span_type,
       CAST(generate_subscripts(l, 1) AS INT) AS occurrence,
       unnest(l) AS span_text
FROM (SELECT doc_id,
        regexp_extract_all(
          regexp_replace(text, '{text.EMAIL_PATTERN}', '<EMAIL>', 'g'),
          '{text.LONG_NUM_PATTERN}') AS l FROM seeded)
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: the documents table against a
    deterministically perturbed next crawl (drop ids ≡0 mod 17,
    rewrite text for ids ≡0 mod 10, add ids shifted by 10⁶ for ids
    ≡0 mod 23) — per-id added/deleted/changed/unchanged status
    (`operators/relational.py:snapshot_diff`)."""
    ensure_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    survived = docs.where(F.col("doc_id") % 17 != 0)
    rewritten = survived.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.lit("v2 "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    additions = docs.where(F.col("doc_id") % 23 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    new = rewritten.unionByName(additions)
    return relational.snapshot_diff(docs, new, "doc_id", ["text", "lang"])


_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
  SELECT doc_id, md5(CAST(text AS VARCHAR) || chr(31) || CAST(lang AS VARCHAR)) AS h
  FROM documents
),
new AS (
  SELECT doc_id,
    md5(CASE WHEN doc_id % 10 = 0 THEN 'v2 ' || text ELSE text END
        || chr(31) || lang) AS h
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
    md5(CAST(text AS VARCHAR) || chr(31) || CAST(lang AS VARCHAR)) AS h
  FROM documents WHERE doc_id % 23 = 0
)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
  CASE WHEN old.h IS NULL THEN 'added'
       WHEN new.h IS NULL THEN 'deleted'
       WHEN old.h = new.h THEN 'unchanged'
       ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletion-neighborhood fuzzy join: deterministically
    typo'd part names (3rd char dropped for partkey ≡ 0 mod 7)
    re-matched to the canonical name list at edit distance ≤ 1 — never
    an all-pairs comparison (`operators/text.py:fuzzy_join_symdelete`)."""
    part = _table("part")(spark, sf_dir)
    canon = part.select("p_name")
    typo = F.concat(
        F.substring(F.col("p_name"), 1, 2),
        F.substring(F.col("p_name"), 4, F.length("p_name")),
    )
    typos = part.where(F.col("p_partkey") % 7 == 0).select(
        typo.alias("typo_name")
    )
    out = text.fuzzy_join_symdelete(typos, canon, "typo_name", "p_name")
    return out.select(
        F.col("left_value").alias("typo_name"),
        F.col("right_value").alias("matched_name"),
        "edit_distance",
    )


_FUZZY_JOIN_ORACLE = """
WITH canon AS (SELECT DISTINCT p_name AS v FROM part),
typos AS (
  SELECT DISTINCT substr(p_name, 1, 2) || substr(p_name, 4) AS v
  FROM part WHERE p_partkey % 7 = 0
),
va AS (
  SELECT DISTINCT v AS left_value,
    CASE WHEN i = 0 THEN v
         ELSE substr(v, 1, i - 1) || substr(v, i + 1) END AS variant
  FROM typos, unnest(range(0, length(v) + 1)) AS t(i)
),
vb AS (
  SELECT DISTINCT v AS right_value,
    CASE WHEN i = 0 THEN v
         ELSE substr(v, 1, i - 1) || substr(v, i + 1) END AS variant
  FROM canon, unnest(range(0, length(v) + 1)) AS t(i)
)
SELECT DISTINCT left_value AS typo_name, right_value AS matched_name,
       levenshtein(left_value, right_value) AS edit_distance
FROM va JOIN vb USING (variant)
WHERE levenshtein(left_value, right_value) <= 1
"""


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-per-tail trimmed vs raw mean of event values per type
    (`operators/metrics.py:trimmed_mean`)."""
    return metrics.trimmed_mean(
        _events(spark, sf_dir), key_cols=["event_type"], value_col="value"
    )


_TRIMMED_MEAN_ORACLE = f"""
WITH r AS (
  SELECT event_type, round(value, 6) AS v,
    row_number() OVER (PARTITION BY event_type ORDER BY round(value, 6)) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
k AS (SELECT *, (n * 10) // 100 AS k FROM r)
SELECT event_type, max(n) AS n, max(k) AS k_each_side,
  {_round_sql("CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / max(n)", 6)}
    AS mean_all,
  {_round_sql(
      "CAST(sum(CASE WHEN rn > k AND rn <= n - k "
      "THEN CAST(v AS DECIMAL(18,6)) END) AS DOUBLE) / (max(n) - 2 * max(k))",
      6)} AS mean_trimmed
FROM k GROUP BY 1
"""


def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join (views ⟕ purchases
    within 10 min per user), drained availableNow
    (`streaming/pipeline.py:stream_interval_left_join`). The oracle
    replays BOTH legs: all matched pairs, plus unmatched views whose
    match window the final watermark (max event time − 1 h) passed —
    the outer-emission rule."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    views = src.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id")
    )
    purchases = src.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    out = pipeline.stream_interval_left_join(
        views,
        purchases,
        key="user_id",
        left_ts="v_ts",
        right_ts="p_ts",
        upper_s=600,
        watermark="1 hours",
    )
    tmp = tempfile.mkdtemp(prefix="slj_q_")
    name = "stream_left_join_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_STREAM_LEFT_JOIN_ORACLE = """
WITH v AS (
  SELECT user_id, ts AS v_ts, event_id AS v_id FROM events
  WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
  WHERE event_type = 'purchase'
),
matched AS (
  SELECT v.user_id, v.v_ts, v.v_id, p.p_ts, p.p_id
  FROM v JOIN p ON v.user_id = p.user_id
   AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 600 SECOND
),
-- the query's global watermark is the MIN across its two inputs
-- (a lagging/empty right stream holds outer emission back — verified
-- empirically: an all-views stream emits NO unmatched rows at all)
mx AS (
  SELECT least((SELECT max(v_ts) FROM v), (SELECT max(p_ts) FROM p)) AS m
)
SELECT * FROM matched
UNION ALL
SELECT v.user_id, v.v_ts, v.v_id, NULL AS p_ts, NULL AS p_id
FROM v, mx
WHERE NOT EXISTS (
  SELECT 1 FROM p WHERE p.user_id = v.user_id
    AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 600 SECOND
)
AND epoch_ms(v.v_ts + INTERVAL 600 SECOND) < epoch_ms(mx.m) - 3600000
"""


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: history splits into two
    halves (even/odd day), each aggregates independently, and
    `relational.merge_aggregates` combines the partials — the oracle
    recomputes from scratch, checking the decomposability law
    merge(agg(A), agg(B)) == agg(A ∪ B)."""
    ev = _events(spark, sf_dir)
    base = relational.decomposed_agg(
        ev.where(F.dayofmonth("ts") % 2 == 0), ["event_type"], "value"
    )
    delta = relational.decomposed_agg(
        ev.where(F.dayofmonth("ts") % 2 == 1), ["event_type"], "value"
    )
    return relational.merge_aggregates(base, delta, ["event_type"])


_INCREMENTAL_AGG_ORACLE = f"""
WITH v AS (SELECT event_type, round(value, 6) AS v FROM events)
SELECT event_type, count(*) AS n,
  round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value,
  min(v) AS min_value, max(v) AS max_value,
  {_round_sql("CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)}
    AS avg_value
FROM v GROUP BY 1
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus char-bigram LM quality score per document
    (`operators/text.py:bigram_lm_scores`)."""
    ensure_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return text.bigram_lm_scores(docs)


_BIGRAM_LM_ORACLE = f"""
WITH nrm AS (
  SELECT doc_id, {_NORM.format(col='text')} AS nn FROM documents
),
grams AS (
  SELECT doc_id, substr(nn, i, 2) AS bg, substr(nn, i, 1) AS pf
  FROM nrm, unnest(range(1, greatest(length(nn), 1))) AS t(i)
),
bgc AS (SELECT bg, count(*) AS n_bg FROM grams GROUP BY 1),
pfc AS (SELECT pf, count(*) AS n_pf FROM grams GROUP BY 1),
scored AS (
  SELECT doc_id,
    {_round_sql("-log2(CAST(n_bg AS DOUBLE) / n_pf)", 6)} AS nlp
  FROM grams JOIN bgc USING (bg) JOIN pfc USING (pf)
)
SELECT doc_id, count(*) AS n_bigrams,
  {_round_sql("CAST(sum(CAST(nlp AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 4)}
    AS avg_neg_log2
FROM scored GROUP BY 1
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() flags — the third
    multi-level-aggregate surface next to the registered ROLLUP and
    CUBE queries: detail by (returnflag, linestatus), subtotal by
    returnflag, grand total, in ONE pass (Catalyst expands the sets
    into a single shuffle with a grouping-id column — no per-level
    rescan). Exercised through the SQL surface, as the reference's
    users would write it."""
    li = _table("lineitem")(spark, sf_dir)
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               grouping(l_returnflag) AS grp_rf,
               grouping(l_linestatus) AS grp_ls,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


_GROUPING_SETS_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(grouping(l_returnflag) AS INT) AS grp_rf,
       CAST(grouping(l_linestatus) AS INT) AS grp_ls,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill onto a 6-hour per-type grid
    (`operators/temporal.py:resample_interp`)."""
    ev = _events(spark, sf_dir)
    return temporal.resample_interp(
        ev,
        key_col="event_type",
        ts_col="ts",
        value_col="value",
        step_seconds=21600,
        id_col="event_id",
    )


_RESAMPLE_INTERP_ORACLE = f"""
WITH t AS (
  SELECT event_type AS "key",
         make_timestamp(epoch_us(ts) - (epoch_us(ts) % 21600000000)) AS bucket_ts,
         ts, event_id, value
  FROM events
),
cells AS (
  SELECT "key", bucket_ts, value AS obs, n FROM (
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
),
j AS (
  SELECT g."key", g.bucket_ts, c.obs, coalesce(c.n, 0) AS n_ticks,
         epoch_us(g.bucket_ts) AS t_us,
         CASE WHEN c.obs IS NOT NULL THEN epoch_us(g.bucket_ts) END AS ot
  FROM grid g LEFT JOIN cells c
    ON c."key" = g."key" AND c.bucket_ts = g.bucket_ts
),
ff AS (
  SELECT *,
    last_value(obs IGNORE NULLS) OVER wp AS prev_v,
    last_value(ot IGNORE NULLS) OVER wp AS prev_t,
    first_value(obs IGNORE NULLS) OVER wn AS next_v,
    first_value(ot IGNORE NULLS) OVER wn AS next_t
  FROM j
  WINDOW wp AS (PARTITION BY "key" ORDER BY bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY "key" ORDER BY bucket_ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT "key", bucket_ts,
  CASE WHEN obs IS NOT NULL THEN obs
       ELSE {_round_sql(
           "prev_v + (next_v - prev_v)"
           " * (CAST(t_us - prev_t AS DOUBLE) / (next_t - prev_t))", 6)}
  END AS value,
  n_ticks,
  CAST(obs IS NOT NULL AS INT) AS is_observed
FROM ff
"""


def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report over the documents language column —
    the decide-whether-to-salt diagnostic
    (`operators/metrics.py:skew_stats`)."""
    ensure_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return metrics.skew_stats(docs, key_col="lang", top_n=10)


_SKEW_STATS_ORACLE = """
WITH counts AS (
  SELECT CAST(lang AS VARCHAR) AS key, count(*) AS n
  FROM documents GROUP BY 1
),
g AS (
  SELECT key, n,
    CAST(sum(n) OVER () AS BIGINT) AS total,
    count(*) OVER () AS n_keys,
    row_number() OVER (ORDER BY n DESC, key) AS "rank"
  FROM counts
)
SELECT key, "rank", n,
  round(CAST(n AS DOUBLE) / total, 6) AS share,
  round(CAST(n AS DOUBLE) / (CAST(total AS DOUBLE) / n_keys), 4)
    AS vs_mean_ratio
FROM g WHERE "rank" <= 10
"""


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order co-clustering key over (p_size, p_retailprice)
    (`operators/sampling.py:zorder_key`) — the write-side layout that
    makes 2-D range predicates prune zone maps."""
    part = _table("part")(spark, sf_dir).select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return sampling.zorder_key(part, "p_size", "p_retailprice", bits=8).select(
        "p_partkey", "bucket_a", "bucket_b", "zkey"
    )


def _zorder_oracle(bits: int = 8) -> str:
    n = float((1 << bits) - 1)
    interleave = " + ".join(
        f"((bucket_a >> {i}) & 1) * {1 << (2 * i + 1)}"
        f" + ((bucket_b >> {i}) & 1) * {1 << (2 * i)}"
        for i in range(bits)
    )

    def bucket(col, lo, hi):
        return (
            f"least(CAST(floor((CASE WHEN {hi} > {lo} THEN "
            f"(CAST({col} AS DOUBLE) - {lo}) / ({hi} - {lo}) "
            f"ELSE 0.0 END) * {n + 1.0}) AS BIGINT), {int(n)})"
        )

    return f"""
WITH mm AS (
  SELECT p_partkey, p_size, p_retailprice,
    min(CAST(p_size AS DOUBLE)) OVER () AS amin,
    max(CAST(p_size AS DOUBLE)) OVER () AS amax,
    min(CAST(p_retailprice AS DOUBLE)) OVER () AS bmin,
    max(CAST(p_retailprice AS DOUBLE)) OVER () AS bmax
  FROM part
),
b AS (
  SELECT p_partkey,
    {bucket("p_size", "amin", "amax")} AS bucket_a,
    {bucket("p_retailprice", "bmin", "bmax")} AS bucket_b
  FROM mm
)
SELECT p_partkey, bucket_a, bucket_b,
       CAST({interleave} AS BIGINT) AS zkey
FROM b
"""


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join + watermarked daily aggregate,
    drained with availableNow (`streaming/pipeline.py:
    stream_static_enrich_agg`). The static side is the per-type mean
    value computed batch-side — the dimension a live feed enriches
    against."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    ev = _events(spark, sf_dir)
    ref = ev.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("ref_value")
    )
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    out = pipeline.stream_static_enrich_agg(src, ref)
    tmp = tempfile.mkdtemp(prefix="sstatic_q_")
    name = "stream_static_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_STREAM_STATIC_ORACLE = """
WITH ref AS (
  SELECT event_type,
    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
      AS ref_value
  FROM events GROUP BY 1
),
agg AS (
  SELECT e.event_type, CAST(e.ts AS DATE) AS date,
         count(*) AS n_events,
         count(CASE WHEN e.value > r.ref_value THEN 1 END) AS n_above_ref
  FROM events e JOIN ref r ON e.event_type = r.event_type
  GROUP BY 1, 2
),
mx AS (SELECT max(ts) AS m FROM events)
-- append emits a day-window only once the 1-day watermark passes its
-- end (same emission replay as _STREAM_WINDOW_APPEND_ORACLE)
SELECT event_type, date, n_events, n_above_ref
FROM agg, mx
WHERE epoch_ms(CAST(date AS TIMESTAMP) + INTERVAL 1 DAY)
      <= epoch_ms(m) - 86400000
"""


def q_candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick pattern flags (doji/hammer/engulfing) on the daily
    OHLC frame (`operators/indicators.py:candle_patterns`)."""
    return indicators.candle_patterns(q_daily_metrics(spark, sf_dir))


_CANDLE_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
l AS (
  SELECT symbol, date,
    daily_open AS o, daily_high AS h, daily_low AS lo, daily_close AS c,
    lag(daily_open) OVER wl AS po, lag(daily_close) OVER wl AS pc
  FROM d WINDOW wl AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date,
  CAST(h - lo > 0 AND abs(c - o) <= 0.1 * (h - lo) AS INT) AS doji,
  CAST(h - lo > 0 AND least(o, c) - lo >= 2.0 * abs(c - o)
       AND h - greatest(o, c) <= abs(c - o) AS INT) AS hammer,
  CAST(po IS NOT NULL AND po > pc AND c > o AND o <= pc AND c >= po
       AS INT) AS bull_engulf,
  CAST(po IS NOT NULL AND pc > po AND o > c AND o >= pc AND c <= po
       AS INT) AS bear_engulf
FROM l
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/weekday-seasonal/residual decomposition of the
    daily close (`operators/ohlcv.py:seasonal_decompose`)."""
    return ohlcv.seasonal_decompose(q_daily_metrics(spark, sf_dir))


_SEASONAL_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
t AS (
  SELECT symbol, date, daily_close AS close, isodow(date) AS iso_weekday,
    count(*) OVER wc AS cnt,
    {_round_sql("CAST(sum(CAST(daily_close AS DECIMAL(18,6))) OVER wc AS DOUBLE) / (count(*) OVER wc)", 4)} AS trend
  FROM d
  WINDOW wc AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT symbol, date, close, iso_weekday, trend,
    {_round_sql("close - trend", 4)} AS detrended
  FROM t WHERE cnt = 7
),
seas AS (
  SELECT symbol, iso_weekday,
    {_round_sql("CAST(sum(CAST(detrended AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 4)} AS seasonal
  FROM det GROUP BY 1, 2
)
SELECT det.symbol, date, close, trend, seasonal,
  {_round_sql("detrended - seasonal", 4)} AS resid
FROM det JOIN seas ON det.symbol = seas.symbol
                  AND det.iso_weekday = seas.iso_weekday
"""


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→purchase time-to-convert distribution (count, exact mean,
    discrete median/p90; `operators/behavior.py:conversion_latency`)."""
    return behavior.conversion_latency(
        _events(spark, sf_dir), from_event="view", to_event="purchase"
    )


_CONVERSION_LATENCY_ORACLE = f"""
WITH u1 AS (
  SELECT user_id, event_type, ts,
    min(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id) AS t_from
  FROM events
),
u2 AS (
  SELECT user_id, t_from,
    min(CASE WHEN event_type = 'purchase' AND ts >= t_from THEN ts END)
      OVER (PARTITION BY user_id) AS t_to
  FROM u1
),
pu AS (
  SELECT DISTINCT user_id,
    {_round_sql("(epoch_us(t_to) - epoch_us(t_from)) / 1000000.0", 6)} AS lat_s
  FROM u2 WHERE t_from IS NOT NULL AND t_to IS NOT NULL
),
rk AS (
  SELECT lat_s,
    row_number() OVER (ORDER BY lat_s, user_id) AS rn,
    count(*) OVER () AS n
  FROM pu
)
SELECT max(n) AS n_converted,
  {_round_sql("CAST(sum(CAST(lat_s AS DECIMAL(18,6))) AS DOUBLE) / max(n)", 6)}
    AS mean_latency_s,
  max(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) AS median_latency_s,
  max(CASE WHEN rn = (n * 9 + 9) // 10 THEN lat_s END) AS p90_latency_s
FROM rk
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sampling at an expected
    30% rate (`operators/sampling.py:weighted_sample`)."""
    ensure_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return sampling.weighted_sample(
        docs, id_col="doc_id", weight_col="n_chars", target_fraction=0.3
    )


_WEIGHTED_SAMPLE_ORACLE = f"""
WITH b AS (
  SELECT doc_id, round(CAST(n_chars AS DOUBLE), 6) AS w FROM documents
),
m AS (
  SELECT CAST(sum(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS w_mean
  FROM b
),
p AS (
  SELECT doc_id, w,
    {_round_sql("least(1.0, 0.3 * w / w_mean)", 6)} AS keep_prob,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 1000000 AS bk
  FROM b CROSS JOIN m
)
SELECT doc_id, w AS n_chars, keep_prob
FROM p WHERE bk < keep_prob * 1000000.0
"""


def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per symbol via rescaled-range analysis at block
    sizes 4/8/16 (`operators/indicators.py:hurst_rs`)."""
    return indicators.hurst_rs(
        _daily_close(spark, sf_dir), windows=(4, 8, 16), close_col="close"
    )


def _hurst_oracle(windows=(4, 8, 16)) -> str:
    import math

    w_lo, w_hi = windows[0], windows[-1]
    denom = repr(math.log(float(w_hi)) - math.log(float(w_lo)))
    w_list = ", ".join(str(w) for w in windows)
    pivots = ",\n  ".join(
        f"max(CASE WHEN w = {w} THEN rs_avg END) AS rs_{w}" for w in windows
    )
    rs_cols = ", ".join(f"rs_{w}" for w in windows)
    return f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
r0 AS (
  SELECT symbol,
    row_number() OVER ws - 2 AS idx,
    {_round_sql("CASE WHEN lag(close) OVER ws <> 0 THEN close / lag(close) OVER ws - 1 END", 6)} AS r
  FROM d
  WINDOW ws AS (PARTITION BY symbol ORDER BY date)
),
r1 AS (SELECT * FROM r0 WHERE r IS NOT NULL),
b AS (
  SELECT symbol, idx, r, w, idx // w AS block
  FROM r1 CROSS JOIN (SELECT unnest([{w_list}]) AS w) _w
),
f0 AS (
  SELECT *, count(*) OVER wb AS cnt,
    {_round_sql("CAST(sum(CAST(r AS DECIMAL(18,6))) OVER wb AS DOUBLE) / (count(*) OVER wb)", 6)} AS m
  FROM b
  WINDOW wb AS (PARTITION BY symbol, w, block)
),
f AS (SELECT * FROM f0 WHERE cnt = w),
dd AS (
  SELECT symbol, w, block, idx,
    {_round_sql("r - m", 6)} AS dev
  FROM f
),
cc AS (
  SELECT symbol, w, block, dev,
    CAST(sum(CAST(dev AS DECIMAL(18,6)))
         OVER (PARTITION BY symbol, w, block ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS cum
  FROM dd
),
pb AS (
  SELECT symbol, w, block,
    max(cum) - min(cum) AS rng,
    sqrt(CAST(sum(CAST({_round_sql("dev * dev", 6)} AS DECIMAL(18,6)))
              AS DOUBLE) / min(w)) AS s
  FROM cc GROUP BY 1, 2, 3
),
rs AS (
  SELECT symbol, w, {_round_sql("rng / s", 6)} AS rs
  FROM pb WHERE s > 0
),
pw AS (
  SELECT symbol, w,
    {_round_sql("CAST(sum(CAST(rs AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)} AS rs_avg,
    count(*) AS n_blocks
  FROM rs GROUP BY 1, 2
),
piv AS (
  SELECT symbol,
  {pivots},
  CAST(sum(n_blocks) AS BIGINT) AS n_blocks
  FROM pw GROUP BY 1
)
SELECT symbol, n_blocks, {rs_cols},
  {_round_sql(f"CASE WHEN rs_{w_lo} > 0 AND rs_{w_hi} > 0 THEN (ln(rs_{w_hi}) - ln(rs_{w_lo})) / {denom} END", 4)} AS hurst
FROM piv
"""


def q_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol OLS time trend (slope/intercept/R²) of the daily
    close (`operators/indicators.py:trend_ols`)."""
    return indicators.trend_ols(_daily_close(spark, sf_dir), close_col="close")


_TREND_OLS_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
b AS (
  SELECT symbol,
    row_number() OVER (PARTITION BY symbol ORDER BY date) - 1 AS x,
    CAST(close AS DECIMAL(18,4)) AS y
  FROM d
),
a AS (
  SELECT symbol, count(*) AS n,
    CAST(sum(x) AS DOUBLE) AS sx,
    CAST(sum(x * x) AS DOUBLE) AS sxx,
    CAST(sum(y) AS DOUBLE) AS sy,
    CAST(sum(CAST(x AS DECIMAL(10,0)) * y) AS DOUBLE) AS sxy,
    CAST(sum(y * y) AS DOUBLE) AS syy
  FROM b GROUP BY 1
)
SELECT symbol, n AS n_days,
  {_round_sql("CASE WHEN n * sxx - sx * sx > 0 THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END", 6)} AS slope,
  {_round_sql("CASE WHEN n * sxx - sx * sx > 0 THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END", 6)} AS intercept,
  {_round_sql("CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END", 6)} AS r2
FROM a
"""


def q_ofi_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute order-flow-imbalance bars from tick-rule classified
    events (`operators/indicators.py:ofi_bars`)."""
    ev = _events(spark, sf_dir)
    return indicators.ofi_bars(
        ev,
        bar_seconds=900,
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )


_OFI_BARS_ORACLE = """
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
  SELECT symbol, ts,
         last_value(raw IGNORE NULLS)
           OVER (PARTITION BY symbol, date ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS side
  FROM s
)
SELECT symbol,
       make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000) AS bar_start,
       count(CASE WHEN side = 1 THEN 1 END) AS n_buy,
       count(CASE WHEN side = -1 THEN 1 END) AS n_sell,
       round(CAST(count(CASE WHEN side = 1 THEN 1 END)
                  - count(CASE WHEN side = -1 THEN 1 END) AS DOUBLE)
             / greatest(count(side), 1), 6) AS ofi
FROM c GROUP BY 1, 2
"""


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per nation:
    how concentrated is order revenue across a nation's customers.
    Two-level aggregation — per-customer revenue (fact shuffle on
    custkey), then per-nation HHI = Σ share² computed from exact
    decimal sums; dims broadcast. The per-customer frame IS the
    shuffle unit; nothing rescans the fact table."""
    orders = _table("orders")(spark, sf_dir).select("o_custkey", "o_totalprice")
    cust = _table("customer")(spark, sf_dir).select("c_custkey", "c_nationkey")
    nation = _table("nation")(spark, sf_dir).select("n_nationkey", "n_name")
    rev = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("rev")
        )
    )
    sum_sq = F.sum(F.round(F.col("rev") * F.col("rev"), 6).cast("decimal(28,6)")).cast(
        "double"
    )
    total = F.sum(F.col("rev").cast("decimal(18,6)")).cast("double")
    return rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(total, 6).alias("total_revenue"),
        F.round(sum_sq / (total * total), 6).alias("hhi"),
    )


_HHI_ORACLE = """
WITH rev AS (
  SELECT n_name, c_custkey,
    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, count(*) AS n_customers,
  round(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_revenue,
  round(CAST(sum(CAST(round(rev * rev, 6) AS DECIMAL(28,6))) AS DOUBLE)
        / (CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE)
           * CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE)), 6) AS hhi
FROM rev GROUP BY 1
"""


def q_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC inventory classification of parts by revenue:
    cumulative-share thresholds 80% (A) / 95% (B) / rest (C). One
    fact aggregation to the per-part frame; the ranking/cumsum windows
    run on that dimension-sized frame (global order over |parts|
    post-agg rows — never over fact rows), then a 3-row class
    rollup. Exact decimal cumsums; ties broken by partkey so the
    classification is total-order deterministic."""
    li = _table("lineitem")(spark, sf_dir)
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum(rev_expr.cast("decimal(18,6)")).cast("double"), 6).alias(
            "rev"
        )
    )
    worder = Window.orderBy(F.col("rev").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    ranked = per_part.select(
        "l_partkey",
        "rev",
        F.sum(F.col("rev").cast("decimal(18,6)")).over(worder).cast("double").alias(
            "cum"
        ),
        F.sum(F.col("rev").cast("decimal(18,6)")).over(wall).cast("double").alias(
            "total"
        ),
    )
    cls = (
        F.when(F.col("cum") / F.col("total") <= 0.8, "A")
        .when(F.col("cum") / F.col("total") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.select("l_partkey", "rev", "total", cls.alias("abc_class"))
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(F.col("rev").cast("decimal(18,6)")).cast("double"), 6
            ).alias("class_revenue"),
            F.round(
                F.sum(F.col("rev").cast("decimal(18,6)")).cast("double")
                / F.max("total"),
                6,
            ).alias("revenue_share"),
        )
    )


_ABC_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,6))) AS DOUBLE), 6) AS rev
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_partkey, rev,
    CAST(sum(CAST(rev AS DECIMAL(18,6)))
         OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS cum,
    CAST(sum(CAST(rev AS DECIMAL(18,6))) OVER () AS DOUBLE) AS total
  FROM per_part
),
cls AS (
  SELECT l_partkey, rev, total,
    CASE WHEN cum / total <= 0.8 THEN 'A'
         WHEN cum / total <= 0.95 THEN 'B'
         ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class, count(*) AS n_parts,
  round(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE), 6) AS class_revenue,
  round(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) / max(total), 6)
    AS revenue_share
FROM cls GROUP BY 1
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH-bucketed ANN against brute-force cosine —
    the evaluation harness that justifies the approximate index
    (SURVEY §2.10 similarity-search scale path). Both sides reuse the
    registered operators; the intersection join runs on two 10-row
    frames."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    embs = load_table(spark, sf_dir, "embeddings")
    bf = similarity.cosine_topk(embs, q, k=10).select("vec_id")
    ann = similarity.ann_topk(embs, q, k=10).select("vec_id")
    inter = bf.join(ann, "vec_id")
    return inter.agg(F.count(F.lit(1)).alias("n_match")).select(
        F.lit(10).alias("k"),
        "n_match",
        F.round(F.col("n_match").cast("double") / 10.0, 4).alias("recall_at_k"),
    )


def _ann_recall_oracle() -> str:
    return f"""
WITH bf AS ({_COSINE_TOPK_ORACLE}),
ann AS ({_ann_topk_oracle()})
SELECT 10 AS k, count(*) AS n_match,
       round(CAST(count(*) AS DOUBLE) / 10.0, 4) AS recall_at_k
FROM bf JOIN ann ON bf.vec_id = ann.vec_id
"""


def q_pca_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding matrix by 3 unrolled
    power-iteration rounds (`operators/similarity.py:
    pca_power_iteration`)."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    return similarity.pca_power_iteration(embs, n_iter=3)


def _pca_oracle(n_iter: int = 3, dim: int = 64) -> str:
    """SQL replay of the unrolled power iteration: one CTE triple
    (scores, matvec, norm) per round. Quantization is the pure-IEEE
    ``floor(x*10^k + 0.5)/10^k`` — NOT round()/`_round_sql`: Spark's
    round rides Java 17 Double.toString, which renders e.g.
    -0.0050964999999999995 where DuckDB's shortest-repr renders
    -0.0050965, and the two strings round apart at the cut digit
    (found at sf0.001). floor/mul/add are bit-defined IEEE ops, so
    both engines quantize to the identical lattice."""
    import math

    def q(expr: str, k: int) -> str:
        scale = float(10 ** k)
        return f"floor(({expr}) * {scale} + 0.5) / {scale}"

    seed = repr(1.0 / math.sqrt(dim))
    ctes = [
        f"""X AS (
  SELECT vec_id AS vid, dim,
         {q("CAST(embedding[dim + 1] AS DOUBLE)", 6)} AS x6
  FROM embeddings CROSS JOIN (SELECT unnest(range({dim})) AS dim) _d
),
M AS (
  SELECT dim,
    {q("CAST(sum(CAST(x6 AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)}
      AS m
  FROM X GROUP BY 1
),
C AS (
  SELECT vid, X.dim AS dim, {q("x6 - m", 6)} AS xc
  FROM X JOIN M ON X.dim = M.dim
),
V0 AS (SELECT unnest(range({dim})) AS dim, CAST({seed} AS DOUBLE) AS v)"""
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f"""S{k} AS (
  SELECT vid,
    CAST(sum(CAST({q("xc * v", 9)} AS DECIMAL(22,9))) AS DOUBLE) AS s
  FROM C JOIN V{k - 1} USING (dim) GROUP BY 1
),
W{k} AS (
  SELECT dim,
    CAST(sum(CAST({q("xc * s", 6)} AS DECIMAL(18,6))) AS DOUBLE) AS w
  FROM C JOIN S{k} USING (vid) GROUP BY 1
),
N{k} AS (
  SELECT sqrt(CAST(sum(CAST({q("w * w", 6)} AS DECIMAL(28,6)))
                   AS DOUBLE)) AS nrm
  FROM W{k}
),
V{k} AS (SELECT dim, w * (1.0 / nrm) AS v FROM W{k} CROSS JOIN N{k})"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT dim, {q("w * (1.0 / nrm)", 6)} AS loading,
       {q("nrm", 4)} AS lambda_est
FROM W{n_iter} CROSS JOIN N{n_iter}
"""


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user-sessions per day (sweep-line over
    `temporal.sessionize` intervals; `operators/temporal.py:
    peak_concurrency`). Sessions key to their start date — the
    scale-safe partition for the sweep."""
    sess = q_sessionize(spark, sf_dir)
    iv = sess.select(
        F.to_date("session_start").alias("day"),
        "session_start",
        "session_end",
    )
    return temporal.peak_concurrency(
        iv, key_col="day", start_col="session_start", end_col="session_end"
    ).withColumnRenamed("key", "day")


def _peak_concurrency_oracle() -> str:
    return f"""
WITH s AS ({_SESSIONIZE_ORACLE}),
iv AS (
  SELECT CAST(session_start AS DATE) AS key,
         epoch_us(session_start) AS s_us, epoch_us(session_end) AS e_us
  FROM s
),
d AS (
  SELECT key, s_us AS at_us, 1 AS delta FROM iv
  UNION ALL
  SELECT key, e_us + 1 AS at_us, -1 AS delta FROM iv
),
r AS (
  SELECT key, at_us, delta,
    CAST(sum(delta) OVER (PARTITION BY key ORDER BY at_us, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS active
  FROM d
),
m AS (SELECT *, max(active) OVER (PARTITION BY key) AS peak FROM r)
SELECT key AS day, max(peak) AS peak_concurrency,
       make_timestamp(min(at_us)) AS peak_first_at
FROM m WHERE active = peak GROUP BY 1
"""


def q_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder +DI/−DI/ADX over the daily OHLC series
    (`operators/indicators.py:adx`)."""
    return indicators.adx(q_daily_metrics(spark, sf_dir), n=14)


def _adx_oracle(n: int = 14) -> str:
    """Recursive-CTE replay of the Wilder recursions (same pattern as
    _EMA_MACD_ORACLE: recompute the step expressions inline in each
    branch, identical operand order → identical IEEE doubles)."""
    stp = f"(r.s_tr * {n - 1} + b.tr) / {n}"
    spp = f"(r.sp * {n - 1} + b.pdm) / {n}"
    smp = f"(r.sm * {n - 1} + b.mdm) / {n}"
    dxp = (
        f"CASE WHEN ({spp}) + ({smp}) > 0 THEN "
        f"100.0 * abs(({spp}) - ({smp})) / (({spp}) + ({smp})) END"
    )
    adxp = (
        f"CASE WHEN r.adx IS NULL THEN {dxp} "
        f"WHEN ({dxp}) IS NULL THEN r.adx "
        f"ELSE (r.adx * {n - 1} + ({dxp})) / {n} END"
    )
    dx0 = (
        "CASE WHEN (b.pdm + b.mdm) > 0 THEN "
        "100.0 * abs(b.pdm - b.mdm) / (b.pdm + b.mdm) END"
    )
    return f"""
WITH RECURSIVE d AS ({_DAILY_EVENTS_ORACLE}),
lagged AS (
  SELECT symbol, date,
    daily_high AS h, daily_low AS l,
    lag(daily_close) OVER wl AS pc,
    lag(daily_high) OVER wl AS ph,
    lag(daily_low) OVER wl AS pl,
    row_number() OVER wl AS rn
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
b AS (
  SELECT symbol, date, rn,
    round(CASE WHEN pc IS NULL THEN h - l
               ELSE greatest(h - l, abs(h - pc), abs(l - pc)) END, 6) AS tr,
    round(CASE WHEN ph IS NULL THEN 0.0
               WHEN (h - ph) > (pl - l) AND (h - ph) > 0 THEN h - ph
               ELSE 0.0 END, 6) AS pdm,
    round(CASE WHEN pl IS NULL THEN 0.0
               WHEN (pl - l) > (h - ph) AND (pl - l) > 0 THEN pl - l
               ELSE 0.0 END, 6) AS mdm
  FROM lagged
),
rec AS (
  SELECT symbol, date, rn,
         tr AS s_tr, pdm AS sp, mdm AS sm,
         {dx0} AS adx
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.date, b.rn,
         {stp}, {spp}, {smp},
         {adxp}
  FROM b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, date,
  {_round_sql("CASE WHEN s_tr > 0 THEN 100.0 * sp / s_tr END", 4)} AS di_plus,
  {_round_sql("CASE WHEN s_tr > 0 THEN 100.0 * sm / s_tr END", 4)} AS di_minus,
  {_round_sql("adx", 4)} AS adx
FROM rec
"""


# --------------------------------------------------------------------------
# Round-6 indicator additions: channels, illiquidity, autocorrelation,
# OHLC volatility estimators, streaks
# --------------------------------------------------------------------------


def q_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-day Donchian channel with prior-window breakout signal
    (`operators/indicators.py:donchian`)."""
    return indicators.donchian(q_daily_metrics(spark, sf_dir), n=20)


_DONCHIAN_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date, daily_close AS close,
    max(daily_high) OVER w AS upper,
    min(daily_low) OVER w AS lower,
    round((max(daily_high) OVER w + min(daily_low) OVER w) / 2, 6) AS mid,
    max(daily_high) OVER wp AS prior_hi,
    min(daily_low) OVER wp AS prior_lo,
    row_number() OVER wn AS rn
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         wp AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close, upper, lower, mid,
  CASE WHEN close > prior_hi THEN 1
       WHEN close < prior_lo THEN -1 ELSE 0 END AS breakout
FROM b WHERE rn >= 21
"""


def q_amihud(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud illiquidity per symbol
    (`operators/indicators.py:amihud_illiquidity`)."""
    return indicators.amihud_illiquidity(q_daily_metrics(spark, sf_dir))


_AMIHUD_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
r AS (
  SELECT symbol,
    round(daily_close / lag(daily_close) OVER w - 1, 6) AS ret,
    daily_close * daily_volume AS dv
  FROM d WINDOW w AS (PARTITION BY symbol ORDER BY date)
),
t AS (
  SELECT symbol, round(abs(ret) / dv * 1000000.0, 6) AS illiq
  FROM r WHERE ret IS NOT NULL AND dv > 0
)
SELECT symbol, count(*) AS n_days,
  round({_EXAVG.format(col="illiq")}, 6) AS amihud
FROM t GROUP BY symbol
"""


def q_return_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily returns per symbol
    (`operators/indicators.py:return_autocorr`)."""
    return indicators.return_autocorr(q_daily_metrics(spark, sf_dir), lag=1)


_AUTOCORR_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
r AS (
  SELECT symbol, date,
    round(daily_close / lag(daily_close) OVER w - 1, 6) AS r
  FROM d WINDOW w AS (PARTITION BY symbol ORDER BY date)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
p AS (
  SELECT symbol, r AS y,
    lag(r, 1) OVER (PARTITION BY symbol ORDER BY date) AS x
  FROM rr
),
pp AS (SELECT * FROM p WHERE x IS NOT NULL),
s AS (
  SELECT symbol, count(*) AS n,
    CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
    CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
         AS DOUBLE) AS sxx,
    CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
         AS DOUBLE) AS syy,
    CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
         AS DOUBLE) AS sxy
  FROM pp GROUP BY symbol
)
SELECT symbol, 1 AS lag, n AS n_pairs,
  round(CASE WHEN n >= 2
             AND sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) <> 0
        THEN (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END,
        6) AS autocorr
FROM s
"""


def q_ohlc_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson + Garman-Klass annualized volatility per symbol
    (`operators/indicators.py:ohlc_volatility`)."""
    return indicators.ohlc_volatility(q_daily_metrics(spark, sf_dir))


_OHLC_VOL_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
t AS (
  SELECT symbol,
    round(round(ln(daily_high / daily_low), 6)
          * round(ln(daily_high / daily_low), 6)
          / 2.772588722239781, 6) AS park_t,
    round(0.5 * round(ln(daily_high / daily_low), 6)
              * round(ln(daily_high / daily_low), 6)
          - 0.3862943611198906 * round(ln(daily_close / daily_open), 6)
              * round(ln(daily_close / daily_open), 6), 6) AS gk_t
  FROM d WHERE daily_low > 0 AND daily_open > 0 AND daily_close > 0
),
tt AS (SELECT * FROM t WHERE park_t IS NOT NULL AND gk_t IS NOT NULL),
s AS (
  SELECT symbol, count(*) AS n,
    {_EXAVG.format(col="park_t")} AS mp,
    {_EXAVG.format(col="gk_t")} AS mg
  FROM tt GROUP BY symbol
)
SELECT symbol, n AS n_days,
  round(sqrt(greatest(mp, 0.0)) * sqrt(252.0), 6) AS park_vol_annual,
  round(sqrt(greatest(mg, 0.0)) * sqrt(252.0), 6) AS gk_vol_annual
FROM s
"""


def q_return_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive up/down-day streaks per symbol, gaps-and-islands
    (`operators/indicators.py:return_streaks`)."""
    return indicators.return_streaks(q_daily_metrics(spark, sf_dir))


_STREAKS_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date, daily_close AS close,
    lag(daily_close) OVER w AS prev_close,
    round(daily_close / lag(daily_close) OVER w - 1, 6) AS r
  FROM d WINDOW w AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM b WHERE r IS NOT NULL AND r <> 0),
g AS (
  SELECT symbol, date, close, prev_close,
    CASE WHEN r > 0 THEN 1 ELSE -1 END AS direction,
    row_number() OVER (PARTITION BY symbol ORDER BY date)
      - row_number() OVER (
          PARTITION BY symbol, CASE WHEN r > 0 THEN 1 ELSE -1 END
          ORDER BY date) AS grp
  FROM f
)
SELECT symbol, direction,
  min(date) AS streak_start,
  max(date) AS streak_end,
  count(*) AS length,
  round(arg_max(close, date) / arg_min(prev_close, date) - 1, 6)
    AS streak_return
FROM g GROUP BY symbol, direction, grp
"""


# --------------------------------------------------------------------------
# Round-7 indicator batch: channel oscillators, flow indicators, gaps
# --------------------------------------------------------------------------


def q_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams %R over the daily OHLCV series
    (`operators/indicators.py:williams_r`)."""
    return indicators.williams_r(q_daily_metrics(spark, sf_dir), n=14)


_WILLIAMS_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
k AS (
  SELECT symbol, date, daily_close AS close,
         max(daily_high) OVER w AS hh_raw,
         min(daily_low) OVER w AS ll_raw,
         row_number() OVER wn AS rn
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(hh_raw, 6) AS hh, round(ll_raw, 6) AS ll,
       round(CASE WHEN hh_raw <> ll_raw
                  THEN -100.0 * (hh_raw - close) / (hh_raw - ll_raw) END,
             6) + 0.0 AS pct_r
FROM k WHERE rn >= 14
"""


def q_roc_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-day rate of change + raw momentum
    (`operators/indicators.py:roc_momentum`)."""
    return indicators.roc_momentum(
        _daily_close(spark, sf_dir), n=10, close_col="close"
    )


_ROC_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
r AS (
  SELECT symbol, date, close,
         lag(close, 10) OVER (PARTITION BY symbol ORDER BY date) AS ref_close
  FROM d
)
SELECT symbol, date, close, ref_close,
       round(CASE WHEN ref_close <> 0
                  THEN 100.0 * (close / ref_close - 1) END, 6) AS roc,
       round(close - ref_close, 6) AS momentum
FROM r WHERE ref_close IS NOT NULL
"""


def q_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money Flow Index — volume-weighted RSI of the typical price
    (`operators/indicators.py:mfi`)."""
    return indicators.mfi(q_daily_metrics(spark, sf_dir), n=14)


_MFI_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
t AS (
  SELECT symbol, date, daily_close AS close,
         round((daily_high + daily_low + daily_close) / 3, 6) AS tp,
         CAST(daily_volume AS BIGINT) AS volume
  FROM d
),
delta AS (
  SELECT symbol, date, close, tp, volume,
         round(tp - lag(tp) OVER (PARTITION BY symbol ORDER BY date), 6)
           AS dtp
  FROM t
),
fl AS (
  SELECT symbol, date, close,
         CASE WHEN dtp > 0
              THEN CAST(tp AS DECIMAL(18,6)) * CAST(volume AS DECIMAL(12,0))
              ELSE CAST(0 AS DECIMAL(18,6)) END AS pos_flow,
         CASE WHEN dtp < 0
              THEN CAST(tp AS DECIMAL(18,6)) * CAST(volume AS DECIMAL(12,0))
              ELSE CAST(0 AS DECIMAL(18,6)) END AS neg_flow
  FROM delta WHERE dtp IS NOT NULL
),
s AS (
  SELECT symbol, date, close,
         CAST(sum(pos_flow) OVER w AS DOUBLE) AS pos,
         CAST(sum(neg_flow) OVER w AS DOUBLE) AS neg,
         row_number() OVER wn AS rn
  FROM fl
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(pos, 6) AS pos_flow_sum,
       round(neg, 6) AS neg_flow_sum,
       round(CASE WHEN pos + neg <> 0 THEN 100.0 * pos / (pos + neg) END,
             6) AS mfi
FROM s WHERE rn >= 14
"""


def q_cmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaikin Money Flow over the daily OHLCV series
    (`operators/indicators.py:cmf`)."""
    return indicators.cmf(q_daily_metrics(spark, sf_dir), n=20)


_CMF_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
m AS (
  SELECT symbol, date, daily_close AS close,
         round(CASE WHEN daily_high <> daily_low
                    THEN ((daily_close - daily_low)
                          - (daily_high - daily_close))
                         / (daily_high - daily_low)
                    ELSE 0.0 END, 6) AS mf_mult,
         CAST(daily_volume AS BIGINT) AS volume
  FROM d
),
s AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(mf_mult AS DECIMAL(18,6))
                  * CAST(volume AS DECIMAL(12,0))) OVER w AS DOUBLE)
           AS flow_sum,
         sum(volume) OVER w AS vol_sum,
         row_number() OVER wn AS rn
  FROM m
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(flow_sum, 6) AS mfv_sum,
       CAST(vol_sum AS BIGINT) AS vol_sum,
       round(CASE WHEN vol_sum <> 0 THEN flow_sum / vol_sum END, 6) AS cmf
FROM s WHERE rn >= 20
"""


def q_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index — downside-only volatility from squared rolling
    drawdowns (`operators/indicators.py:ulcer_index`)."""
    return indicators.ulcer_index(_daily_close(spark, sf_dir), n=14, close_col="close")


_ULCER_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
p AS (
  SELECT symbol, date, close,
         max(close) OVER w AS peak,
         row_number() OVER wn AS rn
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
),
dd AS (
  SELECT symbol, date, close, rn,
         round(CASE WHEN peak <> 0
                    THEN 100.0 * (close - peak) / peak
                    ELSE 0.0 END, 6) AS dd_pct
  FROM p
),
s AS (
  SELECT symbol, date, close, dd_pct, rn,
         CAST(sum(CAST(dd_pct AS DECIMAL(19,6))
                  * CAST(dd_pct AS DECIMAL(19,6))) OVER w2 AS DOUBLE)
           / count(*) OVER w2 AS sq_mean
  FROM dd
  WINDOW w2 AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, date, close, dd_pct,
       round(sqrt(greatest(sq_mean, 0.0)), 6) AS ulcer_index
FROM s WHERE rn >= 27
"""


def q_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keltner channels (SMA form, ATR bands)
    (`operators/indicators.py:keltner_channels`)."""
    return indicators.keltner_channels(q_daily_metrics(spark, sf_dir), n=20, mult=2.0)


_KELTNER_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
t AS (
  SELECT symbol, date, daily_close AS close,
         round((daily_high + daily_low + daily_close) / 3, 6) AS tp,
         round(CASE WHEN lag(daily_close) OVER wl IS NULL
                    THEN daily_high - daily_low
                    ELSE greatest(
                        daily_high - daily_low,
                        abs(daily_high - lag(daily_close) OVER wl),
                        abs(daily_low - lag(daily_close) OVER wl)) END,
               6) AS tr
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
r AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(tp AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS mid,
         CAST(sum(CAST(tr AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS atr_n,
         row_number() OVER wn AS rn
  FROM t
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(mid, 6) AS kc_mid,
       round(mid + 2.0 * atr_n, 6) AS kc_upper,
       round(mid - 2.0 * atr_n, 6) AS kc_lower
FROM r WHERE rn >= 21
"""


def q_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overnight gap direction / size / fill analysis
    (`operators/indicators.py:gap_stats`)."""
    return indicators.gap_stats(q_daily_metrics(spark, sf_dir))


_GAP_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
g AS (
  SELECT symbol, date,
         lag(daily_close) OVER wl AS prev_close,
         daily_open AS open, daily_close AS close,
         daily_high AS high, daily_low AS low
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, prev_close, open, close,
       round(CASE WHEN prev_close <> 0
                  THEN 100.0 * (open - prev_close) / prev_close END, 6)
         AS gap_pct,
       CASE WHEN round(open - prev_close, 6) > 0 THEN 1
            WHEN round(open - prev_close, 6) < 0 THEN -1 ELSE 0 END
         AS gap_dir,
       CASE WHEN round(open - prev_close, 6) > 0
              THEN CAST(low <= prev_close AS INT)
            WHEN round(open - prev_close, 6) < 0
              THEN CAST(high >= prev_close AS INT)
            ELSE 1 END AS gap_filled
FROM g WHERE prev_close IS NOT NULL
"""


def q_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aroon up/down/oscillator — declarative argmax via struct max
    (`operators/indicators.py:aroon`)."""
    return indicators.aroon(q_daily_metrics(spark, sf_dir), n=10)


_AROON_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date, daily_high AS high, daily_low AS low,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
m AS (
  SELECT symbol, date, high, low, rn,
         struct_extract(
           max(struct_pack(v := high, rn := rn)) OVER w, 'rn') AS hi_rn,
         struct_extract(
           max(struct_pack(v := -low, rn := rn)) OVER w, 'rn') AS lo_rn
  FROM b
  WINDOW w AS (PARTITION BY symbol ORDER BY rn
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
)
SELECT symbol, date, high, low,
       round(100.0 * (10 - (rn - hi_rn)) / 10, 6) AS aroon_up,
       round(100.0 * (10 - (rn - lo_rn)) / 10, 6) AS aroon_down,
       round(round(100.0 * (10 - (rn - hi_rn)) / 10, 6)
             - round(100.0 * (10 - (rn - lo_rn)) / 10, 6), 6) AS aroon_osc
FROM m WHERE rn >= 11
"""


def q_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commodity Channel Index — two-pass windowed mean deviation via
    the explode fan-out (`operators/indicators.py:cci`)."""
    return indicators.cci(q_daily_metrics(spark, sf_dir), n=20)


_CCI_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date, daily_close AS close,
         round((daily_high + daily_low + daily_close) / 3, 6) AS tp,
         row_number() OVER wn AS rn,
         round(CAST(sum(CAST(round((daily_high + daily_low + daily_close)
                                   / 3, 6) AS DECIMAL(18,6))) OVER w
                    AS DOUBLE) / count(*) OVER w, 6) AS sma_tp,
         count(*) OVER w AS n_in_w
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
),
s AS (SELECT symbol, rn AS wend, sma_tp FROM b WHERE n_in_w >= 20),
f AS (
  SELECT b.symbol, b.date, b.close, b.tp, b.rn, g.off,
         b.rn + g.off AS wend
  FROM b CROSS JOIN (SELECT unnest(range(20)) AS off) g
),
j AS (
  SELECT f.symbol, f.date, f.close, f.tp, f.off, f.wend, s.sma_tp
  FROM f JOIN s ON f.symbol = s.symbol AND f.wend = s.wend
),
a AS (
  SELECT symbol, wend,
         max(CASE WHEN off = 0 THEN date END) AS date_w,
         max(CASE WHEN off = 0 THEN close END) AS close_w,
         max(CASE WHEN off = 0 THEN tp END) AS tp_w,
         max(CASE WHEN off = 0 THEN sma_tp END) AS sma_w,
         count(*) AS n_members,
         CAST(sum(CAST(round(abs(j.tp - j.sma_tp), 6) AS DECIMAL(18,6)))
              AS DOUBLE) / count(*) AS mean_dev_raw
  FROM j GROUP BY symbol, wend
)
SELECT symbol, date_w AS date, close_w AS close, tp_w AS tp,
       sma_w AS sma_tp,
       {_round_sql("mean_dev_raw", 6)} AS mean_dev,
       round(CASE WHEN {_round_sql("mean_dev_raw", 6)} <> 0
                  THEN (tp_w - sma_w)
                       / (0.015 * {_round_sql("mean_dev_raw", 6)})
             END, 6) AS cci
FROM a WHERE n_members = 20
"""


def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(symbol, day) VWAP over lineitem's true volumes — the
    volume-weighted twin of `twap` (`operators/ohlcv.py:vwap_daily`)."""
    li = _table("lineitem")(spark, sf_dir)
    return ohlcv.vwap_daily(
        li,
        symbol_col="l_returnflag",
        ts_col="l_shipdate",
        price_col="l_extendedprice",
        volume_col="l_quantity",
    )


_VWAP_ORACLE = """
WITH t AS (
  SELECT l_returnflag AS symbol,
         CAST(l_shipdate AS DATE) AS date,
         CAST(round(l_extendedprice, 6) AS DECIMAL(18,6)) AS pq,
         CAST(l_quantity AS DECIMAL(12,2)) AS vq
  FROM lineitem
)
SELECT symbol, date,
       round(CASE WHEN sum(vq) > 0
                  THEN CAST(sum(pq * vq) AS DOUBLE)
                       / CAST(sum(vq) AS DOUBLE)
                  ELSE CAST(sum(pq) AS DOUBLE) / count(*) END, 6) AS vwap,
       CAST(sum(vq) AS DOUBLE) AS total_volume,
       count(*) AS n_trades
FROM t GROUP BY symbol, date
"""


# --------------------------------------------------------------------------
# Round-7 batch 4: ichimoku, pivots, ER, vortex, SCD2 lookup, timed funnel
# --------------------------------------------------------------------------


def q_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ichimoku cloud (5/10/20 windows, 5-bar displacement — scaled
    to the test horizon) (`operators/indicators.py:ichimoku`)."""
    return indicators.ichimoku(
        q_daily_metrics(spark, sf_dir),
        tenkan_n=5,
        kijun_n=10,
        senkou_b_n=20,
        shift=5,
    )


_ICHIMOKU_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
m AS (
  SELECT symbol, date, daily_close AS close,
         CASE WHEN count(*) OVER w5 >= 5
              THEN (max(daily_high) OVER w5 + min(daily_low) OVER w5) / 2
         END AS t_raw,
         CASE WHEN count(*) OVER w10 >= 10
              THEN (max(daily_high) OVER w10 + min(daily_low) OVER w10) / 2
         END AS k_raw,
         CASE WHEN count(*) OVER w20 >= 20
              THEN (max(daily_high) OVER w20 + min(daily_low) OVER w20) / 2
         END AS b_raw
  FROM d
  WINDOW w5 AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w10 AS (PARTITION BY symbol ORDER BY date
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         w20 AS (PARTITION BY symbol ORDER BY date
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT symbol, date, close,
         round(t_raw, 6) AS tenkan,
         round(k_raw, 6) AS kijun,
         round((t_raw + k_raw) / 2, 6) AS sa,
         round(b_raw, 6) AS sb
  FROM m
)
SELECT symbol, date, close, tenkan, kijun,
       lag(sa, 5) OVER wp AS senkou_a,
       lag(sb, 5) OVER wp AS senkou_b,
       lead(close, 5) OVER wp AS chikou
FROM b
WINDOW wp AS (PARTITION BY symbol ORDER BY date)
"""


def q_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic floor-trader pivot ladder from the prior session
    (`operators/indicators.py:pivot_points`)."""
    return indicators.pivot_points(q_daily_metrics(spark, sf_dir))


_PIVOT_POINTS_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
l AS (
  SELECT symbol, date,
         lag(daily_high) OVER wp AS ph,
         lag(daily_low) OVER wp AS pl,
         lag(daily_close) OVER wp AS pc
  FROM d
  WINDOW wp AS (PARTITION BY symbol ORDER BY date)
),
p AS (
  SELECT symbol, date, ph, pl, pc,
         round((ph + pl + pc) / 3, 6) AS pv
  FROM l WHERE pc IS NOT NULL
)
SELECT symbol, date,
       ph AS prev_high, pl AS prev_low, pc AS prev_close,
       pv AS pivot,
       round(2 * pv - pl, 6) AS r1,
       round(2 * pv - ph, 6) AS s1,
       round(pv + (ph - pl), 6) AS r2,
       round(pv - (ph - pl), 6) AS s2,
       round(ph + 2 * (pv - pl), 6) AS r3,
       round(pl - 2 * (ph - pv), 6) AS s3
FROM p
"""


def q_kaufman_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaufman efficiency ratio over a 10-day window
    (`operators/indicators.py:kaufman_er`)."""
    return indicators.kaufman_er(
        _daily_close(spark, sf_dir), n=10, close_col="close"
    )


_KAUFMAN_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
dd AS (
  SELECT symbol, date, close,
         round(close - lag(close) OVER wp, 6) AS dch
  FROM d
  WINDOW wp AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM dd WHERE dch IS NOT NULL),
s AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(dch AS DECIMAL(18,6))) OVER w AS DOUBLE) AS net,
         CAST(sum(CAST(abs(dch) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS vol,
         row_number() OVER wn AS rn
  FROM f
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(net, 6) AS net_change,
       round(vol, 6) AS path_length,
       round(CASE WHEN vol <> 0 THEN abs(net) / vol END, 6) AS er
FROM s WHERE rn >= 10
"""


def q_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vortex indicator VI+/VI- over 14 days
    (`operators/indicators.py:vortex`)."""
    return indicators.vortex(q_daily_metrics(spark, sf_dir), n=14)


_VORTEX_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
t AS (
  SELECT symbol, date, daily_close AS close,
         round(abs(daily_high - lag(daily_low) OVER wp), 6) AS vm_plus,
         round(abs(daily_low - lag(daily_high) OVER wp), 6) AS vm_minus,
         round(greatest(daily_high - daily_low,
                        abs(daily_high - lag(daily_close) OVER wp),
                        abs(daily_low - lag(daily_close) OVER wp)), 6) AS tr
  FROM d
  WINDOW wp AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM t WHERE tr IS NOT NULL),
s AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(vm_plus AS DECIMAL(18,6))) OVER w AS DOUBLE) AS vp,
         CAST(sum(CAST(vm_minus AS DECIMAL(18,6))) OVER w AS DOUBLE) AS vm,
         CAST(sum(CAST(tr AS DECIMAL(18,6))) OVER w AS DOUBLE) AS trs,
         row_number() OVER wn AS rn
  FROM f
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close,
       round(vp, 6) AS vm_plus_sum,
       round(vm, 6) AS vm_minus_sum,
       round(trs, 6) AS tr_sum,
       round(CASE WHEN trs <> 0 THEN vp / trs END, 6) AS vi_plus,
       round(CASE WHEN trs <> 0 THEN vm / trs END, 6) AS vi_minus
FROM s WHERE rn >= 14
"""


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time segment lookup for each order against a
    two-version SCD2 customer dimension (every third customer moved
    segment effective 1998-01-01)
    (`operators/relational.py:scd2_lookup`)."""
    ensure_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.lit("1998-01-01").cast("date")
        ).alias("valid_to"),
    )
    v2 = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("segment"),
        F.lit("1998-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    facts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.to_date("o_orderdate").alias("odate"),
    )
    return relational.scd2_lookup(
        facts, dim, key_cols=["c_custkey"], attr_cols=["segment"],
        ts_col="odate",
    )


_SCD2_LOOKUP_ORACLE = """
WITH cust AS (SELECT c_custkey, c_mktsegment FROM customer),
dim AS (
  SELECT c_custkey, c_mktsegment AS segment,
         DATE '1990-01-01' AS valid_from,
         CASE WHEN c_custkey % 3 = 0 THEN DATE '1998-01-01' END AS valid_to
  FROM cust
  UNION ALL
  SELECT c_custkey, 'MOVED', DATE '1998-01-01', NULL
  FROM cust WHERE c_custkey % 3 = 0
)
SELECT o.o_orderkey, o.o_custkey AS c_custkey,
       CAST(o.o_orderdate AS DATE) AS odate,
       d.segment, d.valid_from AS version_from
FROM orders o LEFT JOIN dim d
  ON o.o_custkey = d.c_custkey
  AND d.valid_from <= CAST(o.o_orderdate AS DATE)
  AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to)
"""


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: each step within 24 h of the previous
    step's first arrival (`operators/behavior.py:funnel_conversion`
    with max_gap_us)."""
    return behavior.funnel_conversion(
        _events(spark, sf_dir),
        stages=["view", "click", "purchase"],
        max_gap_us=86_400_000_000,
    )


_FUNNEL_WINDOWED_ORACLE = """
WITH u1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
u2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1
                      AND epoch_us(ts) - epoch_us(t1) <= 86400000000
                     THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM u1
),
u3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2
                      AND epoch_us(ts) - epoch_us(t2) <= 86400000000
                     THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM u2
),
d AS (SELECT DISTINCT user_id, t1, t2, t3 FROM u3)
SELECT count(t1) AS n_view_users,
       count(t2) AS n_click_users,
       count(t3) AS n_purchase_users,
       round(CASE WHEN count(t1) > 0
                  THEN CAST(count(t2) AS DOUBLE) / count(t1) END, 6)
         AS rate_view_to_click,
       round(CASE WHEN count(t2) > 0
                  THEN CAST(count(t3) AS DOUBLE) / count(t2) END, 6)
         AS rate_click_to_purchase
FROM d
"""




__all__ = [
    "_ABC_ORACLE",
    "_AMIHUD_ORACLE",
    "_AROON_ORACLE",
    "_ATR_ORACLE",
    "_AUTOCORR_ORACLE",
    "_BIGRAM_LM_ORACLE",
    "_BOLLINGER_ORACLE",
    "_CALENDAR_COVERAGE_ORACLE",
    "_CANDLE_ORACLE",
    "_CCI_ORACLE",
    "_CMF_ORACLE",
    "_CONVERSION_LATENCY_ORACLE",
    "_DAILY_CLOSE_CTE",
    "_DATA_EXPECTATIONS_ORACLE",
    "_DONCHIAN_ORACLE",
    "_DRAWDOWN_ORACLE",
    "_EMA_MACD_ORACLE",
    "_EMBEDDING_OUTLIERS_ORACLE",
    "_EVENT_TRANSITIONS_ORACLE",
    "_EXCESS_SUPPLIERS_ORACLE",
    "_FK_INTEGRITY_ORACLE",
    "_FUNNEL_WINDOWED_ORACLE",
    "_FUZZY_JOIN_ORACLE",
    "_GAP_ORACLE",
    "_GROUPING_SETS_ORACLE",
    "_HHI_ORACLE",
    "_ICHIMOKU_ORACLE",
    "_INCREMENTAL_AGG_ORACLE",
    "_KAUFMAN_ORACLE",
    "_KELTNER_ORACLE",
    "_MFI_ORACLE",
    "_OBV_ORACLE",
    "_OFI_BARS_ORACLE",
    "_OHLC_VOL_ORACLE",
    "_PAIRS_SPREAD_ORACLE",
    "_PAIRWISE_CORR_ORACLE",
    "_PII_SPANS_ORACLE",
    "_PIVOT_POINTS_ORACLE",
    "_RANK_PORTFOLIO_ORACLE",
    "_RESAMPLE_INTERP_ORACLE",
    "_ROC_ORACLE",
    "_RSI_ORACLE",
    "_SCD2_LOOKUP_ORACLE",
    "_SCD2_ORACLE",
    "_SEASONAL_ORACLE",
    "_SKEW_STATS_ORACLE",
    "_SMA_CROSSOVER_ORACLE",
    "_SNAPSHOT_DIFF_ORACLE",
    "_STOCHASTIC_ORACLE",
    "_STREAKS_ORACLE",
    "_STREAM_LEFT_JOIN_ORACLE",
    "_STREAM_STATIC_ORACLE",
    "_TREND_OLS_ORACLE",
    "_TRIMMED_MEAN_ORACLE",
    "_ULCER_ORACLE",
    "_VOLATILITY_ORACLE",
    "_VORTEX_ORACLE",
    "_VWAP_ORACLE",
    "_WEIGHTED_SAMPLE_ORACLE",
    "_WILLIAMS_ORACLE",
    "_adx_oracle",
    "_ann_recall_oracle",
    "_daily_close",
    "_hurst_oracle",
    "_pca_oracle",
    "_peak_concurrency_oracle",
    "_zorder_oracle",
    "q_abc_classes",
    "q_adx",
    "q_amihud",
    "q_ann_recall",
    "q_aroon",
    "q_atr",
    "q_bigram_lm",
    "q_bollinger",
    "q_calendar_coverage",
    "q_candle_patterns",
    "q_cci",
    "q_cmf",
    "q_conversion_latency",
    "q_data_expectations",
    "q_donchian",
    "q_drawdown",
    "q_ema_macd",
    "q_embedding_outliers",
    "q_event_transitions",
    "q_excess_suppliers",
    "q_fk_integrity",
    "q_funnel_windowed",
    "q_fuzzy_join",
    "q_gap_stats",
    "q_grouping_sets",
    "q_hhi_concentration",
    "q_hurst",
    "q_ichimoku",
    "q_incremental_agg",
    "q_kaufman_er",
    "q_keltner",
    "q_mfi",
    "q_obv",
    "q_ofi_bars",
    "q_ohlc_volatility",
    "q_pairs_spread",
    "q_pairwise_correlation",
    "q_pca_pc1",
    "q_peak_concurrency",
    "q_pii_spans",
    "q_pivot_points",
    "q_rank_portfolio",
    "q_realized_volatility",
    "q_resample_interp",
    "q_return_autocorr",
    "q_return_streaks",
    "q_roc_momentum",
    "q_rsi",
    "q_scd2_apply",
    "q_scd2_lookup",
    "q_seasonal_decompose",
    "q_skew_stats",
    "q_sma_crossover",
    "q_snapshot_diff",
    "q_stochastic",
    "q_stream_left_join",
    "q_stream_static_join",
    "q_trend_ols",
    "q_trimmed_mean",
    "q_ulcer_index",
    "q_vortex",
    "q_vwap",
    "q_weighted_sample",
    "q_williams_r",
    "q_zorder_key",
]
