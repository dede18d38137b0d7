"""Calendar/cross-sectional analytics, classifier eval, cohort LTV, bars.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.indicators import (  # noqa: F401
    _DAILY_CLOSE_CTE,
    _daily_close,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.mlprep import (  # noqa: F401
    _holt_cte,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.ohlcv import (  # noqa: F401
    _DAILY_EVENTS_ORACLE,
    q_daily_metrics,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.text import (  # noqa: F401
    _lang_id_oracle,
)


# --------------------------------------------------------------------------
# Round-6 batch: calendar downsampling, cross-sectional analytics,
# heuristic-classifier evaluation
# --------------------------------------------------------------------------


def q_weekly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLCV bars rolled up from daily bars — the calendar
    downsampling every charting/backtest user needs. Same one-shuffle
    min_by/max_by shape as the daily rollup, keyed on the ISO week
    start."""
    daily = q_daily_metrics(spark, sf_dir)
    ord_key = F.struct(F.col("date"))
    return daily.groupBy(
        "symbol",
        F.date_trunc("week", F.col("date")).cast("date").alias("week_start"),
    ).agg(
        F.min_by("daily_open", ord_key).alias("open"),
        F.max("daily_high").alias("high"),
        F.min("daily_low").alias("low"),
        F.max_by("daily_close", ord_key).alias("close"),
        F.sum("daily_volume").cast("long").alias("volume"),
        F.count(F.lit(1)).alias("n_days"),
    )


_WEEKLY_BARS_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE})
SELECT symbol, date_trunc('week', date) AS week_start,
  arg_min(daily_open, date) AS open,
  max(daily_high) AS high,
  min(daily_low) AS low,
  arg_max(daily_close, date) AS close,
  CAST(sum(daily_volume) AS BIGINT) AS volume,
  count(*) AS n_days
FROM d GROUP BY symbol, date_trunc('week', date)
"""


def q_momentum_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional momentum: trailing 5-day return per symbol,
    ranked across symbols each day (rank 1 = strongest). The daily
    rank window is per-date — bounded by the symbol universe, never by
    history."""
    daily = q_daily_metrics(spark, sf_dir)
    wlag = Window.partitionBy("symbol").orderBy("date")
    mom = F.round(
        F.col("daily_close") / F.lag("daily_close", 5).over(wlag) - 1, 6
    )
    base = daily.select(
        "symbol", "date", mom.alias("mom_5d")
    ).where(F.col("mom_5d").isNotNull())
    wr = Window.partitionBy("date").orderBy(F.col("mom_5d").desc(), F.col("symbol"))
    return base.select(
        "symbol", "date", "mom_5d", F.row_number().over(wr).alias("rank")
    )


_MOMENTUM_RANK_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
m AS (
  SELECT symbol, date,
    round(daily_close / lag(daily_close, 5)
          OVER (PARTITION BY symbol ORDER BY date) - 1, 6) AS mom_5d
  FROM d
),
f AS (SELECT * FROM m WHERE mom_5d IS NOT NULL)
SELECT symbol, date, mom_5d,
  row_number() OVER (PARTITION BY date ORDER BY mom_5d DESC, symbol) AS rank
FROM f
"""


def q_portfolio_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-weight portfolio index: cross-sectional mean daily return
    compounded into an index (base 1.0) via exact cumulative decimal
    sums of quantized log growth. The cumulative window runs over
    calendar dates — bounded by time, not data volume."""
    daily = q_daily_metrics(spark, sf_dir)
    wlag = Window.partitionBy("symbol").orderBy("date")
    r = F.round(F.col("daily_close") / F.lag("daily_close").over(wlag) - 1, 6)
    rets = daily.select("date", r.alias("r")).where(F.col("r").isNotNull())
    day = rets.groupBy("date").agg(
        F.count(F.lit(1)).alias("n_symbols"),
        F.round(
            F.sum(F.col("r").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ret"),
    )
    lg = F.when(
        F.col("mean_ret") > -1, F.round(F.log(1 + F.col("mean_ret")), 6)
    )
    wcum = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    # the index is exp(cum_log_growth); emitted in log space because
    # exp() differs between the JVM and libm by ulps, which at
    # compounded magnitudes is visible at ANY display rounding (found
    # by the oracle gate at two scale factors). The cumulative decimal
    # sum is exact in every engine.
    return (
        day.select("date", "n_symbols", "mean_ret", lg.alias("lg"))
        .where(F.col("lg").isNotNull())
        .select(
            "date",
            "n_symbols",
            "mean_ret",
            F.round(
                F.sum(F.col("lg").cast("decimal(18,6)")).over(wcum).cast("double"),
                6,
            ).alias("cum_log_growth"),
        )
    )


_PORTFOLIO_INDEX_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
r AS (
  SELECT date,
    round(daily_close / lag(daily_close)
          OVER (PARTITION BY symbol ORDER BY date) - 1, 6) AS r
  FROM d
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
day AS (
  SELECT date, count(*) AS n_symbols,
    round({_EXAVG.format(col="r")}, 6) AS mean_ret
  FROM rr GROUP BY date
),
lgt AS (
  SELECT date, n_symbols, mean_ret,
    CASE WHEN mean_ret > -1 THEN round(ln(1 + mean_ret), 6) END AS lg
  FROM day
),
f AS (SELECT * FROM lgt WHERE lg IS NOT NULL)
SELECT date, n_symbols, mean_ret,
  round(CAST(sum(CAST(lg AS DECIMAL(18,6)))
             OVER (ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS DOUBLE), 6) AS cum_log_growth
FROM f
"""


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the
    labeled lang column, with per-actual-language shares — the
    evaluation loop for any heuristic classifier in the corpus
    pipeline."""
    docs = _table("documents")(spark, sf_dir)
    pred = text.lang_id(docs).select("doc_id", "lang_pred")
    j = docs.select("doc_id", F.col("lang").alias("lang_actual")).join(
        pred, "doc_id"
    )
    counts = j.groupBy(
        "lang_actual",
        F.coalesce("lang_pred", F.lit("unknown")).alias("lang_pred"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("lang_actual")
    return counts.select(
        "lang_actual",
        "lang_pred",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("share_of_actual"),
    )


def _lang_confusion_oracle() -> str:
    return f"""
WITH li AS ({_lang_id_oracle()}),
c AS (
  SELECT d.lang AS lang_actual,
         coalesce(li.lang_pred, 'unknown') AS lang_pred,
         count(*) AS n_docs
  FROM documents d JOIN li USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang_actual, lang_pred, n_docs,
  round(CAST(n_docs AS DOUBLE)
        / CAST(sum(n_docs) OVER (PARTITION BY lang_actual) AS BIGINT), 6)
    AS share_of_actual
FROM c
"""


def q_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD/modified-z anomaly flags over event values
    (`operators/metrics.py:mad_anomalies`)."""
    ev = _events(spark, sf_dir)
    return metrics.mad_anomalies(
        ev, key_cols=["event_type"], value_col="value", id_cols=["event_id"]
    )


_MAD_ANOMALIES_ORACLE = f"""
WITH r1 AS (
  SELECT event_id, event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
m AS (
  SELECT event_id, event_type, value,
    max(CASE WHEN rn = (n + 1) // 2 THEN value END)
      OVER (PARTITION BY event_type) AS med
  FROM r1
),
a AS (
  SELECT *, round(abs(value - med), 6) AS absdev FROM m
),
r2 AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type ORDER BY absdev) AS rn2,
    count(*) OVER (PARTITION BY event_type) AS n2
  FROM a
),
md AS (
  SELECT event_id, event_type, value, med,
    max(CASE WHEN rn2 = (n2 + 1) // 2 THEN absdev END)
      OVER (PARTITION BY event_type) AS mad
  FROM r2
)
SELECT event_id, event_type, value,
       round(med, 6) AS med, round(mad, 6) AS mad,
       {_round_sql("0.6745 * (value - med) / mad", 4)} AS robust_z
FROM md
WHERE mad > 0
  AND abs({_round_sql("0.6745 * (value - med) / mad", 4)}) > 3.5
"""


def q_underwater_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown spell spans/depths/recovery per symbol
    (`operators/indicators.py:underwater_spells`)."""
    return indicators.underwater_spells(q_daily_metrics(spark, sf_dir))


_UNDERWATER_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date,
    CASE WHEN max(daily_close) OVER w <> 0
         THEN round(daily_close / max(daily_close) OVER w - 1, 6) END
      AS drawdown,
    max(date) OVER (PARTITION BY symbol) AS symbol_last_date,
    row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn_all
  FROM d
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
u AS (SELECT * FROM b WHERE drawdown < 0),
g AS (
  SELECT *, rn_all - row_number()
      OVER (PARTITION BY symbol ORDER BY date) AS grp
  FROM u
)
SELECT symbol,
  min(date) AS spell_start,
  max(date) AS spell_end,
  count(*) AS n_days,
  min(drawdown) AS max_depth,
  max(date) < max(symbol_last_date) AS recovered
FROM g GROUP BY symbol, grp
"""


def q_event_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association support/confidence/lift between event types over
    user baskets (`operators/behavior.py:event_lift`)."""
    return behavior.event_lift(_events(spark, sf_dir))


_EVENT_LIFT_ORACLE = """
WITH pres AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
counts AS (SELECT t, count(*) AS n FROM pres GROUP BY t),
total AS (SELECT count(DISTINCT u) AS n_users FROM pres),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_ab
  FROM pres a JOIN pres b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab, ca.n AS n_a, cb.n AS n_b, n_users,
  round(CAST(n_ab AS DOUBLE) / n_users, 6) AS support,
  round(CAST(n_ab AS DOUBLE) / ca.n, 6) AS conf_a_to_b,
  round(CAST(n_ab AS DOUBLE) / cb.n, 6) AS conf_b_to_a,
  round(CAST(n_ab * n_users AS DOUBLE) / (ca.n * cb.n), 6) AS lift
FROM pairs
JOIN counts ca ON ca.t = type_a
JOIN counts cb ON cb.t = type_b
CROSS JOIN total
"""


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 in-session event-type trigrams
    (`operators/behavior.py:session_paths`)."""
    return behavior.session_paths(_events(spark, sf_dir))


_SESSION_PATHS_ORACLE = """
WITH g AS (
  SELECT user_id AS u, event_type AS t, ts, event_id AS id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
           > 1800000000
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT u, t, ts, id,
    sum(new_sess) OVER (PARTITION BY u ORDER BY ts, id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS sid
  FROM g
),
tri AS (
  SELECT u, sid,
    t || '>' || lead(t, 1) OVER w || '>' || lead(t, 2) OVER w AS path,
    lead(t, 2) OVER w AS t3
  FROM s WINDOW w AS (PARTITION BY u, sid ORDER BY ts, id)
),
counted AS (
  SELECT path, count(*) AS n_occurrences,
         count(DISTINCT (u, sid)) AS n_sessions
  FROM tri WHERE t3 IS NOT NULL GROUP BY path
)
SELECT path, n_occurrences, n_sessions,
       row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank
FROM counted
QUALIFY rank <= 20
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast revenue change: one tight scan with
    date/discount/quantity predicates all pushed to parquet, and a
    single decimal-exact product sum."""
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = _table("lineitem")(spark, sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(d6(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_FORECAST_REVENUE_ORACLE = """
SELECT
  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
       AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    keep the supplier(s) hitting the maximum. The max-of-aggregate is
    a window over the aggregated frame (one extra exchange over
    |suppliers| rows, not a scalar-subquery rescan)."""
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = _table("lineitem")(spark, sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(d6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("total_revenue")
    )
    wmax = Window.partitionBy()
    top = rev.withColumn(
        "max_rev", F.max("total_revenue").over(wmax)
    ).where(F.col("total_revenue") == F.col("max_rev"))
    supp = _table("supplier")(spark, sf_dir).select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 6).alias("total_revenue"),
        )
    )


_TOP_SUPPLIER_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
         AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
),
m AS (SELECT *, max(total_revenue) OVER () AS max_rev FROM rev)
SELECT s_suppkey, s_name, round(total_revenue, 6) AS total_revenue
FROM m JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = max_rev
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease / FK grade per document
    (`operators/text.py:readability_scores`)."""
    ensure_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return text.readability_scores(docs)


_READABILITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
    greatest(len(regexp_split_to_array(lower(text), '[.!?]+')) - 1, 1)
      AS n_sentences,
    greatest(len(string_split({_NORM.format(col='text')}, ' ')), 1)
      AS n_words,
    greatest(len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1, 1)
      AS n_syllables
  FROM documents
),
r AS (
  SELECT *,
    CAST(n_words AS DOUBLE) / n_sentences AS wps,
    CAST(n_syllables AS DOUBLE) / n_words AS spw
  FROM base
)
SELECT doc_id, n_sentences, n_words, n_syllables,
  {_round_sql("206.835 - 1.015 * wps - 84.6 * spw", 4)} AS flesch_ease,
  {_round_sql("0.39 * wps + 11.8 * spw - 15.59", 4)} AS fk_grade
FROM r
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates vs exact counts for the 20
    most active users (`operators/sketches.py:cms_heavy_hitters`)."""
    return sketches.cms_heavy_hitters(
        _events(spark, sf_dir), key_col="user_id", depth=4, width=256, top_n=20
    )


_CMS_ORACLE = """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_exact
  FROM events GROUP BY 1
),
ds AS (SELECT unnest(range(4)) AS d),
buckets AS (
  SELECT key, n_exact, d,
    CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || key), 1, 8)
         AS BIGINT) % 256 AS bucket
  FROM counts CROSS JOIN ds
),
sketch AS (
  SELECT d, bucket, CAST(sum(n_exact) AS BIGINT) AS counter
  FROM buckets GROUP BY 1, 2
),
top AS (
  SELECT key, n_exact,
         row_number() OVER (ORDER BY n_exact DESC, key) AS "rank"
  FROM counts
  QUALIFY "rank" <= 20
),
est AS (
  SELECT t.key, t.n_exact, t."rank", min(s.counter) AS n_est
  FROM top t
  JOIN buckets b ON b.key = t.key
  JOIN sketch s ON s.d = b.d AND s.bucket = b.bucket
  GROUP BY 1, 2, 3
)
SELECT key, "rank", n_exact, n_est, n_est - n_exact AS overcount
FROM est
"""


def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study around volume spikes: days whose volume exceeds
    1.1× the symbol's mean define events (the synthetic feed's volume
    is near-uniform, so the spike threshold is tuned to stay
    selective-but-nonempty at every SF); the mean daily return at offsets
    −2..+2 relative to every event measures the price response around
    the spike — the classic abnormal-return methodology as one window
    pass (five lead/lag columns) + a 5-row aggregate."""
    daily = q_daily_metrics(spark, sf_dir)
    wlag = Window.partitionBy("symbol").orderBy("date")
    wsym = Window.partitionBy("symbol")
    prev = F.lag("daily_close").over(wlag)
    r = F.round(F.when(prev != 0, F.col("daily_close") / prev - 1), 6)
    vmean = (
        F.sum(F.col("daily_volume").cast("decimal(18,6)")).over(wsym)
        .cast("double")
        / F.count(F.lit(1)).over(wsym)
    )
    base = daily.select(
        "symbol",
        "date",
        r.alias("r"),
        (F.col("daily_volume") > F.lit(1.1) * vmean).alias("is_event"),
    )
    wide = base.select(
        "symbol",
        "date",
        "r",
        "is_event",
        F.lag("r", 2).over(wlag).alias("r_m2"),
        F.lag("r", 1).over(wlag).alias("r_m1"),
        F.lead("r", 1).over(wlag).alias("r_p1"),
        F.lead("r", 2).over(wlag).alias("r_p2"),
    )
    arr = F.array(
        F.struct(F.lit(-2).alias("off"), F.col("r_m2").alias("ret")),
        F.struct(F.lit(-1).alias("off"), F.col("r_m1").alias("ret")),
        F.struct(F.lit(0).alias("off"), F.col("r").alias("ret")),
        F.struct(F.lit(1).alias("off"), F.col("r_p1").alias("ret")),
        F.struct(F.lit(2).alias("off"), F.col("r_p2").alias("ret")),
    )
    long = (
        wide.where(F.col("is_event"))
        .select(F.explode(arr).alias("e"))
        .select("e.off", "e.ret")
        .where(F.col("ret").isNotNull())
    )
    return long.groupBy("off").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(
            F.sum(F.col("ret").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_return"),
    )


_EVENT_STUDY_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date,
    round(CASE WHEN lag(daily_close) OVER ws <> 0
               THEN daily_close / lag(daily_close) OVER ws - 1 END, 6) AS r,
    daily_volume > 1.1 * (CAST(sum(CAST(daily_volume AS DECIMAL(18,6)))
                               OVER wp AS DOUBLE)
                          / (count(*) OVER wp)) AS is_event
  FROM d
  WINDOW ws AS (PARTITION BY symbol ORDER BY date),
         wp AS (PARTITION BY symbol)
),
l AS (
  SELECT symbol, date, r, is_event,
    lag(r, 2) OVER ws AS r_m2, lag(r, 1) OVER ws AS r_m1,
    lead(r, 1) OVER ws AS r_p1, lead(r, 2) OVER ws AS r_p2
  FROM b
  WINDOW ws AS (PARTITION BY symbol ORDER BY date)
),
long AS (
  SELECT t.off, t.ret FROM l,
    unnest([{{'off': -2, 'ret': r_m2}}, {{'off': -1, 'ret': r_m1}},
            {{'off': 0, 'ret': r}}, {{'off': 1, 'ret': r_p1}},
            {{'off': 2, 'ret': r_p2}}]) AS u(t)
  WHERE is_event AND t.ret IS NOT NULL
)
SELECT off, count(*) AS n_obs,
  {_round_sql("CAST(sum(CAST(ret AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)}
    AS mean_return
FROM long GROUP BY 1
"""


def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier revenue: revenue from lineitems
    where the CUSTOMER and the SUPPLIER sit in the same ASIA nation,
    by nation — the co-location constraint `region_revenue` (Q5-lite)
    doesn't exercise. Fact pipeline: lineitem⋈orders on orderkey (the
    one big join), every dimension broadcast, the same-nation
    predicate applied as a join-time filter."""
    li = _table("lineitem")(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _table("orders")(spark, sf_dir).select("o_orderkey", "o_custkey")
    cust = _table("customer")(spark, sf_dir).select("c_custkey", "c_nationkey")
    supp = _table("supplier")(spark, sf_dir).select("s_suppkey", "s_nationkey")
    nation = _table("nation")(spark, sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _table("region")(spark, sf_dir).where(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_LOCAL_SUPPLIER_ORACLE = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       AS DOUBLE) AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY 1
"""


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time (the growth curve): each
    user counts once, on their FIRST-seen day — running distinct
    re-expressed as min-date + cumulative count, which needs only a
    per-user aggregate and a day-level cumsum instead of a
    distinct-per-window blowup."""
    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("first_day").alias("date"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


_CUMULATIVE_USERS_ORACLE = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
),
pd AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY 1)
SELECT first_day AS date, new_users,
  CAST(sum(new_users) OVER (ORDER BY first_day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cumulative_users
FROM pd
"""


def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day. The sliding
    DISTINCT is re-expressed scale-safely: each (user, active day)
    pair fans out to the 7 calendar days whose trailing window it
    belongs to, then one distinct + count per day — cost is
    7×|user-days|, never a per-window re-scan. Days outside the
    observed range are dropped; the first 6 days have partial
    windows (documented — the standard WAU ramp)."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("off"),
        F.col("day"),
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("wday"))
    wau = (
        fan.distinct()
        .groupBy("wday")
        .agg(F.count(F.lit(1)).alias("wau"))
        .withColumnRenamed("wday", "day")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


_DAU_WAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
fan AS (
  SELECT DISTINCT user_id, day + CAST(off AS INT) AS wday
  FROM ud, unnest(range(0, 7)) AS t(off)
),
wau AS (SELECT wday AS day, count(*) AS wau FROM fan GROUP BY 1)
SELECT dau.day, dau, wau,
       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped cheapest-supplier-per-part (adapted: this
    schema has no partsupp, so the per-(part, supplier) cost is the
    average realized unit price from lineitem). The correlated MIN
    subquery of the original becomes a window min over the part key —
    one exchange on the aggregated frame, never a rescan. Part filter
    broadcast-prunes the fact rows before the aggregation; supplier
    and nation broadcast at the end (dims ≪ fact at any scale).

    Exactness: unit prices are quantized to 6 decimals, averaged via
    an exact DECIMAL sum, re-rounded to 6 — so the min comparison is
    on engine-portable values and ties are value-deterministic.
    """
    parts = (
        _table("part")(spark, sf_dir)
        .where((F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_name")
    )
    li = _table("lineitem")(spark, sf_dir).select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit"),
    )
    cost = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("unit").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("supply_cost")
        )
    )
    wmin = Window.partitionBy("p_partkey")
    best = cost.withColumn(
        "min_cost", F.min("supply_cost").over(wmin)
    ).where(F.col("supply_cost") == F.col("min_cost"))
    supp = _table("supplier")(spark, sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _table("nation")(spark, sf_dir).select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "supply_cost")
    )


_MIN_COST_SUPPLIER_ORACLE = """
WITH cost AS (
  SELECT p_partkey, p_name, l_suppkey,
    round(CAST(sum(CAST(round(l_extendedprice / l_quantity, 6)
                        AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
      AS supply_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 10 AND p_type = 'SMALL'
  GROUP BY 1, 2, 3
),
m AS (
  SELECT *, min(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM cost
)
SELECT p_partkey, p_name, s_name, n_name, supply_cost
FROM m
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE supply_cost = min_cost
"""


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profit by supplier nation and
    order year (adapted: no partsupp, so cost is the 60%-of-retail
    proxy from the part dimension). Exercises the one genuinely big
    join in the schema — lineitem⋈orders on orderkey (both shuffle on
    the key; AQE can flip to broadcast at small SF) — with part-name
    pruning broadcast BEFORE the big join so only matching fact rows
    shuffle, and supplier/nation broadcast after.

    Per-line profit is quantized to 6 decimals and summed as
    DECIMAL(18,6) — order-independent, engine-exact.
    """
    parts = (
        _table("part")(spark, sf_dir)
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    li = _table("lineitem")(spark, sf_dir)
    orders = _table("orders")(spark, sf_dir).select("o_orderkey", "o_orderdate")
    supp = _table("supplier")(spark, sf_dir).select("s_suppkey", "s_nationkey")
    nation = _table("nation")(spark, sf_dir).select("n_nationkey", "n_name")
    amount = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.6),
        6,
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(amount.cast("decimal(18,6)")).cast("double").alias("sum_profit")
        )
    )


_NATION_PROFIT_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                      - l_quantity * p_retailprice * 0.6, 6)
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock screen (adapted: shipped
    lineitem value from NATION_2 suppliers stands in for partsupp
    inventory value). The original's scalar subquery — total value
    across ALL parts — is a window aggregate over the already-grouped
    per-part frame: one extra exchange over |parts| rows instead of a
    second scan of the fact table. Supplier semi-filter broadcasts.

    HAVING value > 2x the mean per-part value — the scale-FREE form
    of Q11's fixed-fraction threshold (a fraction of the global total
    shrinks per part as the catalog grows; the official spec scales
    its fraction by 1/SF for the same reason). Both sides are exact
    DECIMAL sums cast to double — partition-order-independent.
    """
    supp = (
        _table("supplier")(spark, sf_dir)
        .join(
            F.broadcast(
                _table("nation")(spark, sf_dir).where(
                    F.col("n_name") == "NATION_2"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _table("lineitem")(spark, sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("stock_value")
        )
    )
    wall = Window.partitionBy()
    return (
        per_part.withColumn(
            "total",
            F.sum(F.col("stock_value").cast("decimal(18,6)"))
            .over(wall)
            .cast("double"),
        )
        .withColumn("n_parts", F.count(F.lit(1)).over(wall))
        .where(
            F.col("stock_value")
            > F.lit(2.0) * F.col("total") / F.col("n_parts")
        )
        .select("l_partkey", "stock_value")
    )


_IMPORTANT_STOCK_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      AS stock_value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
  )
  GROUP BY 1
),
t AS (
  SELECT *, CAST(sum(CAST(stock_value AS DECIMAL(18,6))) OVER ()
                 AS DOUBLE) AS total,
            count(*) OVER () AS n_parts
  FROM per_part
)
SELECT l_partkey, stock_value
FROM t WHERE stock_value > 2.0 * total / n_parts
"""


def q_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped waiting-supplier forensics (adapted: lateness
    is shipping >90 days after the order date — this schema has no
    commit/receipt dates). The original's EXISTS / NOT EXISTS pair of
    correlated self-joins is re-expressed as ONE aggregation per
    order: a supplier "kept the order waiting" when it shipped late
    in a multi-supplier finalized order where every other supplier was
    on time. GroupBy-reformulation beats the 3-way self-join at scale:
    the fact shuffles once on orderkey (shared by the orders join and
    both per-order aggregates) instead of three times.

    Counts only — no float arithmetic anywhere.
    """
    orders = _table("orders")(spark, sf_dir).where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _table("lineitem")(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).cast("int")
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    wo = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(wo).alias("n_supps"),
        F.sum("late").over(wo).alias("n_late"),
    ).where(
        (F.col("late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1)
    )
    supp = _table("supplier")(spark, sf_dir).select("s_suppkey", "s_name")
    return (
        flagged.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_LATE_SUPPLIERS_ORACLE = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
fl AS (
  SELECT *,
    count(*) OVER (PARTITION BY l_orderkey) AS n_supps,
    sum(late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_supp
)
SELECT s_name, count(*) AS numwait
FROM fl JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supps > 1 AND n_late = 1
GROUP BY 1
"""


def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe / Sortino ratios per symbol
    (`operators/indicators.py:sharpe_sortino`)."""
    return indicators.sharpe_sortino(
        _daily_close(spark, sf_dir), trading_days=252, close_col="close"
    )


_SHARPE_SORTINO_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
r AS (
  SELECT symbol,
    round(CASE WHEN lag(close) OVER ws <> 0
               THEN close / lag(close) OVER ws - 1 END, 6) AS r
  FROM d
  WINDOW ws AS (PARTITION BY symbol ORDER BY date)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
a AS (
  SELECT symbol, count(*) AS n_returns,
    CAST(sum(CAST(r AS DECIMAL(19,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(r AS DECIMAL(19,6)) * CAST(r AS DECIMAL(19,6)))
         AS DOUBLE) AS sxx,
    CAST(sum(CAST(least(r, 0.0) AS DECIMAL(19,6))
             * CAST(least(r, 0.0) AS DECIMAL(19,6))) AS DOUBLE) AS sdd
  FROM rr GROUP BY symbol
),
s AS (
  SELECT symbol, n_returns, sx / n_returns AS mean_r,
    CASE WHEN n_returns >= 2 THEN
      sqrt(greatest((sxx - sx * sx / n_returns) / (n_returns - 1), 0.0))
    END AS std_r,
    CASE WHEN n_returns >= 2 THEN
      sqrt(sdd / (n_returns - 1))
    END AS dstd_r
  FROM a
)
SELECT symbol, n_returns,
  {_round_sql("mean_r", 6)} AS mean_return,
  {_round_sql("std_r", 6)} AS std_return,
  {_round_sql("dstd_r", 6)} AS downside_dev,
  {_round_sql("CASE WHEN std_r > 0 THEN mean_r / std_r * sqrt(252.0) END", 6)}
    AS sharpe_annual,
  {_round_sql("CASE WHEN dstd_r > 0 THEN mean_r / dstd_r * sqrt(252.0) END", 6)}
    AS sortino_annual
FROM s
"""


def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 5% VaR and CVaR per symbol by discrete rank selection
    (`operators/indicators.py:var_cvar`)."""
    return indicators.var_cvar(
        _daily_close(spark, sf_dir), alpha_pct=5, close_col="close"
    )


_VAR_CVAR_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
r AS (
  SELECT symbol,
    round(CASE WHEN lag(close) OVER ws <> 0
               THEN close / lag(close) OVER ws - 1 END, 6) AS r
  FROM d
  WINDOW ws AS (PARTITION BY symbol ORDER BY date)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
rk AS (
  SELECT symbol, r,
    row_number() OVER (PARTITION BY symbol ORDER BY r) AS rn,
    count(*) OVER (PARTITION BY symbol) AS n
  FROM rr
),
kk AS (SELECT *, (n * 5 + 99) // 100 AS k FROM rk)
SELECT symbol, max(n) AS n_returns, max(k) AS k_tail,
  max(CASE WHEN rn = k THEN r END) AS var_5pct,
  round(CAST(sum(CASE WHEN rn <= k THEN CAST(r AS DECIMAL(19,6)) END)
             AS DOUBLE) / max(k), 6) AS cvar_5pct
FROM kk GROUP BY symbol
"""


# --------------------------------------------------------------------------
# Round-7 batch 13: cohort LTV, dollar bars, forecast skill
# --------------------------------------------------------------------------


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves (purchase revenue per cohort-age,
    accumulated) (`operators/behavior.py:cohort_ltv`)."""
    return behavior.cohort_ltv(_events(spark, sf_dir))


_COHORT_LTV_ORACLE = """
WITH e AS (
  SELECT user_id, event_type AS etype, CAST(ts AS DATE) AS day,
         round(value, 6) AS rev,
         min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
  FROM events
),
per AS (
  SELECT cohort_day, day - cohort_day AS day_offset,
         sum(CAST(CASE WHEN etype = 'purchase' THEN rev ELSE 0.0 END
                  AS DECIMAL(18,6))) AS _rev
  FROM e GROUP BY cohort_day, day - cohort_day
),
sizes AS (
  SELECT cohort_day, count(*) AS cohort_size FROM (
    SELECT DISTINCT user_id, cohort_day FROM e
  ) t GROUP BY cohort_day
),
curve AS (
  SELECT cohort_day, day_offset,
         round(CAST(_rev AS DOUBLE), 6) AS revenue,
         round(CAST(sum(_rev) OVER (PARTITION BY cohort_day
                                    ORDER BY day_offset
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS DOUBLE), 6)
           AS cum_revenue
  FROM per
)
SELECT c.cohort_day, c.day_offset, c.revenue, c.cum_revenue,
       s.cohort_size,
       round(c.cum_revenue / s.cohort_size, 6) AS ltv_per_user
FROM curve c JOIN sizes s ON c.cohort_day = s.cohort_day
"""


def q_dollar_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-notional dollar bars over lineitem
    (`operators/ohlcv.py:dollar_bars`)."""
    ensure_engine_conf(spark)
    li = _table("lineitem")(spark, sf_dir).withColumn(
        "lid", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    return ohlcv.dollar_bars(
        li,
        bar_notional=20_000_000,
        symbol_col="l_returnflag",
        ts_col="l_shipdate",
        price_col="l_extendedprice",
        volume_col="l_quantity",
        id_col="lid",
    )


_DOLLAR_BARS_ORACLE = """
WITH t AS (
  SELECT l_returnflag AS symbol, l_shipdate AS ts,
         l_orderkey * 100 + l_linenumber AS tid,
         l_extendedprice AS price,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6))
              * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(28,8)) AS vq
  FROM lineitem
),
c AS (
  SELECT *, sum(vq) OVER w AS cum
  FROM t
  WINDOW w AS (PARTITION BY symbol ORDER BY ts, tid, price, vq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT *,
         CAST(floor(CAST(cum - vq AS DOUBLE) / 20000000.0) AS BIGINT) AS bar
  FROM c
)
SELECT DISTINCT symbol, bar,
       min(ts) OVER wb AS bar_start,
       max(ts) OVER wb AS bar_end,
       round(first_value(price) OVER wb, 6) AS bar_open,
       round(max(price) OVER wb, 6) AS bar_high,
       round(min(price) OVER wb, 6) AS bar_low,
       round(last_value(price) OVER wb, 6) AS bar_close,
       CAST(sum(vq) OVER wb AS DOUBLE) AS bar_notional,
       count(*) OVER wb AS n_ticks
FROM b
WINDOW wb AS (PARTITION BY symbol, bar ORDER BY ts, tid, price, vq
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-vs-naive one-step forecast skill per symbol
    (`operators/indicators.py:forecast_eval`)."""
    return indicators.forecast_eval(
        _daily_close(spark, sf_dir), alpha=0.3, beta=0.1, close_col="close"
    )


def _forecast_eval_oracle(alpha: float = 0.3, beta: float = 0.1) -> str:
    return f"""
WITH RECURSIVE {_holt_cte(alpha, beta)},
h AS (
  SELECT symbol, date, close,
         {_round_sql("level + trend", 6)} AS forecast
  FROM rec
),
er AS (
  SELECT symbol,
         round(abs(lead(close) OVER wl - forecast), 6) AS e_holt,
         round(abs(lead(close) OVER wl - close), 6) AS e_naive
  FROM h
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM er WHERE e_naive IS NOT NULL),
a AS (
  SELECT symbol, count(*) AS n_evals,
         round(CAST(sum(CAST(e_holt AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS mae_holt,
         round(CAST(sum(CAST(e_naive AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS mae_naive
  FROM f GROUP BY symbol
)
SELECT symbol, n_evals, mae_holt, mae_naive,
       round(CASE WHEN mae_naive <> 0
                  THEN 1 - mae_holt / mae_naive END, 6) AS skill
FROM a
"""




__all__ = [
    "_CMS_ORACLE",
    "_COHORT_LTV_ORACLE",
    "_CUMULATIVE_USERS_ORACLE",
    "_DAU_WAU_ORACLE",
    "_DOLLAR_BARS_ORACLE",
    "_EVENT_LIFT_ORACLE",
    "_EVENT_STUDY_ORACLE",
    "_FORECAST_REVENUE_ORACLE",
    "_IMPORTANT_STOCK_ORACLE",
    "_LATE_SUPPLIERS_ORACLE",
    "_LOCAL_SUPPLIER_ORACLE",
    "_MAD_ANOMALIES_ORACLE",
    "_MIN_COST_SUPPLIER_ORACLE",
    "_MOMENTUM_RANK_ORACLE",
    "_NATION_PROFIT_ORACLE",
    "_PORTFOLIO_INDEX_ORACLE",
    "_READABILITY_ORACLE",
    "_SESSION_PATHS_ORACLE",
    "_SHARPE_SORTINO_ORACLE",
    "_TOP_SUPPLIER_ORACLE",
    "_UNDERWATER_ORACLE",
    "_VAR_CVAR_ORACLE",
    "_WEEKLY_BARS_ORACLE",
    "_forecast_eval_oracle",
    "_lang_confusion_oracle",
    "q_cms_heavy_hitters",
    "q_cohort_ltv",
    "q_cumulative_users",
    "q_dau_wau",
    "q_dollar_bars",
    "q_event_lift",
    "q_event_study",
    "q_forecast_eval",
    "q_forecast_revenue",
    "q_important_stock",
    "q_lang_confusion",
    "q_late_suppliers",
    "q_local_supplier_revenue",
    "q_mad_anomalies",
    "q_min_cost_supplier",
    "q_momentum_rank",
    "q_nation_profit",
    "q_portfolio_index",
    "q_readability",
    "q_session_paths",
    "q_sharpe_sortino",
    "q_top_supplier",
    "q_underwater_spells",
    "q_var_cvar",
    "q_weekly_bars",
]
