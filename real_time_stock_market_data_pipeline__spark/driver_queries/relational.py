"""TPC-H-ish relational surface: joins, merge-upsert, set ops, pivot/rollup, CDC.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.similarity import (  # noqa: F401
    _coldot_sql,
)


# --------------------------------------------------------------------------
# Relational surface over the TPC-H-ish tables
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter + groupBy with exact
    decimal sums; the shipdate filter is pushed to the parquet scan."""
    li = _table("lineitem")(spark, sf_dir)
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d6(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(d6(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(d6(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(d6(charge)).cast("double").alias("sum_charge"),
            (F.sum(d6(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(d6(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(d6(F.col("l_discount"))).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# The two COMPUTED per-row expressions route double->decimal through
# VARCHAR (the _round_sql recipe): Spark's double->decimal cast rounds
# the shortest decimal repr (BigDecimal.valueOf) HALF_UP while plain
# DuckDB rounds the exact binary value — they disagree exactly when a
# product's repr ends in a literal 5 at the 7th fractional digit
# (first hit by sum_charge at the x10 stress SF: one row in 6M).
# Raw columns keep the direct cast: their stored doubles carry <= 3
# fractional digits, so the 6-dp cast never rounds.
#
# Every aggregate DECIMAL -> DOUBLE goes through VARCHAR: DuckDB's
# direct decimal-to-double conversion double-rounds (scaled int128 ->
# double -> /10^scale) and is off by one ulp from the correctly-rounded
# value once the scaled integer exceeds 2^53 — Spark's
# BigDecimal.doubleValue IS correctly rounded, and so is DuckDB's
# VARCHAR -> DOUBLE strtod. First hit by sum_charge ~2.8e10 at the x10
# stress SF (sums at sf0.1 stay under the 2^53/10^6 ~ 9e9 boundary).
_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(sum(CAST(round(CAST(CAST(l_extendedprice * (1 - l_discount) AS VARCHAR) AS DECIMAL(35,17)), 6) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(round(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS VARCHAR) AS DECIMAL(35,17)), 6) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
  CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join + agg + deterministic top-k: the small dim
    side is explicitly broadcast, so no shuffle of orders for the join."""
    orders = _table("orders")(spark, sf_dir)
    customer = _table("customer")(spark, sf_dir)
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "inner",
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


_TOP_CUSTOMERS_ORACLE = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC NULLS LAST, c_custkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop star join (orders⋈customer⋈nation⋈region) with every
    dimension broadcast — zero shuffles on the fact side until the
    final small aggregation."""
    orders = _table("orders")(spark, sf_dir)
    customer = _table("customer")(spark, sf_dir)
    nation = _table("nation")(spark, sf_dir)
    region = _table("region")(spark, sf_dir)
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_REGION_REVENUE_ORACLE = """
SELECT r_name AS region,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(DISTINCT c_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: date-filtered fact⋈fact join, grouped revenue,
    global top-10. Both date filters push to the parquet scans; the
    per-row revenue product is one IEEE multiply, then decimal-summed
    (order-independent), so the ranking is engine-exact."""
    cutoff = F.to_timestamp(F.lit("2000-01-01"))
    orders = _table("orders")(spark, sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = _table("lineitem")(spark, sf_dir).filter(F.col("l_shipdate") > cutoff)
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_SHIPPING_PRIORITY_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '2000-01-01'
  AND l_shipdate > TIMESTAMP '2000-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_stream_realtime_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming path (file stream → watermark → foreachBatch
    dual-window metrics → keyed parquet MERGE upsert), drained with an
    ``availableNow`` trigger. Checked against the SAME oracle as the
    batch ``realtime_metrics``: streamed output must be bit-identical.
    """
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    tmp = tempfile.mkdtemp(prefix="rtsmdp_stream_")
    target = f"{tmp}/metrics"
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    q = pipeline.stream_realtime_metrics(
        src,
        target_path=target,
        checkpoint_path=f"{tmp}/ckpt",
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        available_now=True,
    )
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "symbol",
        "window_start",
        "window_15m_end",
        "window_1h_end",
        "moving_avg_price_15m",
        "moving_avg_price_1h",
        "price_volatility_15m",
        "price_volatility_1h",
        "total_volume_15m",
        "total_volume_1h",
    )


def q_stream_running_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op (applyInPandasWithState): running
    VWAP state per symbol over the event stream, drained with
    availableNow. The oracle checks the exact-arithmetic state columns
    (unit volumes sum exactly); the float vwap itself is arrival-order
    dependent and is covered by tests/test_stateful.py instead."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import (
        pipeline,
        stateful,
    )

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    ticks = src.select(
        F.col("event_type").alias("symbol"),
        F.col("value").alias("price"),
        F.lit(1.0).alias("volume"),
    )
    out = stateful.stream_running_vwap(ticks)
    tmp = tempfile.mkdtemp(prefix="vwap_q_")
    name = "vwap_driver_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT symbol, total_volume, n_events FROM (SELECT *, row_number() "
        f"OVER (PARTITION BY symbol ORDER BY n_events DESC) rn FROM {name}) "
        f"WHERE rn = 1"
    )


# --------------------------------------------------------------------------
# Merge-upsert / as-of join / set ops / pivot / rollup
# --------------------------------------------------------------------------


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3 semantics: even-id events are the target table, 3-divisible
    ids (with doubled value) are the incoming batch; matched keys are
    replaced, unmatched kept, new inserted."""
    ev = _events(spark, sf_dir)
    target = ev.filter(F.col("event_id") % 2 == 0)
    source = ev.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") * 2
    )
    return relational.merge_upsert(target, source, keys=["event_id"])


_MERGE_ORACLE = """
WITH target AS (SELECT * FROM events WHERE event_id % 2 = 0),
source AS (
  SELECT event_id, ts, user_id, event_type, value * 2 AS value, props
  FROM events WHERE event_id % 3 = 0)
SELECT * FROM target WHERE event_id NOT IN (SELECT event_id FROM source)
UNION ALL
SELECT * FROM source
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last purchase at-or-before each event per user — the canonical
    tick as-of query (SURVEY.md §2.3)."""
    ev = _events(spark, sf_dir)
    purchases = dedup.dedup_keep_last(
        ev.filter(F.col("event_type") == "purchase"),
        keys=["user_id", "ts"],
        order_by=["event_id"],
    ).select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    out = relational.asof_join(
        ev.select("event_id", "ts", "user_id", "value"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_vals=["p_ts", "p_value"],
    )
    return out.select(
        "event_id",
        "ts",
        "user_id",
        "value",
        F.col("p_ts").alias("last_purchase_ts"),
        F.col("p_value").alias("last_purchase_value"),
    )


_ASOF_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts, value AS p_value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') t
  WHERE rn = 1)
SELECT e.event_id, e.ts, e.user_id, e.value,
       p.p_ts AS last_purchase_ts,
       p.p_value AS last_purchase_value
FROM events e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts >= p.p_ts
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (set semantics) summarized as counts."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("value") > 100).select("user_id")
    spark_counts = [
        relational.set_union(a, b).agg(
            F.lit("union").alias("op"), F.count(F.lit(1)).alias("n")
        ),
        relational.set_intersect(a.distinct(), b.distinct()).agg(
            F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")
        ),
        relational.set_except(a, b).agg(
            F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")
        ),
    ]
    out = spark_counts[0]
    for df in spark_counts[1:]:
        out = out.unionByName(df)
    return out


_SET_OPS_ORACLE = """
WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
     b AS (SELECT user_id FROM events WHERE value > 100)
SELECT 'union' AS op, count(*) AS n FROM (SELECT user_id FROM a UNION SELECT user_id FROM b) t
UNION ALL
SELECT 'intersect', count(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b) t
UNION ALL
SELECT 'except', count(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b) t
"""


def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return relational.pivot_counts(
        ev, "user_id", "event_type", ["click", "view", "purchase", "signup", "error"]
    )


_PIVOT_ORACLE = """
SELECT user_id,
  count(*) FILTER (WHERE event_type = 'click') AS click,
  count(*) FILTER (WHERE event_type = 'view') AS view,
  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  count(*) FILTER (WHERE event_type = 'signup') AS signup,
  count(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY user_id
"""


def q_rollup_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return relational.rollup_metrics(
        ev,
        [F.col("event_type"), F.to_date("ts").alias("date")],
        "value",
    )


_ROLLUP_ORACLE = """
SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
"""


def q_cube_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return relational.cube_metrics(
        ev, [F.col("event_type"), F.col("user_id")], "value"
    )


_CUBE_ORACLE = """
SELECT event_type, user_id, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY CUBE (event_type, user_id)
"""


def q_active_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return relational.windowed_distinct_actives(
        ev, key_col="user_id", ts_col="ts", duration="1 hour",
        group_col="event_type",
    )


_ACTIVE_USERS_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS active_keys,
       count(*) AS events,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 + 3600000000) AS window_end
FROM events
GROUP BY 1, 4, 5
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation. The salt is internal —
    the result (and therefore the oracle) is the plain GROUP BY."""
    ev = _events(spark, sf_dir)
    return relational.salted_agg(ev, ["event_type"], "value", n_salts=16)


_SALTED_AGG_ORACLE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted large×large equi-join (lineitem ⋈ orders), reduced to a
    per-priority revenue summary so the checked output is small. The
    salt spreads any hot orderkey over 8 join tasks; the join result
    is row-identical to the unsalted join, which is what the oracle
    runs."""
    ensure_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = relational.salted_join(li, orders, ["l_orderkey"], n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )


_SALTED_JOIN_ORACLE = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch (discrete) + exact (continuous) quantiles per event_type,
    in long form (one row per key × quantile level — array cells don't
    canonicalize portably). Oracle: DuckDB quantile_disc /
    quantile_cont — verified bit-equal (percentile_approx at this
    accuracy picks the same data values; both engines interpolate
    quantile_cont identically)."""
    ev = _events(spark, sf_dir)
    return metrics.quantile_summary_long(ev, "event_type", "value")


_QUANTILES_ORACLE = """
WITH s AS (
  SELECT event_type AS key,
         quantile_disc(value, [0.25, 0.5, 0.75, 0.95]) AS qd,
         quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) AS qc,
         count(*) AS n
  FROM events GROUP BY event_type
)
SELECT key,
       unnest(CAST([0.25, 0.5, 0.75, 0.95] AS DOUBLE[])) AS q_level,
       unnest(qd) AS q_disc,
       unnest(qc) AS q_cont,
       n
FROM s
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type outlier clipping at the [0.05, 0.95] sketch
    quantiles; oracle = DuckDB quantile_disc band + CASE clamp (both
    engines pick actual data values, verified bit-equal)."""
    ev = _events(spark, sf_dir)
    return metrics.winsorize(ev, "event_type", "value", "event_id")


_WINSORIZE_ORACLE = """
WITH bands AS (
  SELECT event_type AS k,
         quantile_disc(value, 0.05) AS lo_band,
         quantile_disc(value, 0.95) AS hi_band
  FROM events GROUP BY event_type
)
SELECT event_id, event_type AS key, value,
       CASE WHEN value < lo_band THEN lo_band
            WHEN value > hi_band THEN hi_band
            ELSE value END AS clipped,
       lo_band, hi_band
FROM events JOIN bands ON event_type = k
"""


def q_topk_days_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: the 3 busiest days per symbol (volume desc, date
    desc tiebreak — a total order, so ranks are deterministic)."""
    d = ohlcv.daily_metrics(
        _events(spark, sf_dir),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    ).select("symbol", "date", "daily_volume")
    return relational.topk_per_group(d, ["symbol"], ["daily_volume", "date"], 3)


_TOPK_PER_GROUP_ORACLE = """
WITH d AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date,
         count(*) AS daily_volume
  FROM events GROUP BY 1, 2
)
SELECT symbol, date, daily_volume, rank FROM (
  SELECT symbol, date, daily_volume,
         row_number() OVER (PARTITION BY symbol
                            ORDER BY daily_volume DESC, date DESC) AS rank
  FROM d
) WHERE rank <= 3
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (30 min), ordinal ids, exact
    integer-microsecond durations."""
    ev = _events(spark, sf_dir)
    return temporal.sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)


_SESSIONIZE_ORACLE = """
WITH flags AS (
  SELECT user_id AS key, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT key, ts,
         CAST(sum(new_s) OVER (PARTITION BY key ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flags
)
SELECT key, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sess GROUP BY key, session_id
"""


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (no nested loop): events matched to value
    bands [band·50, (band+1)·50), then summarized per band. The oracle
    runs the literal BETWEEN join — the operator must reproduce it
    exactly while hash-joining on buckets."""
    ev = _events(spark, sf_dir)
    bands = spark.range(10).select(
        F.col("id").alias("band"),
        (F.col("id") * 50.0).alias("lo"),
        ((F.col("id") + 1) * 50.0).alias("hi"),
    )
    joined = temporal.range_join(
        ev.select("event_id", "value"), bands, "value", "lo", "hi", bucket_width=50.0
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


_RANGE_JOIN_ORACLE = """
SELECT band, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
JOIN (SELECT range AS band, range * 50.0 AS lo, (range + 1) * 50.0 AS hi
      FROM range(10)) bands
  ON value >= lo AND value < hi
GROUP BY band
"""


def q_cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous aggregate: hour computed from raw,
    day from hour partials, week from day partials. The oracle
    aggregates raw directly at every level, so the partial-derivation
    shortcut is verified bit-exact, not assumed."""
    ev = _events(spark, sf_dir)
    return temporal.cascade_rollup(ev, "ts", "event_type", "value")


_CASCADE_ROLLUP_ORACLE = """
SELECT 'hour' AS level, event_type AS key, date_trunc('hour', ts) AS bucket_start,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', event_type, date_trunc('day', ts), count(*),
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
       min(value), max(value)
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'week', event_type, date_trunc('week', ts), count(*),
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
       min(value), max(value)
FROM events GROUP BY 2, 3
"""

# --------------------------------------------------------------------------
# Relational extension pack — TPC-H-analogue shapes the base queries
# don't cover: outer-join double aggregation (Q13), conditional joined
# aggregate (Q14), grouped distinct count over a join (Q16), multi-hop
# top-k (Q10), window-derived correlated threshold (Q17), scalar
# subquery + anti-join (Q22). All revenue math uses the exact-decimal
# recipe proven by pricing_summary.
# --------------------------------------------------------------------------


def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customers LEFT JOIN orders, orders-per-customer, then
    the distribution of those counts. The join and the first aggregation
    share the c_custkey partitioning — one shuffle each side, no second
    exchange before the per-customer count."""
    customer = _table("customer")(spark, sf_dir)
    orders = _table("orders")(spark, sf_dir)
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_CUSTOMER_ORDER_COUNTS_ORACLE = """
WITH c AS (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT n_orders, count(*) AS n_customers FROM c GROUP BY n_orders
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional share of revenue from promo parts —
    broadcast dim join, two exact-decimal sums, one double division."""
    li = _table("lineitem")(spark, sf_dir)
    part = _table("part")(spark, sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
    total = F.sum(rev).cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * F.coalesce(promo, F.lit(0.0)) / total, 6).alias(
            "promo_pct"
        ),
        total.alias("total_revenue"),
    )


_PROMO_REVENUE_ORACLE = """
SELECT round(100.0 * coalesce(CAST(sum(CASE WHEN p_type = 'PROMO'
           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
         END) AS DOUBLE), 0.0)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
              AS DOUBLE), 6) AS promo_pct,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_supplier_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size), using
    lineitem as the part-supplier bridge. Distinct aggregation over a
    broadcast join — the two-phase distinct keeps partials map-side."""
    li = _table("lineitem")(spark, sf_dir)
    part = _table("part")(spark, sf_dir)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_SUPPLIER_TYPE_COUNTS_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2, 3
"""


def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer, top 20.
    Fact-side filter first (pushed to the scan), one shuffle join on
    orderkey, broadcast dims, deterministic top-k (custkey tiebreak)."""
    li = _table("lineitem")(spark, sf_dir).where(F.col("l_returnflag") == "R")
    orders = _table("orders")(spark, sf_dir)
    customer = _table("customer")(spark, sf_dir)
    nation = _table("nation")(spark, sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_RETURNED_ITEM_REVENUE_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from orders far below a part's average
    quantity. The per-part average is a window over the already-joined
    fact rows (single lineage — no re-scan second aggregation, cf. the
    tfidf df-as-window pattern), the brand filter prunes parts before
    the broadcast."""
    li = _table("lineitem")(spark, sf_dir)
    brand_parts = (
        _table("part")(spark, sf_dir)
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    joined = li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
    wp = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(wp).cast("double")
        / F.count(F.lit(1)).over(wp)
    )
    flagged = joined.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        avg_qty.alias("avg_qty"),
    ).where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return flagged.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_SMALL_QUANTITY_ORACLE = """
WITH j AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
),
w AS (
  SELECT *,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
              OVER (PARTITION BY l_partkey) AS DOUBLE)
           / count(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM j
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_lines
FROM w WHERE l_quantity < 0.2 * avg_qty
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers above the average positive balance with no
    *finalized* ('F') orders, per nation. Exercises the SQL surface
    directly: a scalar subquery (planned as an independent subquery
    stage, not a join) and NOT EXISTS (planned as a left-anti hash
    join). The status predicate keeps the anti-join selective on this
    data (every customer has *some* order)."""
    ensure_engine_conf(spark)
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_IDLE_RICH_SQL)


_IDLE_RICH_SQL = """
SELECT n_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                          / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY n_name
"""

# identical ANSI text runs on both engines
_IDLE_RICH_ORACLE = _IDLE_RICH_SQL


# --------------------------------------------------------------------------
# Round-6 relational additions: the classic TPC-H query shapes the
# tables support (Q4/Q7/Q8/Q13/Q18/Q19 adapted to the driver schema)
# --------------------------------------------------------------------------


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped nation-pair trade volume: revenue shipped from
    each supplier nation to each (different) customer nation by year,
    1995-1996. Nations broadcast twice under distinct aliases; the
    fact side shuffles once for the orderkey join and once for the
    final small aggregation."""
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = _table("lineitem")(spark, sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    orders = _table("orders")(spark, sf_dir).select("o_orderkey", "o_custkey")
    cust = _table("customer")(spark, sf_dir).select("c_custkey", "c_nationkey")
    supp = _table("supplier")(spark, sf_dir).select("s_suppkey", "s_nationkey")
    nation = _table("nation")(spark, sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(d6(vol)).cast("double").alias("revenue"))
    )


_VOLUME_SHIPPING_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_2 suppliers' share of
    PROMO-part revenue sold to ASIA customers, by order year. One
    fact-side pipeline with every dimension broadcast; the share is a
    conditional decimal sum over the same rows (no second scan)."""
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = _table("lineitem")(spark, sf_dir)
    part = (
        _table("part")(spark, sf_dir)
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = _table("orders")(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = _table("customer")(spark, sf_dir).select("c_custkey", "c_nationkey")
    supp = _table("supplier")(spark, sf_dir).select("s_suppkey", "s_nationkey")
    nation = _table("nation")(spark, sf_dir)
    region = _table("region")(spark, sf_dir).where(F.col("r_name") == "ASIA")
    n_cust = (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    target = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0))
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(d6(target)).cast("double").alias("nation_revenue"),
            F.sum(d6(vol)).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
                "mkt_share"
            ),
        )
    )


_MARKET_SHARE_ORACLE = """
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
    CASE WHEN n2.n_name = 'NATION_2'
         THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS target,
    l_extendedprice * (1 - l_discount) AS vol
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
),
s AS (
  SELECT o_year,
    CAST(sum(CAST(target AS DECIMAL(18,6))) AS DOUBLE) AS nation_revenue,
    CAST(sum(CAST(vol AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM base GROUP BY o_year
)
SELECT o_year, nation_revenue, total_revenue,
       round(nation_revenue / total_revenue, 6) AS mkt_share
FROM s
"""


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders with at least one
    line shipped more than 30 days after the order date, counted per
    priority. The EXISTS becomes a left-semi equi-join on orderkey
    with the date comparison as a residual predicate — no fact
    materialization, one shuffle."""
    orders = _table("orders")(spark, sf_dir)
    li = _table("lineitem")(spark, sf_dir).select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution, including
    zero-order customers via the left outer join. Two aggregations:
    per-customer counts (shuffle on custkey), then the tiny histogram."""
    cust = _table("customer")(spark, sf_dir).select("c_custkey")
    orders = _table("orders")(spark, sf_dir).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_CUSTOMER_DISTRIBUTION_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: orders whose total
    quantity exceeds 170, with their customer. The HAVING filter runs
    on the aggregated (per-order) side BEFORE the joins, so only
    qualifying orderkeys reach the orders/customer join."""
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = _table("lineitem")(spark, sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(d6(F.col("l_quantity"))).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 170)
    )
    orders = _table("orders")(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _table("customer")(spark, sf_dir).select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


_LARGE_VOLUME_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 170
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three
    brand/size/quantity branches OR-ed together. The part side is
    pre-filtered to the union of branches and broadcast; the full
    disjunction is the join's residual predicate, evaluated inside
    whole-stage codegen."""
    d6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = _table("lineitem")(spark, sf_dir)
    part = _table("part")(spark, sf_dir).select("p_partkey", "p_brand", "p_size")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(part),
            (F.col("l_partkey") == F.col("p_partkey")) & branch,
        )
        .agg(
            F.sum(d6(disc_price)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_DISJUNCTIVE_REVENUE_ORACLE = """
SELECT
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


# --------------------------------------------------------------------------
# Round-7 batch 10: rate alerts, CDC apply, volume bars, kNN label eval
# --------------------------------------------------------------------------


def q_stream_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rate alerts (6 h windows, count>3),
    drained availableNow
    (`streaming/pipeline.py:stream_rate_alert`)."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    tmp = tempfile.mkdtemp(prefix="alert_q_")
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("symbol"), "ts"
    )
    q = pipeline.stream_rate_alert(
        src,
        target_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        duration="6 hours",
        threshold=3,
        available_now=True,
    )
    q.awaitTermination()
    return spark.read.parquet(f"{tmp}/out").select(
        "symbol", "window_start", "window_end", "n_events", "severity"
    )


_STREAM_RATE_ALERT_ORACLE = """
WITH w AS (
  SELECT event_type AS symbol,
         make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
           AS window_start
  FROM events
),
a AS (
  SELECT symbol, window_start,
         window_start + INTERVAL 6 HOUR AS window_end,
         count(*) AS n_events
  FROM w GROUP BY symbol, window_start
),
mx AS (SELECT max(ts) AS m FROM events)
SELECT a.symbol, a.window_start, a.window_end, a.n_events,
       round(CAST(a.n_events AS DOUBLE) / 3, 6) AS severity
FROM a, mx
WHERE a.n_events > 3
  AND epoch_ms(a.window_end) <= epoch_ms(mx.m) - 60000
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-batch application to the customer snapshot: every
    5th customer updated (last of two conflicting ops wins by seq),
    every 7th deleted, 100 fresh inserts
    (`operators/relational.py:cdc_apply`)."""
    ensure_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    upd_stale = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
        F.lit("STALE").alias("c_mktsegment"),
        F.col("c_acctbal"),
    )
    upd_fresh = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
        F.lit("UPDATED").alias("c_mktsegment"),
        (F.col("c_acctbal") + 10).alias("c_acctbal"),
    )
    dels = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("D").alias("op"),
        F.lit(3).alias("seq"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("double").alias("c_acctbal"),
    )
    ins = spark.range(1_000_000, 1_000_100).select(
        F.col("id").alias("c_custkey"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    changes = upd_stale.unionByName(upd_fresh).unionByName(dels).unionByName(ins)
    return relational.cdc_apply(
        cust,
        changes,
        key_cols=["c_custkey"],
        payload_cols=["c_mktsegment", "c_acctbal"],
    )


_CDC_APPLY_ORACLE = """
WITH cust AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer)
-- untouched: neither updated (%5), deleted (%7), nor an insert key
SELECT c_custkey, c_mktsegment, c_acctbal FROM cust
WHERE c_custkey % 5 <> 0 AND c_custkey % 7 <> 0
UNION ALL
-- updated and NOT deleted: the seq=2 fresh update wins over seq=1;
-- a key hit by both %5 and %7 takes the delete (seq=3 is highest)
SELECT c_custkey, 'UPDATED', c_acctbal + 10 FROM cust
WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 0
UNION ALL
-- inserts
SELECT 1000000 + i AS c_custkey, 'NEW', 0.0
FROM (SELECT unnest(range(100)) AS i) g
"""


def q_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-volume bars over lineitem's true quantities (López de
    Prado information-driven bars)
    (`operators/ohlcv.py:volume_bars`)."""
    ensure_engine_conf(spark)
    li = _table("lineitem")(spark, sf_dir).withColumn(
        "lid", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    return ohlcv.volume_bars(
        li,
        bar_volume=5000,
        symbol_col="l_returnflag",
        ts_col="l_shipdate",
        price_col="l_extendedprice",
        volume_col="l_quantity",
        id_col="lid",
    )


_VOLUME_BARS_ORACLE = """
WITH t AS (
  SELECT l_returnflag AS symbol, l_shipdate AS ts,
         l_orderkey * 100 + l_linenumber AS tid,
         l_extendedprice AS price,
         CAST(l_quantity AS DECIMAL(18,2)) AS vq
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
         CAST(floor(CAST(cum - vq AS DOUBLE) / 5000.0) AS BIGINT) AS bar
  FROM c
)
SELECT DISTINCT symbol, bar,
       min(ts) OVER wb AS bar_start,
       max(ts) OVER wb AS bar_end,
       round(first_value(price) OVER wb, 6) AS bar_open,
       round(max(price) OVER wb, 6) AS bar_high,
       round(min(price) OVER wb, 6) AS bar_low,
       round(last_value(price) OVER wb, 6) AS bar_close,
       CAST(sum(vq) OVER wb AS DOUBLE) AS bar_volume,
       count(*) OVER wb AS n_ticks
FROM b
WINDOW wb AS (PARTITION BY symbol, bar ORDER BY ts, tid, price, vq
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label prediction vs truth on a deterministic
    query sample (`operators/similarity.py:knn_label_eval`)."""
    ensure_engine_conf(spark)
    return similarity.knn_label_eval(
        load_table(spark, sf_dir, "embeddings"), query_mod=50, k=10
    )


def _knn_label_eval_oracle(query_mod: int = 50, k: int = 10) -> str:
    dot = _coldot_sql("p.qe", "e.embedding")
    ne = _coldot_sql("e.embedding", "e.embedding")
    nq = _coldot_sql("p.qe", "p.qe")
    cos = (
        f"CASE WHEN sqrt({ne}) > 0 AND sqrt({nq}) > 0 "
        f"THEN ({dot}) / (sqrt({ne}) * sqrt({nq})) END"
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS true_label
  FROM embeddings WHERE vec_id % {query_mod} = 0
),
cand AS (
  SELECT p.query_id, e.vec_id AS nn_id, e.label, {cos} AS cosine
  FROM q p JOIN embeddings e ON e.vec_id <> p.query_id
),
topk AS (
  SELECT query_id, nn_id, label FROM (
    SELECT query_id, nn_id, label,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC NULLS LAST, nn_id) AS rn
    FROM cand
  ) WHERE rn <= {k}
),
votes AS (
  SELECT query_id, label, count(*) AS n_votes
  FROM topk GROUP BY query_id, label
),
maj AS (
  SELECT query_id, label AS predicted_label,
         CAST(n_votes AS BIGINT) AS n_votes
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY n_votes DESC, label) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT m.query_id, q.true_label, m.predicted_label, m.n_votes,
       CAST(q.true_label = m.predicted_label AS INT) AS correct
FROM maj m JOIN q ON m.query_id = q.query_id
"""




__all__ = [
    "_ACTIVE_USERS_ORACLE",
    "_ASOF_ORACLE",
    "_CASCADE_ROLLUP_ORACLE",
    "_CDC_APPLY_ORACLE",
    "_CUBE_ORACLE",
    "_CUSTOMER_DISTRIBUTION_ORACLE",
    "_CUSTOMER_ORDER_COUNTS_ORACLE",
    "_DISJUNCTIVE_REVENUE_ORACLE",
    "_IDLE_RICH_ORACLE",
    "_IDLE_RICH_SQL",
    "_LARGE_VOLUME_ORACLE",
    "_MARKET_SHARE_ORACLE",
    "_MERGE_ORACLE",
    "_ORDER_PRIORITY_ORACLE",
    "_PIVOT_ORACLE",
    "_PRICING_ORACLE",
    "_PROMO_REVENUE_ORACLE",
    "_QUANTILES_ORACLE",
    "_RANGE_JOIN_ORACLE",
    "_REGION_REVENUE_ORACLE",
    "_RETURNED_ITEM_REVENUE_ORACLE",
    "_ROLLUP_ORACLE",
    "_SALTED_AGG_ORACLE",
    "_SALTED_JOIN_ORACLE",
    "_SESSIONIZE_ORACLE",
    "_SET_OPS_ORACLE",
    "_SHIPPING_PRIORITY_ORACLE",
    "_SMALL_QUANTITY_ORACLE",
    "_STREAM_RATE_ALERT_ORACLE",
    "_SUPPLIER_TYPE_COUNTS_ORACLE",
    "_TOPK_PER_GROUP_ORACLE",
    "_TOP_CUSTOMERS_ORACLE",
    "_VOLUME_BARS_ORACLE",
    "_VOLUME_SHIPPING_ORACLE",
    "_WINSORIZE_ORACLE",
    "_knn_label_eval_oracle",
    "q_active_users_hourly",
    "q_asof_join",
    "q_cascade_rollup",
    "q_cdc_apply",
    "q_cube_event_value",
    "q_customer_distribution",
    "q_customer_order_counts",
    "q_disjunctive_revenue",
    "q_idle_rich_customers",
    "q_knn_label_eval",
    "q_large_volume_customers",
    "q_market_share",
    "q_merge_upsert",
    "q_order_priority_counts",
    "q_pivot_event_counts",
    "q_pricing_summary",
    "q_promo_revenue",
    "q_range_join_bands",
    "q_region_revenue",
    "q_returned_item_revenue",
    "q_rollup_event_value",
    "q_salted_agg",
    "q_salted_join",
    "q_sessionize",
    "q_set_ops",
    "q_shipping_priority",
    "q_small_quantity_revenue",
    "q_stream_rate_alert",
    "q_stream_realtime_metrics",
    "q_stream_running_vwap",
    "q_supplier_type_counts",
    "q_top_customers",
    "q_topk_days_per_symbol",
    "q_value_quantiles",
    "q_volume_bars",
    "q_volume_shipping",
    "q_winsorize",
]
