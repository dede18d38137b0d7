"""Distribution drift: KS/PSI/chi-square, series, calibration, Ljung-Box, projections.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.indicators import (  # noqa: F401
    _DAILY_CLOSE_CTE,
    _daily_close,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.similarity import (  # noqa: F401
    _DIM,
    _plane_dot_sql,
)


# --------------------------------------------------------------------------
# Round-7 batch 3: drift detection, JL projection, tolerant as-of
# --------------------------------------------------------------------------

#: weekend split shared by the drift queries: Spark dayofweek is
#: 1=Sunday..7=Saturday; DuckDB dayofweek (dow) is 0=Sunday..6=Saturday.
_WEEKEND_SQL = "CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END"


def _events_weekend_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).withColumn(
        "is_weekend", F.dayofweek("ts").isin(1, 7).cast("int")
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic per event type: weekday vs weekend
    value distributions (`operators/metrics.py:ks_drift`)."""
    return metrics.ks_drift(
        _events_weekend_split(spark, sf_dir),
        group_col="event_type",
        side_col="is_weekend",
        value_col="value",
    )


_KS_ORACLE = f"""
WITH v AS (
  SELECT event_type AS grp, value AS val, {_WEEKEND_SQL} AS is_b
  FROM events
),
pv AS (
  SELECT grp, val,
         CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM v GROUP BY grp, val
),
g AS (
  SELECT grp,
         sum(ca) OVER wrun AS cum_a, sum(cb) OVER wrun AS cum_b,
         sum(ca) OVER wall AS n_a, sum(cb) OVER wall AS n_b
  FROM pv
  WINDOW wrun AS (PARTITION BY grp ORDER BY val
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY grp)
)
SELECT grp, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       round(max(CASE WHEN n_a > 0 AND n_b > 0
                      THEN abs(CAST(cum_a AS DOUBLE) / n_a
                               - CAST(cum_b AS DOUBLE) / n_b) END),
             6) AS ks_stat
FROM g GROUP BY grp
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type, weekday (reference)
    vs weekend (current) (`operators/metrics.py:psi_drift`)."""
    return metrics.psi_drift(
        _events_weekend_split(spark, sf_dir),
        group_col="event_type",
        side_col="is_weekend",
        value_col="value",
        bin_width=25.0,
        n_bins=8,
    )


_PSI_ORACLE = f"""
WITH v AS (
  SELECT event_type AS grp, value AS val, {_WEEKEND_SQL} AS is_b
  FROM events
),
pb AS (
  SELECT grp,
         greatest(least(CAST(floor(val / 25.0) AS INT), 7), 0) AS bin,
         CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cc
  FROM v GROUP BY grp, bin
),
sh AS (
  SELECT grp, bin,
         round(CAST(cr AS DOUBLE) / sum(cr) OVER wall, 6) AS p,
         round(CAST(cc AS DOUBLE) / sum(cc) OVER wall, 6) AS q,
         sum(cr) OVER wall AS n_ref, sum(cc) OVER wall AS n_cur
  FROM pb
  WINDOW wall AS (PARTITION BY grp)
)
SELECT grp, CAST(max(n_ref) AS BIGINT) AS n_ref,
       CAST(max(n_cur) AS BIGINT) AS n_cur,
       round(CAST(sum(CAST(round(
           (greatest(p, 1e-6) - greatest(q, 1e-6))
           * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 12)
         AS DECIMAL(28,12))) AS DOUBLE), 6) AS psi
FROM sh WHERE n_ref > 0 AND n_cur > 0
GROUP BY grp
"""


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event type × day-of-week
    (`operators/metrics.py:chi_square_independence`)."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.dayofweek("ts").alias("weekday")
    )
    return metrics.chi_square_independence(ev, "event_type", "weekday")


_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type AS a, dayofweek(ts) + 1 AS b, count(*) AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT a, b, o,
         sum(o) OVER (PARTITION BY a) AS row_tot,
         sum(o) OVER (PARTITION BY b) AS col_tot,
         sum(o) OVER () AS n
  FROM cells
)
SELECT round(CAST(sum(CAST(round(
         (o - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / n)
         * (o - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / n)
         / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / n), 10)
       AS DECIMAL(28,10))) AS DOUBLE), 6) AS chi2,
       CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT)
         AS dof,
       CAST(max(n) AS BIGINT) AS n
FROM m
"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ±1 Johnson–Lindenstrauss projection of the
    embeddings to 16 dims, long form
    (`operators/similarity.py:random_projection`)."""
    return similarity.random_projection(
        _table("embeddings")(spark, sf_dir), out_dim=16
    )


_RANDOM_PROJECTION_ORACLE = """
WITH proj AS (
  SELECT CAST(i // 16 AS INT) AS dim, CAST(i % 16 AS INT) AS k,
         CASE WHEN CAST('0x' || substr(md5(
                  'rp:' || CAST(CAST(i // 16 AS INT) AS VARCHAR)
                  || ':' || CAST(CAST(i % 16 AS INT) AS VARCHAR)), 1, 8)
                AS BIGINT) % 2 = 1
              THEN 1 ELSE -1 END AS sign
  FROM (SELECT unnest(range(1024)) AS i) r
),
x AS (
  SELECT vec_id, t.i - 1 AS dim,
         CAST(round(CAST(embedding[t.i] AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS x6
  FROM embeddings, unnest(range(1, 65)) AS t(i)
)
SELECT x.vec_id, p.k AS out_dim,
       {round_component} AS component
FROM x JOIN proj p ON x.dim = p.dim
GROUP BY x.vec_id, p.k
""".format(
    # /4 is exact in binary, so the quotient routinely lands on a
    # literal 5 at the 7th decimal — the Spark-repr vs binary round
    # tie _round_sql exists for
    round_component=_round_sql(
        "CAST(sum(CASE WHEN p.sign = 1 THEN x.x6 ELSE -x.x6 END)"
        " AS DOUBLE) / sqrt(16.0)",
        6,
    )
)


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour staleness bound + realized match age
    (`operators/relational.py:asof_join_tolerance`)."""
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
    return relational.asof_join_tolerance(
        ev.select("event_id", "ts", "user_id", "value"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_vals=["p_value"],
        tolerance_us=3_600_000_000,
    )


_ASOF_TOLERANCE_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts, value AS p_value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') t
  WHERE rn = 1),
j AS (
  SELECT e.event_id, e.ts, e.user_id, e.value, p.p_ts, p.p_value
  FROM events e ASOF LEFT JOIN p
    ON e.user_id = p.user_id AND e.ts >= p.p_ts
)
SELECT event_id, ts, user_id, value,
       CASE WHEN p_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(p_ts) <= 3600000000
            THEN p_value END AS p_value,
       CASE WHEN p_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(p_ts) <= 3600000000
            THEN epoch_us(ts) - epoch_us(p_ts) END AS asof_age_us
FROM j
"""


# --------------------------------------------------------------------------
# Round-7 batch 16: Ljung-Box, engagement decay, AMS F2
# --------------------------------------------------------------------------


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box white-noise test on daily returns, lags 1..5
    (`operators/indicators.py:ljung_box`)."""
    return indicators.ljung_box(
        _daily_close(spark, sf_dir), h=5, close_col="close"
    )


def _ljung_box_oracle(h: int = 5) -> str:
    q12 = "floor(({x}) * 1e12 + 0.5) / 1e12"
    lag_cols = ",\n         ".join(
        f"lag(d, {k}) OVER wl AS d{k}" for k in range(1, h + 1)
    )
    nums = ",\n         ".join(
        f"CAST(sum(CAST({q12.format(x=f'd * d{k}')} AS DECIMAL(28,12)))"
        f" AS DOUBLE) AS num{k}"
        for k in range(1, h + 1)
    )
    rho = {
        k: f"(CASE WHEN den <> 0 THEN num{k} / den END)" for k in range(1, h + 1)
    }
    qsum = " + ".join(
        f"{rho[k]} * {rho[k]} / (n - {k})" for k in range(1, h + 1)
    )
    rho_outs = ",\n       ".join(
        f"round({rho[k]}, 6) AS rho_{k}" for k in range(1, h + 1)
    )
    return f"""
WITH d0 AS ({_DAILY_CLOSE_CTE}),
rr AS (
  SELECT symbol, date,
         round(CASE WHEN lag(close) OVER wl <> 0
                    THEN close / lag(close) OVER wl - 1 END, 6) AS r
  FROM d0
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM rr WHERE r IS NOT NULL),
m AS (
  SELECT symbol, date, r,
         {q12.format(x="CAST(sum(CAST(r AS DECIMAL(18,6))) OVER wa AS DOUBLE) / count(*) OVER wa")} AS rbar
  FROM f
  WINDOW wa AS (PARTITION BY symbol)
),
dv AS (SELECT symbol, date, {q12.format(x="r - rbar")} AS d FROM m),
lg AS (
  SELECT symbol, d,
         {lag_cols}
  FROM dv
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
a AS (
  SELECT symbol, count(*) AS n,
         CAST(sum(CAST({q12.format(x="d * d")} AS DECIMAL(28,12)))
              AS DOUBLE) AS den,
         {nums}
  FROM lg GROUP BY symbol
)
SELECT symbol, n,
       {rho_outs},
       round(CASE WHEN n > {h + 1}
                  THEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2)
                       * ({qsum}) END, 6) AS lb_q
FROM a
"""


def q_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed per-user engagement scores as of 2024-03-01
    (`operators/behavior.py:engagement_score`)."""
    return behavior.engagement_score(
        _events(spark, sf_dir), as_of="2024-03-01"
    )


def _engagement_oracle() -> str:
    table = behavior.decay_table(7.0)
    arr = "[" + ", ".join(repr(v) for v in table) + "]"
    return f"""
WITH t AS (
  SELECT user_id,
         DATE '2024-03-01' - CAST(ts AS DATE) AS age,
         CASE event_type WHEN 'click' THEN 1.0 WHEN 'purchase' THEN 5.0
              WHEN 'signup' THEN 3.0 ELSE 0.5 END AS w
  FROM events
),
d AS (
  SELECT user_id,
         CAST(round(w * (CASE WHEN age >= 0 AND age < {len(table)}
                              THEN ({arr})[age + 1]
                              ELSE 0.0 END), 8) AS DECIMAL(18,8)) AS term
  FROM t
)
SELECT user_id, count(*) AS n_events,
       {_round_sql("CAST(sum(term) AS DOUBLE)", 6)} AS engagement
FROM d GROUP BY user_id
"""


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 sketch vs exact second frequency moment of user_id
    (`operators/sketches.py:ams_f2`)."""
    return sketches.ams_f2(_events(spark, sf_dir), "user_id")


def _ams_f2_oracle(n_sketches: int = 16) -> str:
    sign = (
        "((CAST('0x' || substr(md5('ams{j}:' || k), 1, 8) AS BIGINT) % 2)"
        " * 2 - 1)"
    )
    s_cols = ",\n         ".join(
        f"sum(f * {sign.format(j=j)}) AS S{j}" for j in range(n_sketches)
    )
    sq = " + ".join(f"S{j} * S{j}" for j in range(n_sketches))
    return f"""
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS f
  FROM events GROUP BY 1
),
a AS (
  SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact,
         {s_cols}
  FROM counts
)
SELECT f2_exact,
       round(CAST(({sq}) AS DOUBLE) / {float(n_sketches)!r}, 6) AS f2_est,
       round(abs(CAST(({sq}) AS DOUBLE) / {float(n_sketches)!r}
                 - CAST(f2_exact AS DOUBLE)) / f2_exact, 6) AS rel_err
FROM a
"""


# --------------------------------------------------------------------------
# Round-7 batch 18: drift time series, ANN threshold calibration
# --------------------------------------------------------------------------


def q_drift_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly KS drift series: every later calendar week's value
    distribution vs the FIRST week, per event type — the monitoring
    time series a drift alarm consumes (composition over
    `operators/metrics.py:ks_drift`). The week list is driver-
    enumerated (a dimension, same index-build precedent as the IVF
    centroids) so baseline replication stays an equi-join-free
    explode, never a nested-loop join."""
    ev = _events(spark, sf_dir).withColumn(
        "week", F.date_trunc("week", F.col("ts"))
    )
    weeks = sorted(
        r.week for r in ev.select("week").distinct().collect()
    )
    if len(weeks) < 2:
        # degenerate scale factor: <2 distinct weeks means no
        # (baseline, later) pair exists — return an empty frame with
        # the ks_drift output schema instead of exploding an empty
        # literal array (which would be a zero-column F.array()).
        return metrics.ks_drift(
            ev.select(
                F.lit("").alias("grp"),
                F.col("value").alias("val"),
                F.lit(0).alias("is_b"),
            ).limit(0),
            group_col="grp", side_col="is_b", value_col="val",
        )
    base_week, later = weeks[0], weeks[1:]
    wfmt = F.date_format(F.col("w"), "yyyy-MM-dd")
    cur = ev.where(F.col("week") != F.lit(base_week)).select(
        F.concat_ws(
            "|", "event_type", F.date_format("week", "yyyy-MM-dd")
        ).alias("grp"),
        F.col("value").alias("val"),
        F.lit(1).alias("is_b"),
    )
    base = (
        ev.where(F.col("week") == F.lit(base_week))
        .withColumn(
            "w",
            F.explode(F.array(*[F.lit(w) for w in later])),
        )
        .select(
            F.concat_ws("|", "event_type", wfmt).alias("grp"),
            F.col("value").alias("val"),
            F.lit(0).alias("is_b"),
        )
    )
    return metrics.ks_drift(
        cur.unionByName(base), group_col="grp", side_col="is_b",
        value_col="val",
    )


_DRIFT_SERIES_ORACLE = """
WITH e AS (
  SELECT event_type, value,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
),
wk AS (SELECT DISTINCT week FROM e),
base_w AS (SELECT min(week) AS bw FROM wk),
later AS (SELECT week FROM wk WHERE week > (SELECT bw FROM base_w)),
v AS (
  SELECT event_type || '|' || strftime(week, '%Y-%m-%d') AS grp,
         value AS val, 1 AS is_b
  FROM e WHERE week > (SELECT bw FROM base_w)
  UNION ALL
  SELECT e.event_type || '|' || strftime(l.week, '%Y-%m-%d') AS grp,
         e.value AS val, 0 AS is_b
  FROM e, later l WHERE e.week = (SELECT bw FROM base_w)
),
pv AS (
  SELECT grp, val,
         CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM v GROUP BY grp, val
),
g AS (
  SELECT grp,
         sum(ca) OVER wrun AS cum_a, sum(cb) OVER wrun AS cum_b,
         sum(ca) OVER wall AS n_a, sum(cb) OVER wall AS n_b
  FROM pv
  WINDOW wrun AS (PARTITION BY grp ORDER BY val
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY grp)
)
SELECT grp, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       round(max(CASE WHEN n_a > 0 AND n_b > 0
                      THEN abs(CAST(cum_a AS DOUBLE) / n_a
                               - CAST(cum_b AS DOUBLE) / n_b) END),
             6) AS ks_stat
FROM g GROUP BY grp
"""


def q_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine histogram of ALL same-LSH-bucket embedding pairs in
    0.05 bins — the curve that calibrates the near-dup threshold
    before a full dedup run (composition over
    `operators/similarity.py:embedding_neardup_pairs`)."""
    ensure_engine_conf(spark)
    pairs = similarity.embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=-2.0
    )
    binned = pairs.select(
        F.floor(F.col("cosine") * 20).cast("int").alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs")
    ).select(
        "bin",
        F.round(F.col("bin") / 20.0, 2).alias("bin_lo"),
        "n_pairs",
    )


def _threshold_calibration_oracle() -> str:
    bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql('embedding', p)} >= 0 THEN '1' ELSE '0' END)"
        for p in similarity.ANN_PLANES
    )
    dot = " + ".join(
        f"CAST(a.embedding[{i + 1}] AS DOUBLE) * CAST(b.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )
    na = " + ".join(
        f"CAST(a.embedding[{i + 1}] AS DOUBLE) * CAST(a.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )
    nb = " + ".join(
        f"CAST(b.embedding[{i + 1}] AS DOUBLE) * CAST(b.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )
    cos = (
        f"CASE WHEN sqrt({na}) > 0 AND sqrt({nb}) > 0 "
        f"THEN ({dot}) / (sqrt({na}) * sqrt({nb})) END"
    )
    return f"""
WITH bkt AS (SELECT vec_id, embedding, ({bits}) AS bucket FROM embeddings),
pr AS (
  SELECT CAST(floor(({cos}) * 20) AS INT) AS bin
  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT bin, round(bin / 20.0, 2) AS bin_lo, count(*) AS n_pairs
FROM pr GROUP BY bin
"""




__all__ = [
    "_ASOF_TOLERANCE_ORACLE",
    "_CHI2_ORACLE",
    "_DRIFT_SERIES_ORACLE",
    "_KS_ORACLE",
    "_PSI_ORACLE",
    "_RANDOM_PROJECTION_ORACLE",
    "_WEEKEND_SQL",
    "_ams_f2_oracle",
    "_engagement_oracle",
    "_events_weekend_split",
    "_ljung_box_oracle",
    "_threshold_calibration_oracle",
    "q_ams_f2",
    "q_asof_tolerance",
    "q_chi_square",
    "q_drift_series",
    "q_engagement",
    "q_ks_drift",
    "q_ljung_box",
    "q_psi_drift",
    "q_random_projection",
    "q_threshold_calibration",
]
