"""ML data prep: splits, balancing, feature hashing, leakage-free matrices.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.dedup import (  # noqa: F401
    _TOKS,
    _minhash_cte,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.indicators import (  # noqa: F401
    _DAILY_CLOSE_CTE,
    _daily_close,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.ohlcv import (  # noqa: F401
    _DAILY_EVENTS_ORACLE,
    q_daily_metrics,
)


# --------------------------------------------------------------------------
# Round-7 batch 8: cluster-aware split, Spearman, VPIN
# --------------------------------------------------------------------------


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split keyed on near-dup cluster
    ids — all members of a component share a split
    (`operators/dedup.py:cluster_aware_split`)."""
    return dedup.cluster_aware_split(_table("documents")(spark, sf_dir))


def _cluster_split_oracle() -> str:
    decode = " + ".join(
        f"(strpos('0123456789abcdef',"
        f" substr(md5(CAST(split_key AS VARCHAR)), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
WITH RECURSIVE {_minhash_cte()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION
  SELECT id_b AS u, id_a AS v FROM cand
),
reach AS (
  SELECT u AS src, u AS dst FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (SELECT src, min(dst) AS cluster_id FROM reach GROUP BY src),
k AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS split_key
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.src
),
b AS (SELECT doc_id, split_key, ({decode}) % 1000000 AS bucket FROM k)
SELECT doc_id, split_key, bucket,
       CASE WHEN bucket < 800000 THEN 'train'
            WHEN bucket < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of daily volume vs |daily change|
    per symbol — the volume-volatility association
    (`operators/metrics.py:spearman_corr`)."""
    d = q_daily_metrics(spark, sf_dir).where(
        F.col("daily_change").isNotNull()
    )
    return metrics.spearman_corr(
        d.select(
            "symbol",
            F.col("daily_volume").alias("xv"),
            F.abs(F.col("daily_change")).alias("yv"),
        ),
        group_col="symbol",
        x_col="xv",
        y_col="yv",
    )


_SPEARMAN_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
v AS (
  SELECT symbol AS grp, daily_volume AS xv, abs(daily_change) AS yv
  FROM d WHERE daily_change IS NOT NULL
),
r AS (
  SELECT grp,
         CAST(rank() OVER (PARTITION BY grp ORDER BY xv) AS DOUBLE)
         + CAST(count(*) OVER (PARTITION BY grp, xv) - 1 AS DOUBLE) / 2
           AS rx,
         CAST(rank() OVER (PARTITION BY grp ORDER BY yv) AS DOUBLE)
         + CAST(count(*) OVER (PARTITION BY grp, yv) - 1 AS DOUBLE) / 2
           AS ry
  FROM v
),
a AS (
  SELECT grp, count(*) AS n,
         CAST(sum(CAST(rx AS DECIMAL(28,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(ry AS DECIMAL(28,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(rx * rx AS DECIMAL(28,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(ry * ry AS DECIMAL(28,2))) AS DOUBLE) AS syy,
         CAST(sum(CAST(rx * ry AS DECIMAL(28,2))) AS DOUBLE) AS sxy
  FROM r GROUP BY grp
)
SELECT grp, n,
       round(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
                   AND CAST(n AS DOUBLE) * syy - sy * sy > 0
                  THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy))
             END, 6) AS spearman_rho
FROM a
"""


def q_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VPIN flow toxicity over tick-rule classified event ticks
    (20-tick buckets, trailing 5 — sized so the smallest test SF
    still emits rows) (`operators/indicators.py:vpin`)."""
    ev = _events(spark, sf_dir)
    return indicators.vpin(
        ev.select(
            F.col("event_type").alias("symbol"),
            "ts",
            F.col("value").alias("price"),
            F.col("event_id").alias("id"),
        ),
        bucket_ticks=20,
        n_buckets=5,
    )


_VPIN_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date, ts, event_id,
         value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn,
         CASE WHEN value > lag(value) OVER wd THEN 1
              WHEN value < lag(value) OVER wd THEN -1 END AS raw
  FROM events
  WINDOW wd AS (PARTITION BY event_type, CAST(ts AS DATE)
                ORDER BY ts, event_id)
),
s AS (
  SELECT symbol, (rn - 1) // 20 AS bucket,
         coalesce(last_value(raw IGNORE NULLS)
           OVER (PARTITION BY symbol, date ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
           AS sign
  FROM t
),
pb AS (
  SELECT symbol, CAST(bucket AS BIGINT) AS bucket,
         count(*) AS n_ticks,
         round(CAST(abs(sum(sign)) AS DOUBLE) / count(*), 6) AS imbalance
  FROM s GROUP BY symbol, bucket
),
roll AS (
  SELECT symbol, bucket, n_ticks, imbalance,
         round(CAST(sum(CAST(imbalance AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / count(*) OVER w, 6) AS vpin,
         row_number() OVER wn AS rn
  FROM pb
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY bucket)
)
SELECT symbol, bucket, n_ticks, imbalance, vpin
FROM roll WHERE rn >= 5
"""


# --------------------------------------------------------------------------
# Round-7 batch 11: Holt smoothing, feature hashing, class balancing
# --------------------------------------------------------------------------


def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level+trend, one-step
    forecast) (`operators/indicators.py:holt_linear`)."""
    return indicators.holt_linear(
        _daily_close(spark, sf_dir), alpha=0.3, beta=0.1, close_col="close"
    )


def _holt_cte(alpha: float = 0.3, beta: float = 0.1) -> str:
    """The Holt recursion as a reusable CTE chain ending in ``rec``;
    shared by the holt_linear and forecast_eval oracles."""
    # literals generated from the SAME Python floats the walk uses —
    # writing 0.7 in SQL parses to a double that can differ by one ulp
    # from Python's computed (1 - 0.3)
    one_m_a = 1 - alpha
    one_m_b = 1 - beta
    lvl = f"({alpha!r} * b.close + {one_m_a!r} * (r.level + r.trend))"
    return f"""d AS ({_DAILY_CLOSE_CTE}),
b AS (
  SELECT symbol, date, close,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
x1 AS (SELECT symbol, close AS first_close FROM b WHERE rn = 1),
rec AS (
  SELECT b.symbol, b.date, b.close, b.rn,
         b.close AS level,
         b.close - x1.first_close AS trend
  FROM b JOIN x1 ON b.symbol = x1.symbol WHERE b.rn = 2
  UNION ALL
  SELECT b.symbol, b.date, b.close, b.rn,
         {lvl},
         {beta!r} * ({lvl} - r.level) + {one_m_b!r} * r.trend
  FROM b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)"""


def _holt_oracle(alpha: float = 0.3, beta: float = 0.1) -> str:
    return f"""
WITH RECURSIVE {_holt_cte(alpha, beta)}
SELECT symbol, date, close,
       {_round_sql("level", 6)} AS level,
       {_round_sql("trend", 6)} AS trend,
       {_round_sql("level + trend", 6)} AS forecast
FROM rec
"""


def q_hashed_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words features, long form
    (`operators/text.py:hashed_bow`)."""
    return text.hashed_bow(_table("documents")(spark, sf_dir), n_features=256)


_HASHED_BOW_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
f AS (SELECT * FROM tk WHERE term <> ''),
h AS (
  SELECT doc_id,
         CAST(h0 % 256 AS INT) AS bucket,
         ((h0 // 256) % 2) * 2 - 1 AS sign
  FROM (
    SELECT doc_id,
           CAST('0x' || substr(md5('fh:' || term), 1, 8) AS BIGINT) AS h0
    FROM f
  ) t
)
SELECT doc_id, bucket,
       CAST(sum(sign) AS BIGINT) AS weight,
       count(*) AS n_tokens
FROM h GROUP BY doc_id, bucket
"""


def q_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic downsample of every language to the minority
    class size (`operators/sampling.py:balanced_downsample`)."""
    docs = _table("documents")(spark, sf_dir).select(
        "doc_id", "lang", "source"
    )
    return sampling.balanced_downsample(docs, label_col="lang", id_col="doc_id")


def _balanced_downsample_oracle() -> str:
    decode = " + ".join(
        f"(strpos('0123456789abcdef',"
        f" substr(md5(CAST(doc_id AS VARCHAR)), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
cap AS (SELECT min(n) AS cap FROM c),
r AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang
                            ORDER BY ({decode}) % 1000000, doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, source FROM r, cap WHERE rn <= cap.cap
"""


# --------------------------------------------------------------------------
# Round-7 batch 12: leakage-free feature matrix
# --------------------------------------------------------------------------


def q_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised training matrix: backward-only features + next-day
    return label per (symbol, day)
    (`operators/indicators.py:feature_matrix`)."""
    return indicators.feature_matrix(q_daily_metrics(spark, sf_dir), n=5)


_FEATURE_MATRIX_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date, daily_close AS close, daily_high AS high,
         daily_low AS low, CAST(daily_volume AS BIGINT) AS volume,
         round(CASE WHEN lag(daily_close) OVER wl <> 0
                    THEN daily_close / lag(daily_close) OVER wl - 1 END,
               6) AS ret_1d
  FROM d
  WINDOW wl AS (PARTITION BY symbol ORDER BY date)
),
f AS (
  SELECT symbol, date, close, ret_1d, volume,
         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / count(*) OVER w AS sma,
         max(high) OVER w AS hh, min(low) OVER w AS ll,
         CAST(sum(volume) OVER w AS DOUBLE) / count(*) OVER w AS vmean,
         count(ret_1d) OVER w AS n_rets,
         count(*) OVER w AS n_rows,
         CAST(sum(CAST(ret_1d AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(sum(CAST(ret_1d AS DECIMAL(19,6))
                  * CAST(ret_1d AS DECIMAL(19,6))) OVER w AS DOUBLE) AS sxx,
         lead(ret_1d) OVER wl AS label_next_ret
  FROM b
  WINDOW w AS (PARTITION BY symbol ORDER BY date
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wl AS (PARTITION BY symbol ORDER BY date)
)
SELECT symbol, date, close, ret_1d,
       round(CASE WHEN sma <> 0 THEN close / sma - 1 END, 6) AS sma_ratio,
       round(CASE WHEN hh <> ll THEN (close - ll) / (hh - ll) END, 6)
         AS channel_pos,
       round(CASE WHEN n_rows >= 2
                  THEN sqrt(greatest((sxx - sx * sx / n_rows)
                                     / (n_rows - 1), 0.0)) END, 6)
         AS ret_vol,
       round(CASE WHEN vmean <> 0 THEN volume / vmean END, 6)
         AS volume_ratio,
       label_next_ret
FROM f
WHERE n_rets >= 5 AND ret_1d IS NOT NULL AND label_next_ret IS NOT NULL
"""




__all__ = [
    "_FEATURE_MATRIX_ORACLE",
    "_HASHED_BOW_ORACLE",
    "_SPEARMAN_ORACLE",
    "_VPIN_ORACLE",
    "_balanced_downsample_oracle",
    "_cluster_split_oracle",
    "_holt_cte",
    "_holt_oracle",
    "q_balanced_downsample",
    "q_cluster_split",
    "q_feature_matrix",
    "q_hashed_bow",
    "q_holt_linear",
    "q_spearman",
    "q_vpin",
]
