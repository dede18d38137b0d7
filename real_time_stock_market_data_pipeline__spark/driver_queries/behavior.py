"""User-behavior analytics: funnels, cohorts, attribution, churn, graph rank.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.dedup import (  # noqa: F401
    _TOKS,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.drift import (  # noqa: F401
    _WEEKEND_SQL,
    _events_weekend_split,
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
# User-behavior analytics (operators.behavior)
# --------------------------------------------------------------------------


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return behavior.funnel_conversion(
        _events(spark, sf_dir), stages=["view", "click", "purchase"]
    )


_FUNNEL_ORACLE = """
WITH u1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
u2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM u1
),
u3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
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


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return behavior.cohort_retention(_events(spark, sf_dir))


_COHORT_ORACLE = """
WITH f AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
  FROM events
),
d AS (
  SELECT DISTINCT user_id, cohort_day,
         datediff('day', cohort_day, day) AS day_offset
  FROM f
)
SELECT cohort_day, day_offset, count(*) AS n_users
FROM d GROUP BY 1, 2
"""


def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return behavior.first_touch_attribution(
        _events(spark, sf_dir), conversion_type="purchase"
    )


_FIRST_TOUCH_ORACLE = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id) AS converted
  FROM events
)
SELECT event_type AS first_touch,
       count(*) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(CAST(sum(converted) AS BIGINT) AS DOUBLE) / count(*), 6)
         AS conversion_rate
FROM o WHERE rn = 1
GROUP BY 1
"""


def q_volume_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("symbol"), F.to_date("ts").alias("date")
        )
        .agg(F.count(F.lit(1)).alias("daily_volume"))
    )
    return behavior.rank_stats(
        daily, part_col="symbol", value_col="daily_volume", tiebreak_col="date"
    )


_VOLUME_RANK_ORACLE = """
WITH d AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date,
         count(*) AS daily_volume
  FROM events GROUP BY 1, 2
)
SELECT symbol, date, daily_volume,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume_dist,
       ntile(4) OVER w AS tile
FROM d
WINDOW w AS (PARTITION BY symbol ORDER BY daily_volume, date)
"""


# --------------------------------------------------------------------------
# Round-7 batch 2: graph rank, churn, bloom prefilter, melt, charset
# --------------------------------------------------------------------------


def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-transition graph, 5 unrolled power
    rounds (`operators/behavior.py:event_pagerank`); the oracle
    replays the IDENTICAL SQL text, so equivalence is by
    construction."""
    return behavior.event_pagerank(
        _events(spark, sf_dir), damping=0.85, n_iter=5
    )


def q_churn_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active/new/retained/churning user accounting
    (`operators/behavior.py:churn_by_period`)."""
    return behavior.churn_by_period(_events(spark, sf_dir), period="week")


_CHURN_ORACLE = """
WITH up AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS period_start
  FROM events
),
f AS (
  SELECT user_id, period_start,
         lag(period_start) OVER wu = period_start - INTERVAL 7 DAY
           AS was_prev,
         lead(period_start) OVER wu = period_start + INTERVAL 7 DAY
           AS active_next,
         min(period_start) OVER wu = period_start AS is_first
  FROM up
  WINDOW wu AS (PARTITION BY user_id ORDER BY period_start)
),
per AS (
  SELECT period_start,
         count(*) AS n_active,
         CAST(sum(CAST(is_first AS INT)) AS BIGINT) AS n_new,
         CAST(sum(CAST(coalesce(was_prev, FALSE) AS INT)) AS BIGINT)
           AS n_retained,
         CAST(sum(CAST(NOT coalesce(active_next, FALSE) AS INT)) AS BIGINT)
           AS n_churning_out
  FROM f GROUP BY period_start
)
SELECT period_start, n_active, n_new, n_retained, n_churning_out,
       round(CAST(n_churning_out AS DOUBLE) / n_active, 6) AS churn_rate
FROM per
WHERE period_start < (SELECT max(period_start) FROM per)
"""


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter: tag the event stream with
    membership of the high-value-purchaser key set, then audit the
    filter per event type — events kept by the bloom, true members,
    and false positives (`operators/sketches.py:bloom_build/
    bloom_probe`). The false-negative count is structurally zero (a
    Bloom filter never drops a member) and the tests pin that."""
    ev = _events(spark, sf_dir)
    keys = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    words = sketches.bloom_build(keys, "user_id", m_bits=1024, k_hashes=3)
    probed = sketches.bloom_probe(
        ev, words, "user_id", m_bits=1024, k_hashes=3
    )
    out = probed.join(
        F.broadcast(keys.withColumn("is_member", F.lit(1))), "user_id", "left"
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("bloom_pass").cast("int")).alias("n_bloom_pass"),
        F.sum(F.coalesce(F.col("is_member"), F.lit(0))).alias("n_member"),
        F.sum(
            (F.col("bloom_pass") & F.col("is_member").isNull()).cast("int")
        ).alias("n_false_pos"),
    )


_BLOOM_POS = (
    "(CAST('0x' || substr(md5('bf' || {i} || ':' "
    "|| CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 1024)"
)

_BLOOM_ORACLE = f"""
WITH keys AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND value > 150
),
pos AS (
  SELECT ({_BLOOM_POS.format(i="g.i")}) AS pos
  FROM keys CROSS JOIN (SELECT unnest(range(3)) AS i) g
),
words AS (
  SELECT CAST(pos // 32 AS INT) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
  FROM pos GROUP BY 1
),
probe AS (
  SELECT event_type, user_id,
         {_BLOOM_POS.format(i="0")} AS p0,
         {_BLOOM_POS.format(i="1")} AS p1,
         {_BLOOM_POS.format(i="2")} AS p2
  FROM events
),
checked AS (
  SELECT p.event_type, p.user_id,
         ((coalesce(w0.word, 0) >> CAST(p.p0 % 32 AS INT)) & 1 = 1)
         AND ((coalesce(w1.word, 0) >> CAST(p.p1 % 32 AS INT)) & 1 = 1)
         AND ((coalesce(w2.word, 0) >> CAST(p.p2 % 32 AS INT)) & 1 = 1)
           AS bloom_pass,
         k.user_id IS NOT NULL AS is_member
  FROM probe p
  LEFT JOIN words w0 ON w0.word_idx = CAST(p.p0 // 32 AS INT)
  LEFT JOIN words w1 ON w1.word_idx = CAST(p.p1 // 32 AS INT)
  LEFT JOIN words w2 ON w2.word_idx = CAST(p.p2 // 32 AS INT)
  LEFT JOIN keys k ON p.user_id = k.user_id
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(bloom_pass AS INT)) AS BIGINT) AS n_bloom_pass,
       CAST(sum(CAST(is_member AS INT)) AS BIGINT) AS n_member,
       CAST(sum(CAST(bloom_pass AND NOT is_member AS INT)) AS BIGINT)
         AS n_false_pos
FROM checked GROUP BY event_type
"""


def q_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide OHLC frame melted to (symbol, date, metric, price) long
    form via the native Expand node
    (`operators/relational.py:unpivot_long`)."""
    return relational.unpivot_long(
        q_daily_metrics(spark, sf_dir),
        ["symbol", "date"],
        ["daily_open", "daily_high", "daily_low", "daily_close"],
        "metric",
        "price",
    )


_UNPIVOT_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE})
SELECT symbol, date, 'daily_open' AS metric, daily_open AS price FROM d
UNION ALL
SELECT symbol, date, 'daily_high', daily_high FROM d
UNION ALL
SELECT symbol, date, 'daily_low', daily_low FROM d
UNION ALL
SELECT symbol, date, 'daily_close', daily_close FROM d
"""


def q_charset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition + mojibake screen over documents
    (`operators/text.py:charset_stats`)."""
    return text.charset_stats(_table("documents")(spark, sf_dir))


_CHARSET_ORACLE = r"""
WITH c AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           AS n_letter,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
           AS n_digit,
         length(text) - length(regexp_replace(text, '[ \t\r\n]', '', 'g'))
           AS n_space,
         length(text) - length(regexp_replace(text,
           '[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]', '', 'g'))
           AS n_ascii_other
  FROM documents
),
r AS (
  SELECT doc_id, n_chars, n_letter, n_digit, n_space, n_ascii_other,
         n_chars - n_letter - n_digit - n_space - n_ascii_other
           AS n_non_ascii,
         round(CASE WHEN n_chars > 0
                    THEN CAST(n_letter AS DOUBLE) / n_chars
                    ELSE 0.0 END, 6) AS letter_ratio,
         round(CASE WHEN n_chars > 0
                    THEN CAST(n_digit AS DOUBLE) / n_chars
                    ELSE 0.0 END, 6) AS digit_ratio,
         round(CASE WHEN n_chars > 0
                    THEN CAST(n_space AS DOUBLE) / n_chars
                    ELSE 0.0 END, 6) AS space_ratio,
         round(CASE WHEN n_chars > 0
                    THEN CAST(n_chars - n_letter - n_digit - n_space
                              - n_ascii_other AS DOUBLE) / n_chars
                    ELSE 0.0 END, 6) AS non_ascii_ratio
  FROM c
)
SELECT doc_id, n_chars, n_letter, n_digit, n_space, n_ascii_other,
       n_non_ascii, letter_ratio, digit_ratio, space_ratio,
       non_ascii_ratio,
       CAST(n_chars > 0
            AND (letter_ratio + space_ratio < 0.7
                 OR non_ascii_ratio > 0.2) AS INT) AS suspect_charset
FROM r
"""


# --------------------------------------------------------------------------
# Round-7 batch 7: KAMA recursion, session funnel, Mann-Whitney U
# --------------------------------------------------------------------------


def q_kama(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaufman Adaptive Moving Average (applyInPandas recursion over
    declaratively-computed efficiency ratios)
    (`operators/indicators.py:kama`)."""
    return indicators.kama(
        _daily_close(spark, sf_dir), n=10, fast=2, slow=30, close_col="close"
    )


def _kama_oracle(n: int = 10, fast: int = 2, slow: int = 30) -> str:
    a_f = 2.0 / (fast + 1)
    a_s = 2.0 / (slow + 1)
    spread = a_f - a_s
    sc = (
        f"(CASE WHEN e.er IS NULL THEN 0.0"
        f" ELSE (e.er * {spread!r} + {a_s!r})"
        f" * (e.er * {spread!r} + {a_s!r}) END)"
    )
    return f"""
WITH RECURSIVE d AS ({_DAILY_CLOSE_CTE}),
dd AS (
  SELECT symbol, date, close,
         round(close - lag(close) OVER wp, 6) AS dch
  FROM d
  WINDOW wp AS (PARTITION BY symbol ORDER BY date)
),
f AS (SELECT * FROM dd WHERE dch IS NOT NULL),
s AS (
  SELECT symbol, date, close,
         CAST(sum(CAST(dch AS DECIMAL(18,6))) OVER kw AS DOUBLE) AS net,
         CAST(sum(CAST(abs(dch) AS DECIMAL(18,6))) OVER kw AS DOUBLE) AS vol,
         row_number() OVER kwn AS rn
  FROM f
  WINDOW kw AS (PARTITION BY symbol ORDER BY date
                ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW),
         kwn AS (PARTITION BY symbol ORDER BY date)
),
e AS (
  SELECT symbol, date, close,
         round(CASE WHEN vol <> 0 THEN abs(net) / vol END, 6) AS er,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS krn
  FROM s WHERE rn >= {n}
),
rec AS (
  SELECT symbol, date, close, er, krn, close AS kama
  FROM e WHERE krn = 1
  UNION ALL
  SELECT e.symbol, e.date, e.close, e.er, e.krn,
         r.kama + {sc} * (e.close - r.kama)
  FROM e JOIN rec r ON e.symbol = r.symbol AND e.krn = r.krn + 1
)
SELECT symbol, date, close, er, {_round_sql("kama", 6)} AS kama FROM rec
"""


def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped view→click→purchase funnel (30-min gap
    sessions) (`operators/behavior.py:session_funnel`)."""
    return behavior.session_funnel(
        _events(spark, sf_dir),
        stages=["view", "click", "purchase"],
        gap_seconds=1800,
    )


_SESSION_FUNNEL_ORACLE = """
WITH s0 AS (
  SELECT user_id, event_type AS etype, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s1 AS (
  SELECT user_id, etype, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM s0
),
u1 AS (
  SELECT *, min(CASE WHEN etype = 'view' THEN ts END) OVER ws AS t1
  FROM s1 WINDOW ws AS (PARTITION BY user_id, session_id)
),
u2 AS (
  SELECT *, min(CASE WHEN etype = 'click' AND ts >= t1 THEN ts END)
              OVER ws AS t2
  FROM u1 WINDOW ws AS (PARTITION BY user_id, session_id)
),
u3 AS (
  SELECT *, min(CASE WHEN etype = 'purchase' AND ts >= t2 THEN ts END)
              OVER ws AS t3
  FROM u2 WINDOW ws AS (PARTITION BY user_id, session_id)
),
d AS (SELECT DISTINCT user_id, session_id, t1, t2, t3 FROM u3)
SELECT count(*) AS n_sessions,
       count(t1) AS n_view_sessions,
       count(t2) AS n_click_sessions,
       count(t3) AS n_purchase_sessions,
       round(CASE WHEN count(t1) > 0
                  THEN CAST(count(t2) AS DOUBLE) / count(t1) END, 6)
         AS rate_view_to_click,
       round(CASE WHEN count(t2) > 0
                  THEN CAST(count(t3) AS DOUBLE) / count(t2) END, 6)
         AS rate_click_to_purchase
FROM d
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum drift statistics per event type,
    weekday vs weekend (`operators/metrics.py:mann_whitney_u`)."""
    return metrics.mann_whitney_u(
        _events_weekend_split(spark, sf_dir),
        group_col="event_type",
        side_col="is_weekend",
        value_col="value",
    )


_MANN_WHITNEY_ORACLE = f"""
WITH v AS (
  SELECT event_type AS grp, value AS val, {_WEEKEND_SQL} AS is_b
  FROM events
),
r AS (
  SELECT grp, is_b,
         CAST(rank() OVER (PARTITION BY grp ORDER BY val) AS DOUBLE)
         + CAST(count(*) OVER (PARTITION BY grp, val) - 1 AS DOUBLE) / 2
           AS avg_rank
  FROM v
),
a AS (
  SELECT grp,
         CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CAST(CASE WHEN is_b = 1 THEN avg_rank ELSE 0.0 END
                       AS DECIMAL(28,1))) AS DOUBLE) AS r_b
  FROM r GROUP BY grp
)
SELECT grp, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN r_b END AS rank_sum_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN CAST(n_a * n_b AS DOUBLE)
                 - (r_b - CAST(n_b * (n_b + 1) AS DOUBLE) / 2) END AS u_a,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN r_b - CAST(n_b * (n_b + 1) AS DOUBLE) / 2 END AS u_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN least(
              CAST(n_a * n_b AS DOUBLE)
              - (r_b - CAST(n_b * (n_b + 1) AS DOUBLE) / 2),
              r_b - CAST(n_b * (n_b + 1) AS DOUBLE) / 2) END AS u_stat
FROM a
"""


# --------------------------------------------------------------------------
# Round-7 batch 17: Markov absorption, embedding dispersion
# --------------------------------------------------------------------------


def q_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step purchase-absorption probability per event type
    (`operators/behavior.py:absorption_prob`)."""
    return behavior.absorption_prob(
        _events(spark, sf_dir), target="purchase", k=4
    )


def _markov_absorption_oracle(target: str = "purchase", k: int = 4) -> str:
    q12 = "floor(({x}) * 1e12 + 0.5) / 1e12"
    parts = [
        f"""
e0 AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
ec AS (SELECT src, dst, count(*) AS n FROM e0 WHERE dst IS NOT NULL
       GROUP BY src, dst),
edges AS (
  SELECT src, dst, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
  FROM ec
),
nodes AS (
  SELECT node FROM (
    SELECT DISTINCT src AS node FROM ec
    UNION SELECT DISTINCT dst AS node FROM ec
  ) u GROUP BY node
),
p0 AS (
  SELECT node, CASE WHEN node = '{target}' THEN 1.0 ELSE 0.0 END AS p_abs
  FROM nodes
)"""
    ]
    for t in range(1, k + 1):
        prev = f"p{t - 1}"
        parts.append(
            f""",
p{t} AS (
  SELECT n.node,
         CASE WHEN n.node = '{target}' THEN 1.0
              ELSE {q12.format(x="coalesce(s.step, 0.0)")} END AS p_abs
  FROM nodes n LEFT JOIN (
    SELECT e.src,
           CAST(sum(CAST({q12.format(x="e.p * pp.p_abs")}
                         AS DECIMAL(28,12))) AS DOUBLE) AS step
    FROM edges e JOIN {prev} pp ON e.dst = pp.node
    GROUP BY e.src
  ) s ON n.node = s.src
)"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"\nSELECT node, round(p_abs, 6) AS absorb_prob FROM p{k}"
    )


def q_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label centroid-cosine dispersion report
    (`operators/similarity.py:embedding_dispersion`)."""
    ensure_engine_conf(spark)
    return similarity.embedding_dispersion(
        load_table(spark, sf_dir, "embeddings")
    )


_EMBEDDING_DISPERSION_ORACLE = """
WITH c AS (
  SELECT label AS lbl, i AS dim,
         floor((CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                              AS DECIMAL(18,6))) AS DOUBLE) / count(*))
               * 1e6 + 0.5) / 1e6 AS cv
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  GROUP BY label, i
),
cn AS (
  SELECT lbl,
         CAST(sum(CAST(floor(cv * cv * 1e12 + 0.5) / 1e12
                       AS DECIMAL(28,12))) AS DOUBLE) AS cn2
  FROM c GROUP BY lbl
),
x AS (
  SELECT vec_id AS vid, label AS lbl, t.i AS dim,
         floor(CAST(embedding[t.i] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS x6
  FROM embeddings, unnest(range(1, 65)) AS t(i)
),
pm AS (
  SELECT x.vid, x.lbl,
         CAST(sum(CAST(floor(x.x6 * c.cv * 1e12 + 0.5) / 1e12
                       AS DECIMAL(28,12))) AS DOUBLE) AS dot,
         CAST(sum(CAST(floor(x.x6 * x.x6 * 1e12 + 0.5) / 1e12
                       AS DECIMAL(28,12))) AS DOUBLE) AS xn2
  FROM x JOIN c ON x.lbl = c.lbl AND x.dim = c.dim
  GROUP BY x.vid, x.lbl
),
cs AS (
  SELECT pm.lbl,
         floor((CASE WHEN xn2 > 0 AND cn2 > 0
                     THEN dot / (sqrt(xn2) * sqrt(cn2)) END)
               * 1e6 + 0.5) / 1e6 AS cos_c
  FROM pm JOIN cn ON pm.lbl = cn.lbl
)
SELECT lbl AS label, count(*) AS n_members,
       round(CAST(sum(CAST(cos_c AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_cos,
       min(cos_c) AS min_cos,
       round(1 - CAST(sum(CAST(cos_c AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS dispersion
FROM cs GROUP BY lbl
"""


# --------------------------------------------------------------------------
# Round-7 batch 19: linear attribution, length-band document gate
# --------------------------------------------------------------------------


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch conversion credit per event type
    (`operators/behavior.py:linear_attribution`)."""
    return behavior.linear_attribution(_events(spark, sf_dir))


_LINEAR_ATTRIBUTION_ORACLE = """
WITH f AS (
  SELECT user_id, event_type AS etype, ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id) AS conv_ts
  FROM events
),
t AS (
  SELECT user_id, etype FROM f
  WHERE conv_ts IS NOT NULL AND ts <= conv_ts
),
c AS (
  SELECT user_id, etype,
         CAST(round(1.0 / count(*) OVER (PARTITION BY user_id), 8)
              AS DECIMAL(18,8)) AS credit
  FROM t
)
SELECT etype AS touch_type, count(*) AS n_touches,
       round(CAST(sum(credit) AS DOUBLE), 6) AS credit_total
FROM c GROUP BY etype
"""


def q_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language p5..p95 word-count band gate
    (`operators/text.py:length_band_filter`)."""
    return text.length_band_filter(_table("documents")(spark, sf_dir))


_LENGTH_BAND_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang AS grp, len({_TOKS}) AS n_words FROM documents
),
r AS (
  SELECT doc_id, grp, n_words,
         row_number() OVER (PARTITION BY grp
                            ORDER BY n_words, doc_id) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM t
),
b AS (
  SELECT grp,
         max(CASE WHEN rn = greatest((n * 1 + 19) // 20, 1)
                  THEN n_words END) AS lo_band,
         max(CASE WHEN rn = (n * 19 + 19) // 20 THEN n_words END)
           AS hi_band
  FROM r GROUP BY grp
)
SELECT r.doc_id, r.grp AS lang, r.n_words, b.lo_band, b.hi_band
FROM r JOIN b ON r.grp = b.grp
WHERE r.n_words >= b.lo_band AND r.n_words <= b.hi_band
"""


# --------------------------------------------------------------------------
# Round-7 batch 20: last-touch attribution
# --------------------------------------------------------------------------


def q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution per event type
    (`operators/behavior.py:last_touch_attribution`)."""
    return behavior.last_touch_attribution(_events(spark, sf_dir))


_LAST_TOUCH_ORACLE = """
WITH f AS (
  SELECT user_id, event_type AS etype, ts, event_id AS eid,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id) AS conv_ts
  FROM events
),
fc AS (SELECT * FROM f WHERE conv_ts IS NOT NULL),
pre AS (
  SELECT user_id, etype,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, eid DESC) AS rn
  FROM fc WHERE ts < conv_ts
),
lastpre AS (SELECT user_id, etype AS touch_type FROM pre WHERE rn = 1),
allconv AS (SELECT DISTINCT user_id FROM fc),
direct AS (
  SELECT a.user_id, 'purchase' AS touch_type
  FROM allconv a LEFT JOIN lastpre l ON a.user_id = l.user_id
  WHERE l.user_id IS NULL
),
cr AS (SELECT * FROM lastpre UNION ALL SELECT * FROM direct),
pt AS (SELECT touch_type, count(*) AS n_conversions FROM cr GROUP BY 1)
SELECT touch_type, n_conversions,
       round(CAST(n_conversions AS DOUBLE)
             / sum(n_conversions) OVER (), 6) AS share
FROM pt
"""




__all__ = [
    "_BLOOM_ORACLE",
    "_BLOOM_POS",
    "_CHARSET_ORACLE",
    "_CHURN_ORACLE",
    "_COHORT_ORACLE",
    "_EMBEDDING_DISPERSION_ORACLE",
    "_FIRST_TOUCH_ORACLE",
    "_FUNNEL_ORACLE",
    "_LAST_TOUCH_ORACLE",
    "_LENGTH_BAND_ORACLE",
    "_LINEAR_ATTRIBUTION_ORACLE",
    "_MANN_WHITNEY_ORACLE",
    "_SESSION_FUNNEL_ORACLE",
    "_UNPIVOT_ORACLE",
    "_VOLUME_RANK_ORACLE",
    "_kama_oracle",
    "_markov_absorption_oracle",
    "q_bloom_prefilter",
    "q_charset_stats",
    "q_churn_weekly",
    "q_cohort_retention",
    "q_embedding_dispersion",
    "q_event_pagerank",
    "q_first_touch",
    "q_funnel_conversion",
    "q_kama",
    "q_last_touch",
    "q_length_band",
    "q_linear_attribution",
    "q_mann_whitney",
    "q_markov_absorption",
    "q_session_funnel",
    "q_unpivot_daily",
    "q_volume_rank",
]
