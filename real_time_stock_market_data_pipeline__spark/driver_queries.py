"""Driver-facing query registry: every operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus an equivalent ANSI-SQL
oracle string replayable by DuckDB on the same parquet tables.

This module is the correctness contract (`__spark_entry__.py` re-exports
it). Design rules that make the oracle comparison exact rather than
approximate:

- **Column names match by construction** — every computed column is
  aliased identically in the Spark plan and the SQL text.
- **Float aggregates are decimal-exact**: sums/averages go through a
  DECIMAL view and back to DOUBLE (see `operators.metrics._exact_avg`),
  so both engines produce bit-identical doubles regardless of
  partitioning or evaluation order.
- **All hashes are engine-portable** (md5/sha256 of explicit strings).
- **Timestamps are UTC end-to-end**: `session.ensure_engine_conf` pins
  the Spark session; DuckDB's naive timestamps line up with Spark's
  micros-since-epoch rendered in UTC.

Reference parity notes (`/root/reference`): the events table plays the
tick stream (symbol := event_type, price := value), lineitem plays the
OHLCV table with a true volume column (l_quantity) — mirroring
`src/spark/jobs/spark_batch_processor.py:81-101` and
`src/spark/jobs/spark_stream_processor.py:154-231`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.functions import cleaning
from real_time_stock_market_data_pipeline__spark.operators import (
    behavior,
    dedup,
    indicators,
    metrics,
    ohlcv,
    relational,
    sampling,
    similarity,
    sketches,
    temporal,
    text,
)
from real_time_stock_market_data_pipeline__spark.session import ensure_engine_conf
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# --------------------------------------------------------------------------
# SQL fragments shared by several oracles
# --------------------------------------------------------------------------

#: normalized text (operators.dedup.normalized_text) in DuckDB SQL
_NORM = r"regexp_replace(lower(trim({col})), '\s+', ' ', 'g')"

#: exact average: decimal-sum / count, identical to metrics._exact_avg
_EXAVG = "CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) / count(*)"

#: exact sample stddev, identical to metrics._exact_stddev_samp
_EXSTD = (
    "CASE WHEN count(*) >= 2 THEN sqrt(greatest(("
    "CAST(sum(CAST({col} AS DECIMAL(18,6)) * CAST({col} AS DECIMAL(18,6))) AS DOUBLE)"
    " - CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DOUBLE)"
    " * CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) / count(*)"
    ") / (count(*) - 1), 0.0)) END"
)


#: _EXSTD with DECIMAL(19,6) squares: forces DuckDB into INT128
#: multiplication for columns whose values reach ~1e4 (squares ~1e9
#: overflow the DECIMAL(18) int64 path) — e.g. simple returns of
#: wide-ranging synthetic prices.
_EXSTD_WIDE = _EXSTD.replace(
    "CAST({col} AS DECIMAL(18,6)) * CAST({col} AS DECIMAL(18,6))",
    "CAST({col} AS DECIMAL(19,6)) * CAST({col} AS DECIMAL(19,6))",
)


def _round_sql(expr: str, n: int) -> str:
    """Spark-faithful ``round(double, n)`` for DuckDB. Spark rounds the
    double's SHORTEST decimal repr (``BigDecimal.valueOf``) HALF_UP;
    DuckDB's ``round`` works on the exact binary value — they disagree
    exactly when the repr ends in a literal 5 at the cut digit (e.g.
    17.02125 → Spark 17.0213, plain DuckDB round 17.0212; hit at
    sf0.1). Routing through VARCHAR reproduces the repr, and DECIMAL
    rounding is then HALF_UP on those digits — matching Spark on every
    probed tie and non-tie case. DECIMAL(35,17): a double repr has at
    most 17 significant digits, so 17 fractional digits hold any repr
    below 1e18 exactly — a narrower scale double-rounds reprs like
    3.8522499999999997 (16 frac digits) UP where Spark's single-step
    rounding goes down (found by mad_anomalies at sf0.1; DuckDB's
    plain double round() also flips there, via an FP tie in its
    x·10^n scaling).

    KNOWN RESIDUAL RISK (found by pca_pc1 at sf0.001): Java 17's
    Double.toString is NOT always the shortest round-trip repr —
    it rendered -0.005096499999999999**5** where DuckDB's Ryū prints
    -0.0050965, and the two strings round to different 6-dp values.
    No VARCHAR-based replay can bridge that. For operators where the
    boundary is statistically likely (iterative quantization, dense
    lattices), prefer the pure-IEEE quantizer
    ``floor(x·10^k + 0.5)/10^k`` on BOTH sides instead of
    F.round/_round_sql — floor/mul/add are bit-defined, engine-
    independent ops (see `similarity.pca_power_iteration`)."""
    return (
        f"CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(35,17)), {n})"
        " AS DOUBLE)"
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    return load_table(spark, sf_dir, "events")


def _table(name: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_engine_conf(spark)
        return load_table(spark, sf_dir, name)

    fn.__name__ = f"load_{name}"
    return fn


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

# --------------------------------------------------------------------------
# Dedup family
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(_table("documents")(spark, sf_dir))


_DEDUP_EXACT_ORACLE = f"""
SELECT sha256({_NORM.format(col="text")}) AS text_hash,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM documents GROUP BY 1
"""


def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_keep_last(
        _events(spark, sf_dir),
        keys=["user_id", "event_type"],
        order_by=["ts", "event_id"],
    )


_KEEP_LAST_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
"""

#: k=3 word shingles of normalized text, DuckDB list lambdas
_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(toks) - 2, 0) + 1), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))"
)

_TOKS = f"string_split({_NORM.format(col='text')}, ' ')"


def _minhash_cte() -> str:
    # 32-bit base hash: first 8 hex chars of md5, decoded with nibble
    # arithmetic (DuckDB has no hex→int conv)
    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(s), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    sig_entries = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {dedup.MINHASH_P}))"
        for a, b in zip(dedup.MINHASH_A, dedup.MINHASH_B)
    )
    return f"""
sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
),
nonempty AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
hs AS (SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM nonempty),
sig AS (SELECT doc_id, [{sig_entries}] AS sig FROM hs),
bands AS (
  SELECT doc_id, b.band_idx,
         md5(CAST(sig[b.band_idx * 2 + 1] AS VARCHAR) || '|' || CAST(sig[b.band_idx * 2 + 2] AS VARCHAR)) AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(range({dedup.MINHASH_PERMS // dedup.MINHASH_BAND_ROWS})) AS band_idx) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM bands a JOIN bands b2 USING (band_idx, band_hash)
  WHERE a.doc_id < b2.doc_id
)"""


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_minhash_pairs(_table("documents")(spark, sf_dir))


_MINHASH_ORACLE = f"WITH {_minhash_cte()} SELECT id_a, id_b FROM cand"


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screen: a perturbed new batch (every 5th
    doc, 'v2 '-prefixed, ids shifted by 10⁶) against the existing
    corpus — per (new, corpus) candidate with its band-collision
    strength (`operators/dedup.py:incremental_neardup`)."""
    docs = _table("documents")(spark, sf_dir)
    new_batch = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
    )
    return dedup.incremental_neardup(new_batch, docs)


def _incremental_neardup_oracle() -> str:
    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(s), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    sig_entries = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {dedup.MINHASH_P}))"
        for a, b in zip(dedup.MINHASH_A, dedup.MINHASH_B)
    )
    n_bands = dedup.MINHASH_PERMS // dedup.MINHASH_BAND_ROWS

    def bands_for(src: str, name: str) -> str:
        return f"""
{name}_sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM {src}) t
),
{name}_ne AS (SELECT doc_id, sh FROM {name}_sh WHERE len(sh) > 0),
{name}_hs AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM {name}_ne
),
{name}_sig AS (SELECT doc_id, [{sig_entries}] AS sig FROM {name}_hs),
{name}_bands AS (
  SELECT doc_id, b.band_idx,
         md5(CAST(sig[b.band_idx * 2 + 1] AS VARCHAR) || '|'
             || CAST(sig[b.band_idx * 2 + 2] AS VARCHAR)) AS band_hash
  FROM {name}_sig CROSS JOIN
       (SELECT unnest(range({n_bands})) AS band_idx) b
)"""

    return f"""
WITH newb AS (
  SELECT doc_id + 1000000 AS doc_id, 'v2 ' || text AS text
  FROM documents WHERE doc_id % 5 = 0
),
{bands_for('newb', 'n')},
{bands_for('documents', 'c')}
SELECT n_bands.doc_id AS new_id, c_bands.doc_id AS corpus_id,
       count(*) AS shared_bands
FROM n_bands JOIN c_bands USING (band_idx, band_hash)
GROUP BY 1, 2
"""


def q_incremental_neardup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same incremental screen through the AT-REST dedup index:
    corpus band signatures written to parquet once, the new batch
    joined against the stored table (`operators/dedup.py:
    write_dedup_index` / `incremental_neardup_indexed`). Same oracle
    as the live path — the identical-result contract of the index."""
    import tempfile

    docs = _table("documents")(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="dedup_idx_") + "/bands"
    dedup.write_dedup_index(docs, idx)
    new_batch = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
    )
    return dedup.incremental_neardup_indexed(new_batch, idx)


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH pair graph via iterative
    min-label propagation (Pregel-style, localCheckpoint-truncated);
    oracle = recursive-CTE transitive closure of the same edges."""
    return dedup.neardup_clusters(_table("documents")(spark, sf_dir))


_NEARDUP_CLUSTERS_ORACLE = f"""
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
comp AS (SELECT src, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       coalesce(c.cluster_id, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.src
"""


def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-canonical dedup decision applied to the corpus: one
    document per near-dup cluster plus singletons, payload columns
    intact (text dropped here only to keep the driver hash light)."""
    return dedup.dedup_corpus(_table("documents")(spark, sf_dir)).select(
        "doc_id", "source", "lang", "n_chars"
    )


_DEDUP_CORPUS_ORACLE = f"""
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
comp AS (SELECT src, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d LEFT JOIN comp c ON d.doc_id = c.src
WHERE coalesce(c.cluster_id, d.doc_id) = d.doc_id
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _table("documents")(spark, sf_dir), threshold=0.5
    )


_JACCARD_ORACLE = f"""
WITH {_minhash_cte()},
scored AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(list_distinct(list_concat(sa.sh, sb.sh))) AS uni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
       round(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 4) AS jaccard
FROM scored
WHERE round(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 4) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_table("documents")(spark, sf_dir))


def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pair extraction via 4-block banding (exact recall for
    Hamming ≤ 3 by pigeonhole) — the engine joins 16-bit block buckets;
    the oracle can afford the plain all-pairs Hamming join because the
    two are provably the same set."""
    return dedup.simhash_neardup_pairs(_table("documents")(spark, sf_dir))


def _simhash_neardup_oracle() -> str:
    ham = " + ".join(
        "bit_count(xor(CAST(strpos('0123456789abcdef', substr(a.simhash, {i}, 1)) - 1 AS BIGINT),"
        " CAST(strpos('0123456789abcdef', substr(b.simhash, {i}, 1)) - 1 AS BIGINT)))".format(
            i=i + 1
        )
        for i in range(16)
    )
    return f"""
WITH s AS ({_simhash_oracle()})
SELECT id_a, id_b, hamming FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(({ham}) AS INTEGER) AS hamming
  FROM s a JOIN s b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""


def _simhash_oracle() -> str:
    """Mirror of operators.dedup.simhash, generated with the same
    nibble/bit loops."""
    votes = ", ".join(
        "sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {p1}, 1)) - 1)"
        " // {w}) % 2 = 1 THEN 1 ELSE -1 END) AS v{p}_{b}".format(
            p1=p + 1, w=2 ** (3 - b), p=p, b=b
        )
        for p in range(16)
        for b in range(4)
    )
    out_nibbles = ", ".join(
        " + ".join(
            f"(CASE WHEN v{p}_{b} > 0 THEN {2 ** (3 - b)} ELSE 0 END)"
            for b in range(4)
        )
        + f" AS o{p}"
        for p in range(16)
    )
    chars = " || ".join(
        f"substr('0123456789abcdef', o{p} + 1, 1)" for p in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
nib AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
votes AS (SELECT doc_id, {votes} FROM nib GROUP BY doc_id),
outn AS (SELECT doc_id, {out_nibbles} FROM votes)
SELECT doc_id, {chars} AS simhash FROM outn
"""


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


_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
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
# Similarity search over embeddings
# --------------------------------------------------------------------------


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """The query point: embedding of vec_id=0 (a plan literal — at
    scale this is a parameter, never a join)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


# The oracles are static SQL, so they pull the same query vector via a
# scalar cross join on vec_id=0 ("qe") instead of inlined literals.
_DIM = similarity.EMBEDDING_DIM

_Q_SUB = "(SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q"

# Left-associative double addition chains — SQL `+` parses
# left-associative, so ((t1+t2)+t3)+… matches the engine's fold
# bit-for-bit (see similarity._fold_sum). No decimals: DuckDB's
# double→decimal cast rounds through double arithmetic and drifts.
_DOT_QE = " + ".join(
    f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(qe[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)
_SQ_EMB = " + ".join(
    f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)
_SQ_QE = " + ".join(
    f"CAST(qe[{i + 1}] AS DOUBLE) * CAST(qe[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)

_COSINE_QE = (
    f"CASE WHEN sqrt({_SQ_EMB}) > 0 THEN "
    f"({_DOT_QE}) / (sqrt({_SQ_EMB}) * sqrt({_SQ_QE})) END"
)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.cosine_topk(load_table(spark, sf_dir, "embeddings"), q, k=10)


_COSINE_TOPK_ORACLE = f"""
SELECT vec_id, {_COSINE_QE} AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
ORDER BY cosine DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.ann_topk(load_table(spark, sf_dir, "embeddings"), q, k=10)


def _plane_dot_sql(vec: str, plane: list[float]) -> str:
    return " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE) * ({plane[i]!r})"
        for i in range(len(plane))
    )


def _ann_topk_oracle() -> str:
    emb_bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql('embedding', p)} >= 0 THEN '1' ELSE '0' END)"
        for p in similarity.ANN_PLANES
    )
    qe_bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql('qe', p)} >= 0 THEN '1' ELSE '0' END)"
        for p in similarity.ANN_PLANES
    )
    return f"""
SELECT vec_id, {_COSINE_QE} AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
WHERE ({emb_bits}) = ({qe_bits})
ORDER BY cosine DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    return similarity.embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


def _embedding_neardup_oracle() -> str:
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
WITH bkt AS (SELECT vec_id, embedding, ({bits}) AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ({cos}) >= 0.3
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.ivf_topk(load_table(spark, sf_dir, "embeddings"), q, k=10)


def _coldot_sql(a: str, b: str) -> str:
    """Left-associative column·column dot chain (same fold order as
    similarity._dot_fold, so the doubles agree bitwise)."""
    return " + ".join(
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )


def _ivf_topk_oracle() -> str:
    """IVF in plain SQL: centroids = lowest-id vectors, assignment =
    row_number over (sim DESC, cell ASC) — the same argmax-with-lowest-
    id-tiebreak the engine's array_max-over-(s, -i) computes. sim is
    dot·(1/|c|): the row's own norm is a common factor, so it drops out
    of the argmax, exactly as in similarity.ivf_assign."""
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
probes AS (
  SELECT c.cell,
         ROW_NUMBER() OVER (ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
  FROM centn c CROSS JOIN {_Q_SUB}
)
SELECT vec_id, {_COSINE_QE} AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
WHERE vec_id IN (SELECT a.vec_id FROM assign a
                 WHERE a.rn = 1
                   AND a.cell IN (SELECT p.cell FROM probes p WHERE p.rn <= {n_p}))
ORDER BY cosine DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index materialized as a parquet cell-partition layout, then
    probed with partition pruning (PartitionFilters plan-asserted in
    tests) — result identical to ``ivf_topk``, so it shares that
    oracle. The write-then-read happens inside the query, like
    ``partitioned_scan``."""
    import tempfile

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    cents = similarity.ivf_write_index(embs, path)
    return similarity.ivf_topk_indexed(
        spark, path, _query_vector(spark, sf_dir), cents, k=10
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN: top-3 corpus neighbors for each of the 4 lowest-id
    query vectors via the IVF cell equi-join (never a cartesian). The
    oracle replays cell assignment, per-query probe ranking, the cell
    join, and the per-query row_number top-k in SQL."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 4)
    return similarity.ivf_knn_join(embs, queries, k=3)


def _knn_join_oracle() -> str:
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    dot_eq = _coldot_sql("e.embedding", "p.qe")
    ne = _coldot_sql("e.embedding", "e.embedding")
    nq = _coldot_sql("p.qe", "p.qe")
    cos = (
        f"CASE WHEN sqrt({ne}) > 0 AND sqrt({nq}) > 0 "
        f"THEN ({dot_eq}) / (sqrt({ne}) * sqrt({nq})) END"
    )
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
corpus AS (SELECT vec_id, embedding, cell FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
qp AS (
  SELECT query_id, qe, cell FROM (
    SELECT q.query_id, q.qe, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
    FROM q CROSS JOIN centn c
  ) WHERE rn <= {n_p}
),
cand AS (
  SELECT p.query_id, e.vec_id AS nn_id, {cos} AS cosine
  FROM qp p JOIN corpus e ON p.cell = e.cell
)
SELECT query_id, nn_id, cosine FROM (
  SELECT query_id, nn_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC NULLS LAST, nn_id) AS rn
  FROM cand
) WHERE rn <= 3
"""


def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One declarative Lloyd iteration seeded with the IVF coarse
    quantizer (16 lowest-id vectors): nearest-centroid assignment is a
    map-side fold, the centroid update a partially-aggregated groupBy.
    The oracle replays assignment (row_number argmax with the same
    tiebreak) and the quantized-mean update in SQL."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(embs)
    return similarity.kmeans_step(embs, cents)


def _kmeans_step_oracle() -> str:
    n_c = similarity.IVF_CENTROIDS_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
members AS (SELECT cell, embedding FROM assign WHERE rn = 1)
SELECT cell, i AS dim,
       CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS centroid,
       count(*) AS n
FROM members, unnest(range(1, 65)) AS t(i)
GROUP BY cell, i
"""


def q_synthetic_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 deterministic generator (`stream_data_producer.py:73-110`
    contract: per-symbol daily OHLCV with high ≥ max(open, close) ≥
    min(open, close) ≥ low). The generator derives all entropy from
    md5("<id>:<seed>:<salt>") and builds prices in integer cents, so
    the DuckDB oracle replays it bit-identically — this was the one
    registered query without an oracle through round 5."""
    from real_time_stock_market_data_pipeline__spark.sources.external import (
        synthetic_ohlcv,
    )

    ensure_engine_conf(spark)
    return synthetic_ohlcv(spark, days=30)


# Replays sources/external.py:synthetic_ohlcv(days=30, seed=42,
# base=100.0) exactly: same md5 keys, same integer-cent arithmetic,
# same final /100.0 double division (bit-identical IEEE in both
# engines because every operand is an exact integer).
_SYNTHETIC_OHLCV_ORACLE = """
WITH g AS (SELECT id FROM range(150) t(id)),
h AS (
  SELECT id,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:o'), 1, 8) AS BIGINT) AS ho,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:s'), 1, 8) AS BIGINT) AS hs,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:c'), 1, 8) AS BIGINT) AS hc,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:v'), 1, 8) AS BIGINT) AS hv
  FROM g
),
c AS (
  SELECT id,
    10000 + ho % 10000 AS o_c,
    hs % 500 AS s_c,
    10000 + ho % 10000 + hc % 1000 - 500 AS c_c,
    hv % 1000000 + 1000 AS volume
  FROM h
)
SELECT
  list_extract(['AAPL','MSFT','GOOG','AMZN','TSLA'],
               CAST(id % 5 AS INT) + 1) AS symbol,
  DATE '2024-01-01' + CAST(id // 5 AS INT) AS "date",
  o_c / 100.0 AS open,
  (greatest(o_c, c_c) + s_c) / 100.0 AS high,
  (least(o_c, c_c) - s_c) / 100.0 AS low,
  c_c / 100.0 AS close,
  volume
FROM c
"""


def q_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-UDF scale path. By contract it returns the same top-k as
    ``cosine_topk``; NumPy's BLAS dot accumulates in a different order
    than the SQL fold, so the last ulp can differ — the registered
    projection quantizes the cosine at 6 digits (as does the oracle),
    making the equality oracle-checkable without promising bitwise
    float identity."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    out = similarity.cosine_topk_fast(
        load_table(spark, sf_dir, "embeddings"), q, k=10, rank_digits=6
    )
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


# Ranks on the 6-digit-quantized cosine (ties → vec_id) on BOTH sides,
# so a near-tie at the rank-k boundary cannot produce a member-set
# mismatch between NumPy-BLAS and SQL-fold summation orders.
_COSINE_TOPK_FAST_ORACLE = f"""
SELECT vec_id, round({_COSINE_QE}, 6) AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
ORDER BY round({_COSINE_QE}, 6) DESC NULLS LAST, vec_id
LIMIT 10
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
# Text analysis
# --------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_table("documents")(spark, sf_dir))


_STOPWORD_LIST = ", ".join(f"'{w}'" for w in text._EN_STOPWORDS)

_TEXT_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         {_TOKS} AS toks,
         length(text) AS n_chars,
         len({_TOKS}) AS n_words,
         length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         len(list_filter({_TOKS}, x -> x IN ({_STOPWORD_LIST}))) AS n_stop,
         length(replace({_NORM.format(col="text")}, ' ', '')) AS word_chars
  FROM documents
)
SELECT doc_id, n_chars, n_words,
  round(CASE WHEN n_words > 0 THEN CAST(word_chars AS DOUBLE) / n_words END, 4) AS avg_word_len,
  round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS punct_ratio,
  round(CASE WHEN n_chars > 0 THEN CAST(n_digit AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS digit_ratio,
  round(CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END, 4) AS stopword_ratio,
  round(
    least(n_words / 20.0, 1.0) * 0.4
    + least((CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 4, 1.0) * 0.3
    + (1 - least((CASE WHEN n_chars > 0 THEN CAST(n_digit AS DOUBLE) / n_chars ELSE 0.0 END) * 5, 1.0)) * 0.15
    + (1 - least((CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 5, 1.0)) * 0.15,
  4) AS quality_score
FROM t
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating applied: documents clearing the composite-score
    and word-count thresholds — the filter between scoring and
    training-set assembly."""
    return text.quality_filter(
        _table("documents")(spark, sf_dir), min_score=0.8, min_words=30
    )


_QUALITY_FILTER_ORACLE = f"""
WITH s AS ({_TEXT_STATS_ORACLE})
SELECT doc_id, n_words, quality_score
FROM s WHERE quality_score >= 0.8 AND n_words >= 30
"""


def q_sentence_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.sentence_dedup_stats(_table("documents")(spark, sf_dir))


_SENTENCE_DEDUP_ORACLE = """
WITH sent AS (
  SELECT DISTINCT doc_id, md5(s) AS h
  FROM (
    SELECT doc_id,
           unnest(string_split(
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '. ')) AS s
    FROM documents
  )
  WHERE length(s) > 0
),
counts AS (SELECT h, count(DISTINCT doc_id) AS nd FROM sent GROUP BY 1)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_sentences,
  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
  round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
    AS shared_fraction
FROM sent JOIN counts USING (h) GROUP BY 1
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count(_table("documents")(spark, sf_dir))


_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       len({_TOKS}) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_table("documents")(spark, sf_dir))


def _lang_id_oracle() -> str:
    langs = list(text.LANG_PROFILES)
    score_cols = ", ".join(
        "len(list_filter({toks}, x -> x IN ({words}))) AS score_{lang}".format(
            toks=_TOKS,
            words=", ".join(f"'{w}'" for w in text.LANG_PROFILES[lang]),
            lang=lang,
        )
        for lang in langs
    )
    pred = "CAST(NULL AS VARCHAR)"
    for lang in reversed(langs):
        conds = [f"score_{lang} > 0"]
        for other in langs:
            if langs.index(other) < langs.index(lang):
                conds.append(f"score_{lang} > score_{other}")
            elif other != lang:
                conds.append(f"score_{lang} >= score_{other}")
        pred = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {pred} END"
    return f"""
WITH s AS (SELECT doc_id, {score_cols} FROM documents)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in langs)},
       {pred} AS lang_pred
FROM s
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents(
        _table("documents")(spark, sf_dir), chunk_chars=200, overlap=40
    )


_CHUNK_ORACLE = """
WITH n AS (
  SELECT doc_id, text, length(text) AS ln,
         CASE WHEN length(text) <= 200 THEN 1
              ELSE (length(text) - 40 + 159) // 160 END AS n_chunks
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       substr(text, CAST(i * 160 + 1 AS INT), 200) AS chunk_text,
       CAST(n_chunks AS INT) AS n_chunks
FROM n, unnest(range(n.n_chunks)) AS t(i)
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split of the corpus keyed on doc_id —
    identical membership at any parallelism and in any md5-capable
    engine (df.sample can't give either property)."""
    docs = _table("documents")(spark, sf_dir)
    return sampling.hash_split(docs, "doc_id").select("doc_id", "bucket", "split")


def _hash_split_oracle() -> str:
    decode = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
WITH b AS (SELECT doc_id, ({decode}) % 1000000 AS bucket FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 800000 THEN 'train'
            WHEN bucket < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


#: Per-source sampling fractions for the stratified-sample query:
#: keep all of src0, half of src1, a quarter of src2, 10% elsewhere.
_STRATA_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_STRATA_DEFAULT = 0.1


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus re-balancing: per-source keep fractions via id-hash
    ranges — one map-side CASE filter, membership stable under any
    partitioning and replayed exactly by the SQL oracle."""
    docs = _table("documents")(spark, sf_dir)
    return sampling.stratified_hash_sample(
        docs, "doc_id", "source", _STRATA_FRACTIONS, _STRATA_DEFAULT
    ).select("doc_id", "source")


def _stratified_sample_oracle() -> str:
    decode = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    whens = " ".join(
        f"WHEN source = '{s}' THEN {int(f * sampling.HASH_BUCKETS)}"
        for s, f in _STRATA_FRACTIONS.items()
    )
    return f"""
WITH b AS (
  SELECT doc_id, source,
         ({decode}) % {sampling.HASH_BUCKETS} AS bucket
  FROM documents
)
SELECT doc_id, source FROM b
WHERE bucket < CASE {whens}
               ELSE {int(_STRATA_DEFAULT * sampling.HASH_BUCKETS)} END
"""


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.term_stats(_table("documents")(spark, sf_dir))


_TERM_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split({_NORM.format(col="text")}, ' ')) AS term
  FROM documents
)
SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM t WHERE term <> '' GROUP BY term
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_fingerprint(_table("documents")(spark, sf_dir))


_FINGERPRINT_ORACLE = f"""
WITH n AS (SELECT doc_id, {_NORM.format(col="text")} AS norm FROM documents)
SELECT doc_id,
  list_min(
    CASE WHEN length(norm) - 7 > 0
         THEN list_transform(range(1, length(norm) - 7 + 1), i -> md5(substr(norm, i, 8)))
         ELSE [md5(norm)] END
  ) AS fingerprint
FROM n
"""

# --------------------------------------------------------------------------
# Training-data pipeline: PII scrub, tf-idf, decontamination, packing,
# per-domain caps
# --------------------------------------------------------------------------


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents seeded with deterministic synthetic
    PII (the corpus itself is clean words): every 7th doc gets an
    email + long number appended, identically on both sides, so the
    masking and the counts are actually exercised."""
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
    return text.pii_redact(seeded)


_PII_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com tel 55512340' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{text.EMAIL_PATTERN}')) AS n_emails,
       len(regexp_extract_all(
             regexp_replace(text, '{text.EMAIL_PATTERN}', '<EMAIL>', 'g'),
             '{text.LONG_NUM_PATTERN}')) AS n_long_numbers,
       regexp_replace(
         regexp_replace(text, '{text.EMAIL_PATTERN}', '<EMAIL>', 'g'),
         '{text.LONG_NUM_PATTERN}', '<NUM>', 'g') AS clean_text
FROM seeded
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.tfidf_top_terms(_table("documents")(spark, sf_dir))


_TFIDF_ORACLE = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM t WHERE term <> '' GROUP BY doc_id, term
),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf,
         round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
  FROM tf JOIN dfx USING (term), nd
)
SELECT doc_id, term, tf, tfidf, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
) WHERE rank <= 3
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark leakage filter: every 20th doc plays the benchmark
    set; documents sharing any word 5-gram with it are flagged.
    Benchmark members are trivially contaminated (self-overlap) —
    kept in the output as the sanity floor."""
    docs = _table("documents")(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return text.decontaminate(docs, bench)


_DECONTAMINATE_ORACLE = f"""
WITH g AS (
  SELECT DISTINCT doc_id, md5(gram) AS gram_hash FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) - 4 > 0
                  THEN list_transform(range(1, len(toks) - 4 + 1),
                         i -> array_to_string(list_slice(toks, i, i + 4), ' '))
                  ELSE [array_to_string(toks, ' ')] END) AS gram
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
  )
),
bh AS (SELECT DISTINCT gram_hash FROM g WHERE doc_id % 20 = 0),
hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM g JOIN bh USING (gram_hash) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def q_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → count tokens → pack into 256-token bins per source
    shard, ordered by (doc_id, chunk_idx) — the context-window
    sharding step downstream of chunk_documents (same 200/40 chunk
    geometry as the chunk_documents query)."""
    docs = _table("documents")(spark, sf_dir)
    chunks = text.chunk_documents(docs, chunk_chars=200, overlap=40)
    tokens = chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_tokens"),
    ).join(F.broadcast(docs.select("doc_id", "source")), "doc_id")
    return text.token_pack(
        tokens, ["source"], ["doc_id", "chunk_idx"], "n_tokens", budget=256
    )


_TOKEN_PACK_ORACLE = """
WITH n AS (
  SELECT doc_id, text, length(text) AS ln,
         CASE WHEN length(text) <= 200 THEN 1
              ELSE (length(text) - 40 + 159) // 160 END AS n_chunks
  FROM documents
),
c AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         substr(text, CAST(i * 160 + 1 AS INT), 200) AS chunk_text
  FROM n, unnest(range(n.n_chunks)) AS t(i)
),
tok AS (
  SELECT d.source, c.doc_id, c.chunk_idx,
         len(string_split(c.chunk_text, ' ')) AS n_tokens
  FROM c JOIN documents d ON c.doc_id = d.doc_id
),
packed AS (
  SELECT source, doc_id, chunk_idx, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER w, 0) AS BIGINT) AS prior
  FROM tok
  WINDOW w AS (PARTITION BY source ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT source, doc_id, chunk_idx, n_tokens,
       prior // 256 AS bin_id, prior % 256 AS bin_offset
FROM packed
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, long form (label, dim) — exact
    under the quantize-then-decimal-sum recipe, so the oracle matches
    bitwise at any parallelism."""
    return similarity.embedding_centroids(
        _table("embeddings")(spark, sf_dir)
    )


_EMBEDDING_CENTROIDS_ORACLE = """
SELECT label, i AS dim,
       CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS centroid,
       count(*) AS n
FROM embeddings, unnest(range(1, 65)) AS t(i)
GROUP BY label, i
"""


def q_token_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy (first-fit) packing twin of token_pack: stateful
    applyInPandas per source shard, oracle-checked against a DuckDB
    recursive CTE that replays the same walk declaratively."""
    docs = _table("documents")(spark, sf_dir)
    chunks = text.chunk_documents(docs, chunk_chars=200, overlap=40)
    tokens = chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_tokens"),
    ).join(F.broadcast(docs.select("doc_id", "source")), "doc_id")
    return text.token_pack_greedy(
        tokens, ["source"], ["doc_id", "chunk_idx"], "n_tokens", budget=256
    )


_TOKEN_PACK_GREEDY_ORACLE = """
WITH RECURSIVE tok AS (
  SELECT d.source, c.doc_id, c.chunk_idx,
         len(string_split(c.chunk_text, ' ')) AS n_tokens
  FROM (
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           substr(text, CAST(i * 160 + 1 AS INT), 200) AS chunk_text
    FROM (
      SELECT doc_id, text,
             CASE WHEN length(text) <= 200 THEN 1
                  ELSE (length(text) - 40 + 159) // 160 END AS n_chunks
      FROM documents
    ) n, unnest(range(n.n_chunks)) AS t(i)
  ) c JOIN documents d ON c.doc_id = d.doc_id
),
ordered AS (
  SELECT source, doc_id, chunk_idx, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM tok
),
walk AS (
  SELECT source, doc_id, chunk_idx, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.chunk_idx, o.n_tokens, o.rn,
         CASE WHEN w.bin_fill + w.n_tokens + o.n_tokens > 256
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.bin_fill + w.n_tokens + o.n_tokens > 256
              THEN CAST(0 AS BIGINT)
              ELSE w.bin_fill + w.n_tokens END
  FROM walk w JOIN ordered o
    ON o.source = w.source AND o.rn = w.rn + 1
)
SELECT source, doc_id, chunk_idx, n_tokens, bin_id, bin_fill FROM walk
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota: keep the 10 largest docs per source
    (n_chars desc, doc_id desc tiebreak) — the de-domination cap a
    corpus builder applies so one crawl domain can't flood training.
    Same WindowGroupLimit shape as topk_days_per_symbol, over the
    documents table."""
    docs = _table("documents")(spark, sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    return relational.topk_per_group(
        docs, ["source"], ["n_chars", "doc_id"], 10
    )


_DOMAIN_CAP_ORACLE = """
SELECT doc_id, source, n_chars, rank FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id DESC) AS rank
  FROM documents
) WHERE rank <= 10
"""


# --------------------------------------------------------------------------
# Multimodal plumbing (stubbed decode, real Arrow/mapInPandas pipeline)
# --------------------------------------------------------------------------


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/mapInPandas feature extraction, scalarized for the driver:
    the library API returns an ``array<float>`` features column, but
    array cells don't canonicalize portably, so the registered query
    projects f0..f7 scalar columns (same values, same plan below the
    projection)."""
    from real_time_stock_market_data_pipeline__spark.operators import multimodal

    ensure_engine_conf(spark)
    media = multimodal.media_from_documents(_table("documents")(spark, sf_dir))
    feat = multimodal.extract_media_features(media, use_stub=True)
    return feat.select(
        "media_id",
        "kind",
        "n_bytes",
        "content_sha",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


def _media_features_oracle() -> str:
    feats = ", ".join(
        "CAST(("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(sha, {8 * i + j + 1}, 1)) - 1) * {16 ** (7 - j)}"
            for j in range(8)
        )
        + f") / 4294967296.0 AS FLOAT) AS f{i}"
        for i in range(8)
    )
    return f"""
WITH m AS (SELECT doc_id AS media_id, 'image' AS kind,
                  octet_length(encode(text)) AS n_bytes,
                  sha256(text) AS sha
           FROM documents)
SELECT media_id, kind, n_bytes, sha AS content_sha, {feats}
FROM m
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode (no codec library): deterministic binary
    PPM / PCM WAV payloads built per doc_id, then byte-level header
    parsing + pixel/sample statistics in Arrow-batched ``mapInPandas``
    (`operators/multimodal.py:decode_media`). The oracle replays the
    decoded features from the closed-form byte spec — so a parsing bug
    (endianness, header offset, channel interleave) breaks the hash."""
    from real_time_stock_market_data_pipeline__spark.operators import multimodal

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    return multimodal.decode_media(multimodal.synthetic_media(docs))


# Replays multimodal._ppm_bytes/_wav_bytes + decode_media: images are
# w=4+d%5 × h=3+d%7 with interleaved-RGB byte j = (d*7+j*11)%256;
# audio is n=160+d%100 samples of ((d*13+i*17)%2003)-1001 at 8 kHz.
# All sums exact integers; rms = sqrt(ssq/n) is correctly-rounded IEEE
# in both engines.
_MEDIA_DECODE_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS j FROM img),
imgf AS (
  SELECT doc_id, w, h,
         sum(CASE WHEN j % 3 = 0 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_r,
         sum(CASE WHEN j % 3 = 1 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_g,
         sum(CASE WHEN j % 3 = 2 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_b
  FROM px GROUP BY doc_id, w, h
),
aud AS (SELECT doc_id, 160 + doc_id % 100 AS n FROM documents WHERE doc_id % 2 = 1),
smp AS (
  SELECT doc_id, n, ((doc_id * 13 + unnest(range(0, n)) * 17) % 2003) - 1001 AS s
  FROM aud
),
audf AS (
  SELECT doc_id, n, max(abs(s)) AS peak, sum(s * s) AS ssq
  FROM smp GROUP BY doc_id, n
)
SELECT doc_id AS media_id, 'image' AS kind, 'ppm' AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS duration_ms, CAST(NULL AS INT) AS peak,
       CAST(NULL AS DOUBLE) AS rms
FROM imgf
UNION ALL
SELECT doc_id, 'audio', 'wav', NULL, NULL, NULL, NULL, NULL, NULL,
       CAST(n AS BIGINT), 8000, CAST(n * 1000 // 8000 AS INT),
       CAST(peak AS INT), sqrt(CAST(ssq AS DOUBLE) / n)
FROM audf
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
# Text repetition quality + cardinality sketch
# --------------------------------------------------------------------------


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.repetition_stats(_table("documents")(spark, sf_dir))


_REPETITION_ORACLE = f"""
WITH n AS (
  SELECT doc_id, string_split({_NORM.format(col="text")}, ' ') AS toks
  FROM documents
),
t AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM n
),
g AS (
  SELECT doc_id, 'w' AS kind, toks[pos] AS gram FROM t
  UNION ALL
  SELECT doc_id, 'b', toks[pos] || ' ' || toks[pos + 1]
  FROM t WHERE pos + 1 <= len(toks)
  UNION ALL
  SELECT doc_id, 'g', toks[pos] || ' ' || toks[pos + 1] || ' ' || toks[pos + 2]
                      || ' ' || toks[pos + 3] || ' ' || toks[pos + 4]
  FROM t WHERE pos + 4 <= len(toks)
),
c AS (SELECT doc_id, kind, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3)
SELECT doc_id,
  CAST(sum(CASE WHEN kind = 'w' THEN cnt END) AS BIGINT) AS n_words,
  round(CAST(max(CASE WHEN kind = 'w' THEN cnt END) AS DOUBLE)
        / CAST(sum(CASE WHEN kind = 'w' THEN cnt END) AS BIGINT), 6)
    AS top_word_frac,
  round(CASE WHEN CAST(sum(CASE WHEN kind = 'b' THEN cnt END) AS BIGINT) > 0
             THEN CAST(max(CASE WHEN kind = 'b' THEN cnt END) AS DOUBLE)
                  / CAST(sum(CASE WHEN kind = 'b' THEN cnt END) AS BIGINT)
        END, 6) AS top_bigram_frac,
  round(CASE WHEN CAST(sum(CASE WHEN kind = 'g' THEN cnt END) AS BIGINT) > 0
             THEN CAST(coalesce(
                    sum(CASE WHEN kind = 'g' AND cnt >= 2 THEN cnt END),
                    0) AS DOUBLE)
                  / CAST(sum(CASE WHEN kind = 'g' THEN cnt END) AS BIGINT)
        END, 6) AS dup_5gram_frac
FROM c GROUP BY doc_id
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.kmv_distinct(
        _events(spark, sf_dir), key_col="user_id", group_col="event_type", k=64
    )


def _kmv_oracle() -> str:
    decode = " + ".join(
        f"(strpos('0123456789abcdef', substr(h16, {j + 1}, 1)) - 1)"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    est = (
        "CASE WHEN max(CASE WHEN rn <= 64 THEN rn END) < 64"
        " THEN CAST(max(CASE WHEN rn <= 64 THEN rn END) AS DOUBLE)"
        " ELSE 63.0 / (CAST(max(CASE WHEN rn <= 64 THEN h END) AS DOUBLE)"
        " / 1152921504606846976.0) END"
    )
    return f"""
WITH b AS (
  SELECT event_type AS grp,
         substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS h16
  FROM events
),
hs AS (SELECT DISTINCT grp, CAST({decode} AS BIGINT) AS h FROM b),
r AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hs
)
SELECT grp,
       count(*) AS n_exact,
       round({est}, 4) AS n_est,
       round(abs(({est}) - count(*)) / count(*), 4) AS rel_err
FROM r GROUP BY grp
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
# Streaming EMA (stateful twin of indicators.ema_macd)
# --------------------------------------------------------------------------


def q_stream_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming EMA over daily closes, drained with
    availableNow into a memory sink; display rounding happens in the
    final batch projection (engine-identical half-up)."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import (
        pipeline,
        stateful,
    )

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    ticks = src.select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.col("value").alias("price"),
        F.col("event_id").alias("id"),
    )
    out = stateful.stream_ema_daily(ticks, span=12)
    tmp = tempfile.mkdtemp(prefix="ema_q_")
    name = "stream_ema_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "symbol",
        F.col("date").cast("date").alias("date"),
        F.round("close", 4).alias("close"),
        F.round("ema", 6).alias("ema"),
    )


_STREAM_EMA_ORACLE = """
WITH RECURSIVE d AS (
  SELECT DISTINCT
    event_type AS symbol,
    CAST(ts AS DATE) AS date,
    last_value(value) OVER w AS close
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
b AS (
  SELECT symbol, date, close,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
rec AS (
  SELECT symbol, date, close, rn, close AS ema FROM b WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.date, b.close, b.rn,
         2.0/13 * b.close + (1 - 2.0/13) * r.ema
  FROM b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, date, round(close, 4) AS close, round(ema, 6) AS ema FROM rec
"""


def q_stream_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2/T5/T7/K2 native append path: watermarked sliding-window
    aggregation written as partitioned parquet, drained availableNow
    (`streaming/pipeline.py:stream_window_metrics_append`). Append
    emits a window only once the watermark passes its end, so the
    oracle = epoch-bucket window replay + the emission filter
    (window_end ≤ ms-floored max event time − 60 s watermark)."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    tmp = tempfile.mkdtemp(prefix="swa_q_")
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("symbol"),
        "ts",
        F.col("value").alias("price"),
    )
    q = pipeline.stream_window_metrics_append(
        src,
        target_path=f"{tmp}/out",
        checkpoint_path=f"{tmp}/ckpt",
        available_now=True,
    )
    q.awaitTermination()
    return spark.read.parquet(f"{tmp}/out").select(
        "symbol", "window_start", "window_end", "moving_avg_price", "n_events"
    )


_STREAM_WINDOW_APPEND_ORACLE = """
WITH e AS (
  SELECT event_type AS symbol, ts, round(value, 6) AS price FROM events
),
w AS (
  SELECT symbol, price,
         make_timestamp((epoch_us(ts) // 300000000 - g.i) * 300000000)
           AS window_start
  FROM e, (SELECT unnest(range(0, 3)) AS i) g
),
a AS (
  SELECT symbol, window_start,
         window_start + INTERVAL 15 MINUTE AS window_end,
         CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) / count(*)
           AS moving_avg_price,
         count(*) AS n_events
  FROM w GROUP BY symbol, window_start
),
mx AS (SELECT max(ts) AS m FROM events)
SELECT a.symbol, a.window_start, a.window_end, a.moving_avg_price, a.n_events
FROM a, mx
WHERE epoch_ms(a.window_end) <= epoch_ms(mx.m) - 60000
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (T-family / A4 streaming twin):
    ``dropDuplicatesWithinWatermark`` on (event_type, date) over the
    event file stream, drained with availableNow into a memory sink.
    Only the key columns are projected — the non-key columns of the
    "first" occurrence are arrival-order-dependent by definition, so
    the registered result is the deterministic key set (= batch
    DISTINCT, which is the oracle)."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    keyed = src.select("event_type", "ts", F.to_date("ts").alias("date"))
    out = pipeline.stream_dedup_within_watermark(
        keyed, ["event_type", "date"], ts_col="ts"
    ).select("event_type", "date")
    tmp = tempfile.mkdtemp(prefix="sdedup_q_")
    name = "stream_dedup_q"
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


_STREAM_DEDUP_ORACLE = """
SELECT DISTINCT event_type, CAST(ts AS DATE) AS date FROM events
"""


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stream-stream interval join: view events ⋈ purchase events
    per user where the purchase lands within [view_ts, view_ts+3600s] —
    both sides are live streams (two tails of the event file stream),
    state bounded by the watermark + time bounds
    (`streaming/pipeline.py:stream_interval_join`). Drained with
    availableNow; the oracle is the plain batch time-range join, which
    the streamed inner join must reproduce exactly."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    src1 = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    src2 = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    views = src1.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = src2.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    out = pipeline.stream_interval_join(
        views,
        purchases,
        key="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        lower_s=0,
        upper_s=3600,
    )
    tmp = tempfile.mkdtemp(prefix="sij_q_")
    name = "stream_interval_join_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        "view_ts",
        "view_id",
        "purchase_ts",
        "purchase_id",
        "purchase_value",
    )


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` streaming sessionization drained
    with availableNow (`streaming/pipeline.py:stream_sessionize`).
    Append mode only emits sessions the final watermark has closed, so
    the oracle reproduces BOTH the gap-merge semantics (split when the
    inter-event gap exceeds 1800 s — same rule as the batch
    ``sessionize``) and the emission filter: session_close (last event
    + gap) at or before max(ts) minus the 1-minute watermark delay.
    The withheld tail is exactly the still-open sessions."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    out = pipeline.stream_sessionize(src, "user_id", "ts", gap_seconds=1800)
    tmp = tempfile.mkdtemp(prefix="ssess_q_")
    name = "stream_sessionize_q"
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


# Gap-split (>1800 s, the session_window merge rule) then emission
# filter at the final watermark (ms-floored max event time - 60 s).
# The fixture has no event pair exactly on either boundary, so the
# inequality choices are pinned by the empirical equality sweep run
# when this oracle was added (4 emission forms × 2 split forms all
# agreed with the drained stream).
_STREAM_SESSIONIZE_ORACLE = """
WITH flags AS (
  SELECT user_id AS key, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT key, ts, sum(new_s) OVER (PARTITION BY key ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flags
),
g AS (
  SELECT key, min(ts) AS session_start,
         max(ts) + INTERVAL 1800 SECOND AS session_close,
         count(*) AS n_events
  FROM sess GROUP BY key, sid
),
w AS (SELECT max(ts) AS mx FROM events)
SELECT g.key, g.session_start, g.session_close, g.n_events
FROM g, w
WHERE epoch_ms(g.session_close) <= epoch_ms(w.mx) - 60000
"""


_STREAM_INTERVAL_JOIN_ORACLE = """
SELECT l.user_id, l.view_ts, l.view_id,
       r.purchase_ts, r.purchase_id, r.purchase_value
FROM (SELECT user_id, ts AS view_ts, event_id AS view_id
      FROM events WHERE event_type = 'view') l
JOIN (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.purchase_ts >= l.view_ts
 AND r.purchase_ts <= l.view_ts + INTERVAL 3600 SECOND
"""


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
        THEN (sxy - sx * sy / n) / (n - 1) END, 6) AS serial_cov,
  round(CASE WHEN n >= 2 AND (sxy - sx * sy / n) / (n - 1) < 0
        THEN 2 * sqrt(-((sxy - sx * sy / n) / (n - 1))) END, 6)
    AS roll_spread
FROM s
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
# Round-6 corpus-analytics additions: lexical diversity, Zipf fit,
# language re-balancing, RFM segmentation
# --------------------------------------------------------------------------


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count / types / TTR / token-entropy per document
    (`operators/text.py:lexical_diversity`)."""
    return text.lexical_diversity(_table("documents")(spark, sf_dir))


_LEXICAL_DIVERSITY_ORACLE = f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
tf AS (
  SELECT doc_id, tok, count(*) AS c
  FROM t WHERE tok <> '' GROUP BY doc_id, tok
),
wt AS (
  SELECT doc_id, c,
    CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens
  FROM tf
),
terms AS (
  SELECT doc_id, n_tokens,
    round(CAST(c AS DOUBLE) / n_tokens
          * log2(CAST(c AS DOUBLE) / n_tokens), 6) AS t
  FROM wt
)
SELECT doc_id, max(n_tokens) AS n_tokens, count(*) AS n_types,
  round(CAST(count(*) AS DOUBLE) / max(n_tokens), 6) AS ttr,
  round(-CAST(sum(CAST(t AS DECIMAL(18,6))) AS DOUBLE), 6) AS token_entropy
FROM terms GROUP BY doc_id
"""


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf-law regression over the top-10k terms
    (`operators/text.py:zipf_slope`)."""
    return text.zipf_slope(_table("documents")(spark, sf_dir))


_ZIPF_ORACLE = f"""
WITH t AS (SELECT unnest({_TOKS}) AS tok FROM documents),
tf AS (SELECT tok, count(*) AS cnt FROM t WHERE tok <> '' GROUP BY tok),
r AS (
  SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
  FROM tf
),
xy AS (
  SELECT round(ln(CAST(rank AS DOUBLE)), 6) AS x,
         round(ln(CAST(cnt AS DOUBLE)), 6) AS y
  FROM r WHERE rank <= 10000
),
s AS (
  SELECT count(*) AS n,
    CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
    CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
         AS DOUBLE) AS sxx,
    CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)))
         AS DOUBLE) AS sxy
  FROM xy
)
SELECT n AS n_terms,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    AS zipf_intercept
FROM s
"""


def q_lang_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) language re-balancing weights
    (`operators/text.py:lang_balance_weights`)."""
    return text.lang_balance_weights(_table("documents")(spark, sf_dir))


_LANG_BALANCE_ORACLE = """
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
w AS (
  SELECT lang, n_docs, CAST(sum(n_docs) OVER () AS BIGINT) AS total FROM c
),
s AS (
  SELECT lang, n_docs,
    round(CAST(n_docs AS DOUBLE) / total, 6) AS corpus_share,
    round(pow(CAST(n_docs AS DOUBLE) / total, 0.5), 6) AS pw
  FROM w
),
n2 AS (
  SELECT *, CAST(sum(CAST(pw AS DECIMAL(18,6))) OVER () AS DOUBLE) AS norm
  FROM s
)
SELECT lang, n_docs, corpus_share,
  round(pw / norm, 6) AS target_share,
  round((pw / norm) / corpus_share, 6) AS sample_weight
FROM n2
"""


def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of event users
    (`operators/behavior.py:rfm_scores`)."""
    return behavior.rfm_scores(_events(spark, sf_dir))


_RFM_ORACLE = """
WITH pu AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS monetary
  FROM events GROUP BY user_id
),
b AS (
  SELECT user_id,
    date_diff('day', CAST(last_ts AS DATE),
              CAST(max(last_ts) OVER () AS DATE)) AS recency_days,
    frequency, monetary
  FROM pu
),
scored AS (
  SELECT user_id, recency_days, frequency, monetary,
    ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
    ntile(4) OVER (ORDER BY frequency, user_id) AS f_score,
    ntile(4) OVER (ORDER BY monetary, user_id) AS m_score
  FROM b
)
SELECT *, concat_ws('-', r_score, f_score, m_score) AS segment FROM scored
"""


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise union/Jaccard estimates between event-type user sets
    from KMV sketches, with exact values as checked error
    (`operators/sketches.py:kmv_set_ops`)."""
    return sketches.kmv_set_ops(
        _events(spark, sf_dir), key_col="user_id", group_col="event_type", k=64
    )


def _kmv_setops_oracle(k: int = 64) -> str:
    decode = " + ".join(
        f"(strpos('0123456789abcdef', substr(h16, {j + 1}, 1)) - 1)"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    return f"""
WITH b AS (
  SELECT event_type AS grp,
         substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS h16
  FROM events
),
hs AS (SELECT DISTINCT grp, CAST({decode} AS BIGINT) AS h FROM b),
cnt AS (SELECT grp, count(*) AS n FROM hs GROUP BY grp),
km AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= {k}
),
pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b
  FROM (SELECT DISTINCT grp FROM hs) a
  JOIN (SELECT DISTINCT grp FROM hs) b ON a.grp < b.grp
),
pl AS (
  SELECT grp_a, grp_b, grp_a AS member FROM pairs
  UNION ALL
  SELECT grp_a, grp_b, grp_b FROM pairs
),
comb AS (
  SELECT pl.grp_a, pl.grp_b, km.h,
         max(CASE WHEN km.grp = pl.grp_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN km.grp = pl.grp_b THEN 1 ELSE 0 END) AS in_b
  FROM pl JOIN km ON km.grp = pl.member
  GROUP BY pl.grp_a, pl.grp_b, km.h
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn
  FROM comb
),
sk AS (
  SELECT grp_a, grp_b,
    round(CASE WHEN max(rn) < {k} THEN CAST(max(rn) AS DOUBLE)
          ELSE {float(k - 1)}
               / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0) END,
          4) AS union_est,
    round(CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) / max(rn), 4) AS jaccard_est
  FROM r WHERE rn <= {k} GROUP BY grp_a, grp_b
),
ei AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b, count(*) AS inter_exact
  FROM hs a JOIN hs b ON a.h = b.h AND a.grp < b.grp
  GROUP BY 1, 2
)
SELECT sk.grp_a, sk.grp_b,
  ca.n + cb.n - coalesce(ei.inter_exact, 0) AS union_exact,
  sk.union_est,
  coalesce(ei.inter_exact, 0) AS inter_exact,
  round(CAST(coalesce(ei.inter_exact, 0) AS DOUBLE)
        / (ca.n + cb.n - coalesce(ei.inter_exact, 0)), 4) AS jaccard_exact,
  sk.jaccard_est
FROM sk
JOIN cnt ca ON ca.grp = sk.grp_a
JOIN cnt cb ON cb.grp = sk.grp_b
LEFT JOIN ei ON ei.grp_a = sk.grp_a AND ei.grp_b = sk.grp_b
"""


def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming CUSUM change-point detection over daily
    returns, drained availableNow into a memory sink
    (`streaming/stateful.py:stream_cusum_daily`); display rounding in
    the final batch projection."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import (
        pipeline,
        stateful,
    )

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    ticks = src.select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.col("value").alias("price"),
        F.col("event_id").alias("id"),
    )
    out = stateful.stream_cusum_daily(ticks, kappa=0.25, h=2.0)
    tmp = tempfile.mkdtemp(prefix="cusum_q_")
    name = "stream_cusum_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "symbol",
        F.col("date").cast("date").alias("date"),
        F.round("close", 4).alias("close"),
        F.round("ret", 6).alias("ret"),
        F.round("s_pos", 6).alias("s_pos"),
        F.round("s_neg", 6).alias("s_neg"),
        "alarm",
    )


#: CUSUM update expressions, shared between the two recursive arms
_CUSUM_POS = "greatest(0.0, {prev_pos} + b.ret - 0.25)"
_CUSUM_NEG = "greatest(0.0, {prev_neg} - b.ret - 0.25)"


def _stream_cusum_oracle() -> str:
    first_pos = "greatest(0.0, 0.0 + ret - 0.25)"
    first_neg = "greatest(0.0, 0.0 - ret - 0.25)"
    step_pos = _CUSUM_POS.format(
        prev_pos="(CASE WHEN r.alarm <> 0 THEN 0.0 ELSE r.s_pos END)"
    )
    step_neg = _CUSUM_NEG.format(
        prev_neg="(CASE WHEN r.alarm <> 0 THEN 0.0 ELSE r.s_neg END)"
    )
    return f"""
WITH RECURSIVE d AS (
  SELECT DISTINCT
    event_type AS symbol,
    CAST(ts AS DATE) AS date,
    last_value(value) OVER w AS close
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
b AS (
  SELECT symbol, date, close,
    close / lag(close) OVER (PARTITION BY symbol ORDER BY date) - 1 AS ret,
    row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
rec AS (
  SELECT symbol, date, close, ret, rn,
    {first_pos} AS s_pos,
    {first_neg} AS s_neg,
    CASE WHEN {first_pos} > 2.0 THEN 1
         WHEN {first_neg} > 2.0 THEN -1 ELSE 0 END AS alarm
  FROM b WHERE rn = 2
  UNION ALL
  SELECT b.symbol, b.date, b.close, b.ret, b.rn,
    {step_pos},
    {step_neg},
    CASE WHEN {step_pos} > 2.0 THEN 1
         WHEN {step_neg} > 2.0 THEN -1 ELSE 0 END
  FROM b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, date, round(close, 4) AS close, round(ret, 6) AS ret,
       round(s_pos, 6) AS s_pos, round(s_neg, 6) AS s_neg, alarm
FROM rec
"""


def q_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heikin-Ashi smoothed candles over the daily bars
    (`operators/indicators.py:heikin_ashi`)."""
    return indicators.heikin_ashi(q_daily_metrics(spark, sf_dir))


_HEIKIN_ASHI_ORACLE = f"""
WITH RECURSIVE d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date, daily_open AS o, daily_high AS h,
         daily_low AS l, daily_close AS c,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
rec AS (
  SELECT symbol, date, rn, h, l,
         (o + c) / 2 AS ha_open,
         (o + h + l + c) / 4 AS ha_close
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.date, b.rn, b.h, b.l,
         (r.ha_open + r.ha_close) / 2,
         (b.o + b.h + b.l + b.c) / 4
  FROM b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, date,
  round(ha_open, 6) AS ha_open,
  round(greatest(h, ha_open, ha_close), 6) AS ha_high,
  round(least(l, ha_open, ha_close), 6) AS ha_low,
  round(ha_close, 6) AS ha_close,
  CASE WHEN ha_close > ha_open THEN 1
       WHEN ha_close < ha_open THEN -1 ELSE 0 END AS direction
FROM rec
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with digest + recon error
    (`operators/similarity.py:embedding_quantize`)."""
    ensure_engine_conf(spark)
    return similarity.embedding_quantize(load_table(spark, sf_dir, "embeddings"))


_QUANT_ERR_CHAIN = " + ".join(
    f"(CAST(v[{i + 1}] AS DOUBLE) - q[{i + 1}] * scale)"
    f" * (CAST(v[{i + 1}] AS DOUBLE) - q[{i + 1}] * scale)"
    for i in range(_DIM)
)

_EMBEDDING_QUANTIZE_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding AS v,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
      AS scale
  FROM embeddings
),
qv AS (
  SELECT vec_id, v, scale,
    list_transform(v, x -> CASE WHEN scale > 0
        THEN CAST(round(CAST(x AS DOUBLE) / scale, 0) AS INTEGER)
        ELSE 0 END) AS q
  FROM b
)
SELECT vec_id, len(v) AS n_dims, round(scale, 6) AS scale,
  md5(array_to_string(q, ',')) AS qvec_digest,
  round(sqrt({_QUANT_ERR_CHAIN}), 6) AS recon_err
FROM qv
"""


def q_weekday_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week return seasonality per symbol: count, exact mean,
    exact sample stddev, and share of positive days for each ISO
    weekday. One extra map-side column on the daily-returns lineage;
    the tiny (symbol × 7) aggregate is fully partial-aggregated."""
    daily = q_daily_metrics(spark, sf_dir)
    wlag = Window.partitionBy("symbol").orderBy("date")
    ret = F.round(F.col("daily_close") / F.lag("daily_close").over(wlag) - 1, 6)
    rets = daily.select(
        "symbol",
        (F.weekday("date") + F.lit(1)).alias("iso_weekday"),
        ret.alias("r"),
    ).where(F.col("r").isNotNull())
    d = F.col("r").cast("decimal(18,6)")
    n = F.count(F.lit(1))
    sx = F.sum(d).cast("double")
    sxx = F.sum(d * d).cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1))
    return rets.groupBy("symbol", "iso_weekday").agg(
        n.alias("n_days"),
        F.round(sx / n, 6).alias("mean_ret"),
        F.round(
            F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0)))), 6
        ).alias("std_ret"),
        F.round(
            F.sum(F.when(F.col("r") > 0, 1).otherwise(0)).cast("double") / n, 6
        ).alias("share_up"),
    )


_WEEKDAY_RETURNS_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
r AS (
  SELECT symbol, isodow(date) AS iso_weekday,
    round(daily_close / lag(daily_close)
          OVER (PARTITION BY symbol ORDER BY date) - 1, 6) AS r
  FROM d
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL)
SELECT symbol, iso_weekday, count(*) AS n_days,
  {_round_sql(_EXAVG.format(col="r"), 6)} AS mean_ret,
  {_round_sql(_EXSTD_WIDE.format(col="r"), 6)} AS std_ret,
  round(CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    AS share_up
FROM rr GROUP BY symbol, iso_weekday
"""


def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette score per embedding label
    (`operators/similarity.py:silhouette_by_label`)."""
    ensure_engine_conf(spark)
    return similarity.silhouette_by_label(load_table(spark, sf_dir, "embeddings"))


_SILHOUETTE_ORACLE = f"""
WITH c AS (
  SELECT label AS clabel, i AS dim,
    round(CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                        AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS c
  FROM embeddings, unnest(range(1, {_DIM + 1})) AS t(i)
  GROUP BY label, i
),
e AS (
  SELECT vec_id, label, i AS dim,
         round(CAST(embedding[i] AS DOUBLE), 6) AS x
  FROM embeddings, unnest(range(1, {_DIM + 1})) AS t(i)
),
d2 AS (
  SELECT e.vec_id, e.label, c.clabel,
    round(sqrt(CAST(sum(CAST(round((x - c.c) * (x - c.c), 12)
                             AS DECIMAL(24,12))) AS DOUBLE)), 6) AS dist
  FROM e JOIN c ON e.dim = c.dim
  GROUP BY 1, 2, 3
),
sv AS (
  SELECT vec_id, label,
    max(CASE WHEN clabel = label THEN dist END) AS a,
    min(CASE WHEN clabel <> label THEN dist END) AS b
  FROM d2 GROUP BY 1, 2
),
s AS (
  SELECT label,
    round(CASE WHEN greatest(a, b) > 0
          THEN (b - a) / greatest(a, b) ELSE 0.0 END, 6) AS s
  FROM sv
)
SELECT label, count(*) AS n_vectors,
  round({_EXAVG.format(col="s")}, 6) AS mean_silhouette
FROM s GROUP BY label
"""


def q_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle price-impact lambda per symbol from tick-rule signs
    (`operators/indicators.py:kyle_lambda`)."""
    ev = _events(spark, sf_dir)
    return indicators.kyle_lambda(
        ev, symbol_col="event_type", ts_col="ts",
        price_col="value", id_col="event_id",
    )


_KYLE_LAMBDA_ORACLE = """
WITH t AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date, ts, event_id,
         round(value, 6) AS pq
  FROM events
),
s AS (
  SELECT symbol, date, ts, event_id, pq,
         CASE WHEN pq > lag(pq) OVER w THEN 1
              WHEN pq < lag(pq) OVER w THEN -1 END AS raw,
         round(pq - lag(pq) OVER w, 6) AS dp
  FROM t WINDOW w AS (PARTITION BY symbol, date ORDER BY ts, event_id)
),
c AS (
  SELECT symbol, dp AS y,
         last_value(raw IGNORE NULLS)
           OVER (PARTITION BY symbol, date ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
  FROM s
),
p AS (SELECT * FROM c WHERE x IS NOT NULL AND y IS NOT NULL),
agg AS (
  SELECT symbol, count(*) AS n,
    CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
    CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
         AS DOUBLE) AS sxx,
    CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)))
         AS DOUBLE) AS sxy
  FROM p GROUP BY symbol
)
SELECT symbol, n AS n_ticks,
  round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS kyle_lambda,
  round((sy - CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END * sx) / n, 6)
    AS intercept
FROM agg
"""


def q_corwin_schultz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corwin-Schultz high-low spread estimator per (symbol, day pair)
    (`operators/indicators.py:corwin_schultz`)."""
    return indicators.corwin_schultz(q_daily_metrics(spark, sf_dir))


_CORWIN_SCHULTZ_ORACLE = f"""
WITH d AS ({_DAILY_EVENTS_ORACLE}),
b AS (
  SELECT symbol, date,
    CASE WHEN daily_low > 0
         THEN round(ln(daily_high / daily_low), 6) END AS u2,
    lag(CASE WHEN daily_low > 0
         THEN round(ln(daily_high / daily_low), 6) END) OVER w AS u1,
    CASE WHEN least(daily_low, lag(daily_low) OVER w) > 0
         THEN round(ln(greatest(daily_high, lag(daily_high) OVER w)
                       / least(daily_low, lag(daily_low) OVER w)), 6) END AS g
  FROM d WINDOW w AS (PARTITION BY symbol ORDER BY date)
),
f AS (
  SELECT * FROM b
  WHERE u1 IS NOT NULL AND u2 IS NOT NULL AND g IS NOT NULL
),
x AS (
  SELECT symbol, date, u1 * u1 + u2 * u2 AS beta, g * g AS gamma FROM f
),
a AS (
  SELECT symbol, date, beta, gamma,
    (sqrt(2.0 * beta) - sqrt(beta)) / {indicators._CS_DEN!r}
      - sqrt(gamma / {indicators._CS_DEN!r}) AS alpha
  FROM x
)
SELECT symbol, date, round(beta, 6) AS beta, round(gamma, 6) AS gamma,
  round(alpha, 6) AS alpha,
  round(greatest(2.0 * (exp(alpha) - 1) / (1 + exp(alpha)), 0.0), 6) AS spread
FROM a
"""


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


# --------------------------------------------------------------------------
# Round-7 batch 5: audio frame energy, MinHash audit, corpus report
# --------------------------------------------------------------------------


def q_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame RMS/peak over the synthetic WAV clips — 1→N audio
    fan-out with real stdlib decode
    (`operators/multimodal.py:audio_frame_energy`); the oracle replays
    the sample spec (`multimodal._wav_bytes`) declaratively."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    media = multimodal.synthetic_media(_table("documents")(spark, sf_dir))
    return multimodal.audio_frame_energy(
        media.where(F.col("kind") == "audio"), frame_len=64
    )


_AUDIO_FRAMES_ORACLE = """
WITH aud AS (
  SELECT doc_id, 160 + doc_id % 100 AS n
  FROM documents WHERE doc_id % 2 = 1
),
smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
sv AS (
  SELECT doc_id, CAST(i // 64 AS INT) AS frame_idx,
         ((doc_id * 13 + i * 17) % 2003) - 1001 AS s
  FROM smp
)
SELECT doc_id AS media_id, frame_idx,
       CAST(count(*) AS INT) AS n_in_frame,
       CAST(max(abs(s)) AS INT) AS peak,
       sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) AS rms
FROM sv GROUP BY doc_id, frame_idx
"""


def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit: signature-estimated vs true Jaccard
    on every LSH candidate pair
    (`operators/dedup.py:minhash_accuracy`)."""
    return dedup.minhash_accuracy(_table("documents")(spark, sf_dir))


def _minhash_accuracy_oracle() -> str:
    match_sum = " + ".join(
        f"CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(dedup.MINHASH_PERMS)
    )
    return f"""
WITH {_minhash_cte()},
est AS (
  SELECT c.id_a, c.id_b,
         round(({match_sum}) / {float(dedup.MINHASH_PERMS)!r}, 6)
           AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b
),
tr AS (
  SELECT c.id_a, c.id_b,
         round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
                    THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(sa.sh, sb.sh)))
                    ELSE 0.0 END, 4) AS true_jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT e.id_a, e.id_b, e.est_jaccard, t.true_jaccard,
       round(abs(e.est_jaccard - t.true_jaccard), 6) AS abs_err
FROM est e JOIN tr t ON e.id_a = t.id_a AND e.id_b = t.id_b
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus dashboard: volume, mean length/quality,
    exact-duplicate and near-duplicate exposure — the composition a
    data-curation run reads before deciding per-source treatment
    (text_stats × exact-dup grouping × LSH candidate ids)."""
    docs = _table("documents")(spark, sf_dir)
    stats = text.text_stats(docs).select("doc_id", "n_words", "quality_score")
    norm = docs.select(
        "doc_id", "source", dedup.normalized_text("text").alias("nrm")
    )
    nc = norm.groupBy("nrm").agg(F.count(F.lit(1)).alias("c"))
    cand = dedup.dedup_minhash_pairs(docs).localCheckpoint(eager=True)
    nd_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("is_nd", F.lit(1))
    )
    base = (
        norm.join(nc, "nrm")
        .join(stats, "doc_id")
        .join(nd_ids, "doc_id", "left")
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("n_words").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_words"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_exact_dup"),
        F.sum(F.coalesce(F.col("is_nd"), F.lit(0))).alias("n_neardup"),
        F.round(
            F.sum(F.coalesce(F.col("is_nd"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("neardup_fraction"),
    )


def _corpus_report_oracle() -> str:
    return f"""
WITH {_minhash_cte()},
nd_ids AS (
  SELECT DISTINCT doc_id FROM (
    SELECT id_a AS doc_id FROM cand
    UNION ALL SELECT id_b AS doc_id FROM cand
  ) u
),
nrm AS (
  SELECT doc_id, source, {_NORM.format(col="text")} AS nrm FROM documents
),
nc AS (SELECT nrm, count(*) AS c FROM nrm GROUP BY nrm),
base AS (
  SELECT n.source, s.n_words, s.quality_score,
         CASE WHEN c2.c > 1 THEN 1 ELSE 0 END AS is_exact_dup,
         CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_nd
  FROM nrm n
  JOIN ({_TEXT_STATS_ORACLE}) s ON n.doc_id = s.doc_id
  JOIN nc c2 ON n.nrm = c2.nrm
  LEFT JOIN nd_ids nd ON n.doc_id = nd.doc_id
)
SELECT source,
       count(*) AS n_docs,
       round(CAST(sum(n_words) AS DOUBLE) / count(*), 6) AS mean_words,
       round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_quality,
       CAST(sum(is_exact_dup) AS BIGINT) AS n_exact_dup,
       CAST(sum(is_nd) AS BIGINT) AS n_neardup,
       round(CAST(sum(is_nd) AS DOUBLE) / count(*), 6) AS neardup_fraction
FROM base GROUP BY source
"""


# --------------------------------------------------------------------------
# Round-7 batch 6: bounded-state stream dedup, Gini, centroid similarity
# --------------------------------------------------------------------------


def q_stream_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate streaming dedup with a single 48-bit Bloom word of
    state per user, drained availableNow
    (`streaming/stateful.py:stream_bloom_dedup`); the oracle is a
    recursive CTE walking the identical (ts, id)-ordered bloom fold."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import (
        pipeline,
        stateful,
    )

    ensure_engine_conf(spark)
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    ticks = src.select(
        "user_id",
        "ts",
        "event_id",
        # F.concat (null-propagating, matching the oracle's ||) —
        # concat_ws would silently skip a NULL props and disagree
        F.concat(
            F.coalesce("event_type", F.lit("")),
            F.lit("|"),
            F.coalesce("props", F.lit("")),
        ).alias("fp"),
    )
    out = stateful.stream_bloom_dedup(ticks)
    tmp = tempfile.mkdtemp(prefix="sbf_q_")
    name = "stream_bloom_dedup_q"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "fp",
    )


_SBF_POS = (
    "CAST(CAST('0x' || substr(md5('sbf{i}:' || fp), 1, 8) AS BIGINT)"
    " % 48 AS INT)"
)

_STREAM_BLOOM_DEDUP_ORACLE = f"""
WITH RECURSIVE b AS (
  SELECT user_id, ts, event_id,
         coalesce(event_type, '') || '|' || coalesce(props, '') AS fp,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
bb AS (
  SELECT user_id, ts, event_id, fp, rn,
         (CAST(1 AS BIGINT) << {_SBF_POS.format(i=0)})
         | (CAST(1 AS BIGINT) << {_SBF_POS.format(i=1)}) AS bits
  FROM b
),
rec AS (
  SELECT user_id, ts, event_id, fp, rn, bits,
         CAST(0 AS BIGINT) AS prev_word
  FROM bb WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.ts, n.event_id, n.fp, n.rn, n.bits,
         r.prev_word | r.bits
  FROM bb n JOIN rec r ON n.user_id = r.user_id AND n.rn = r.rn + 1
)
SELECT user_id, ts, event_id, fp
FROM rec WHERE prev_word & bits <> bits
"""


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini inequality of event values per type
    (`operators/metrics.py:gini`)."""
    return metrics.gini(
        _events(spark, sf_dir), group_col="event_type", value_col="value"
    )


_GINI_ORACLE = """
WITH b AS (
  SELECT event_type AS grp,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS xq
  FROM events
),
r AS (
  SELECT grp, xq,
         row_number() OVER (PARTITION BY grp ORDER BY xq) AS rn
  FROM b
),
a AS (
  SELECT grp, count(*) AS n,
         CAST(sum(xq) AS DOUBLE) AS sx,
         CAST(sum(xq * CAST(rn AS DECIMAL(12,0))) AS DOUBLE) AS swx
  FROM r GROUP BY grp
)
SELECT grp, n, round(sx, 6) AS total,
       round(CASE WHEN sx <> 0
                  THEN 2.0 * swx / (n * sx) - CAST(n + 1 AS DOUBLE) / n
             END, 6) AS gini
FROM a
"""


def q_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids
    (`operators/similarity.py:centroid_similarity`)."""
    return similarity.centroid_similarity(_table("embeddings")(spark, sf_dir))


_CENTROID_SIM_ORACLE = """
WITH c AS (
  SELECT label, i AS dim,
         floor((CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                              AS DECIMAL(18,6))) AS DOUBLE) / count(*))
               * 1e6 + 0.5) / 1e6 AS cv
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  GROUP BY label, i
),
p AS (
  SELECT a.label AS label_a, b.label AS label_b, a.dim,
         a.cv AS ca, b.cv AS cb
  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
),
g AS (
  SELECT label_a, label_b,
         CAST(sum(CAST(floor(ca * cb * 1e12 + 0.5) / 1e12
                       AS DECIMAL(28,12))) AS DOUBLE) AS dot,
         CAST(sum(CAST(floor(ca * ca * 1e12 + 0.5) / 1e12
                       AS DECIMAL(28,12))) AS DOUBLE) AS na,
         CAST(sum(CAST(floor(cb * cb * 1e12 + 0.5) / 1e12
                       AS DECIMAL(28,12))) AS DOUBLE) AS nb
  FROM p GROUP BY label_a, label_b
)
SELECT label_a, label_b,
       floor((CASE WHEN na > 0 AND nb > 0
                   THEN dot / (sqrt(na) * sqrt(nb)) END)
             * 1e6 + 0.5) / 1e6 AS cosine
FROM g
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
# Round-7 batch 9: rolling median, containment, trending terms, session PMI
# --------------------------------------------------------------------------


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling median of daily closes (explode fan-out +
    constant-size sorted selection)
    (`operators/metrics.py:rolling_median`)."""
    return metrics.rolling_median(
        _daily_close(spark, sf_dir),
        group_col="symbol",
        order_col="date",
        value_col="close",
        n=7,
    )


_ROLLING_MEDIAN_ORACLE = f"""
WITH d AS ({_DAILY_CLOSE_CTE}),
b AS (
  SELECT symbol AS grp, date AS ord, close AS val,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM d
),
f AS (
  SELECT grp, ord, val, rn, rn + g.off AS wend, g.off
  FROM b CROSS JOIN (SELECT unnest(range(7)) AS off) g
),
a AS (
  SELECT grp, wend,
         max(CASE WHEN off = 0 THEN ord END) AS ord_w,
         max(CASE WHEN off = 0 THEN val END) AS val_w,
         count(*) AS n_members,
         list_sort(list(val))[4] AS rolling_median
  FROM f GROUP BY grp, wend
)
SELECT grp AS symbol, ord_w AS date, val_w AS close, rolling_median
FROM a WHERE n_members = 7
"""


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment over LSH candidates — the
    quote-inclusion detector
    (`operators/dedup.py:ngram_containment_pairs`)."""
    return dedup.ngram_containment_pairs(
        _table("documents")(spark, sf_dir), threshold=0.8
    )


_CONTAINMENT_ORACLE = f"""
WITH {_minhash_cte()},
scored AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(list_distinct(sa.sh)) AS n_a,
         len(list_distinct(sb.sh)) AS n_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
),
r AS (
  SELECT id_a, id_b,
         round(CASE WHEN n_a > 0
                    THEN CAST(inter AS DOUBLE) / n_a ELSE 0.0 END, 4)
           AS containment_a,
         round(CASE WHEN n_b > 0
                    THEN CAST(inter AS DOUBLE) / n_b ELSE 0.0 END, 4)
           AS containment_b
  FROM scored
)
SELECT id_a, id_b, containment_a, containment_b
FROM r WHERE containment_a >= 0.8 OR containment_b >= 0.8
"""


def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 terms over-represented in the odd-doc-id snapshot vs
    the even one (add-one-smoothed log share ratio)
    (`operators/text.py:trending_terms`)."""
    docs = _table("documents")(spark, sf_dir).withColumn(
        "is_b", (F.col("doc_id") % 2 == 1).cast("int")
    )
    return text.trending_terms(docs, side_col="is_b", top_k=20)


_TRENDING_ORACLE = f"""
WITH tk AS (
  SELECT CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS is_b,
         unnest({_TOKS}) AS term
  FROM documents
),
f AS (SELECT * FROM tk WHERE term <> ''),
c AS (
  SELECT term,
         CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM f GROUP BY term
),
g AS (
  SELECT term, c_a, c_b,
         sum(c_a) OVER () AS na, sum(c_b) OVER () AS nb,
         count(*) OVER () AS v
  FROM c
)
SELECT term, c_a, c_b,
       round(ln((CAST(c_b + 1 AS DOUBLE) / (nb + v))
                / (CAST(c_a + 1 AS DOUBLE) / (na + v))), 6) AS trend_score
FROM g ORDER BY trend_score DESC, term LIMIT 20
"""


def q_session_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-presence PMI within 30-min gap sessions
    (`operators/behavior.py:session_copresence_pmi`)."""
    return behavior.session_copresence_pmi(
        _events(spark, sf_dir), gap_seconds=1800
    )


def _session_pmi_oracle() -> str:
    prefix = """
WITH s0 AS (
  SELECT user_id, event_type AS etype, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s1 AS (
  SELECT user_id, etype,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM s0
),
pres AS (SELECT DISTINCT user_id, session_id, etype FROM s1)"""
    body = behavior.copresence_pmi_sql("pres")
    head, rest = body.split("WITH", 1)
    return prefix + "," + rest



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


# --------------------------------------------------------------------------
# Round-7 batch 14: boilerplate stripping, QQ drill-down
# --------------------------------------------------------------------------


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate sentence removal (df > 2 dropped,
    order-preserving rebuild)
    (`operators/text.py:strip_boilerplate`)."""
    return text.strip_boilerplate(
        _table("documents")(spark, sf_dir), max_df=2
    )


_STRIP_BOILERPLATE_ORACLE = f"""
WITH arrs AS (
  SELECT doc_id,
         string_split_regex({_NORM.format(col="text")}, '\\. ') AS arr
  FROM documents
),
sent AS (
  SELECT doc_id, r.i AS pos, arr[r.i] AS s
  FROM arrs, unnest(range(1, len(arr) + 1)) AS r(i)
  WHERE length(arr[r.i]) > 0
),
counts AS (
  SELECT md5(s) AS h, count(DISTINCT doc_id) AS nd
  FROM sent GROUP BY md5(s)
),
flagged AS (
  SELECT st.doc_id, st.pos, st.s, c.nd
  FROM sent st JOIN counts c ON md5(st.s) = c.h
),
rebuilt AS (
  SELECT doc_id,
         count(*) AS n_sentences,
         CAST(sum(CASE WHEN nd > 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
         coalesce(string_agg(CASE WHEN nd <= 2 THEN s END, '. '
                             ORDER BY pos), '') AS cleaned_text
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.cleaned_text, '') AS cleaned_text,
       coalesce(r.n_sentences, 0) AS n_sentences,
       coalesce(r.n_dropped, 0) AS n_dropped
FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


def q_qq_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete QQ table per event type, weekday vs weekend — the
    drill-down behind a KS alarm
    (`operators/metrics.py:qq_quantiles`)."""
    return metrics.qq_quantiles(
        _events_weekend_split(spark, sf_dir),
        group_col="event_type",
        side_col="is_weekend",
        value_col="value",
    )


def _qq_oracle() -> str:
    picks = []
    gaps = []
    for label, num, den in metrics.QQ_LEVELS:
        for side, sfx in ((0, "ref"), (1, "cur")):
            picks.append(
                f"max(CASE WHEN is_b = {side}"
                f" AND rn = (n * {num} + {den - 1}) // {den}"
                f" THEN val END) AS {label}_{sfx}"
            )
        gaps.append(
            f"round({label}_cur - {label}_ref, 6) AS {label}_gap"
        )
    return f"""
WITH v AS (
  SELECT event_type AS grp, value AS val, {_WEEKEND_SQL} AS is_b
  FROM events
),
r AS (
  SELECT grp, is_b, val,
         row_number() OVER (PARTITION BY grp, is_b ORDER BY val) AS rn,
         count(*) OVER (PARTITION BY grp, is_b) AS n
  FROM v
),
a AS (
  SELECT grp, {", ".join(picks)}
  FROM r GROUP BY grp
)
SELECT grp,
       {", ".join(f"{l}_ref, {l}_cur" for l, _, _ in metrics.QQ_LEVELS)},
       {", ".join(gaps)}
FROM a
"""


# --------------------------------------------------------------------------
# Round-7 batch 15: hierarchy pointer doubling, real PPM resize
# --------------------------------------------------------------------------


def q_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root/depth resolution of the decimal-digit customer forest
    (parent = custkey DIV 10) by log-round pointer doubling; the
    oracle walks every chain with a recursive CTE
    (`operators/relational.py:resolve_hierarchy`)."""
    ensure_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    div = F.expr("c_custkey DIV 10")
    nodes = cust.select(
        F.col("c_custkey").alias("id"),
        F.when(div != 0, div).alias("parent"),
    )
    return relational.resolve_hierarchy(nodes, "id", "parent")


_HIERARCHY_ORACLE = """
WITH RECURSIVE n AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey // 10 = 0 THEN NULL
              ELSE c_custkey // 10 END AS parent
  FROM customer
),
rec AS (
  SELECT id, id AS cur, 0 AS depth FROM n
  UNION ALL
  SELECT r.id, n2.parent AS cur, r.depth + 1
  FROM rec r JOIN n n2 ON r.cur = n2.id
  WHERE n2.parent IS NOT NULL
)
SELECT r.id, r.cur AS root, r.depth
FROM rec r JOIN n n3 ON r.cur = n3.id
WHERE n3.parent IS NULL
"""


def q_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real nearest-neighbor PPM downsampling (stride 2) with exact
    resized per-channel sums; the oracle replays the sampled pixel
    grid from the byte spec
    (`operators/multimodal.py:resize_ppm_stats`)."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    media = multimodal.synthetic_media(_table("documents")(spark, sf_dir))
    return multimodal.resize_ppm_stats(
        media.where(F.col("kind") == "image"), factor=2
    )


_RESIZE_PPM_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
dims AS (
  SELECT doc_id, w, h, (w + 1) // 2 AS nw, (h + 1) // 2 AS nh FROM img
),
grid AS (
  SELECT doc_id, w, h, nw, nh,
         3 * ((yy.i * 2) * w + (xx.i * 2)) AS j0
  FROM dims, unnest(range(0, nh)) AS yy(i), unnest(range(0, nw)) AS xx(i)
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS orig_w, CAST(h AS INT) AS orig_h,
       CAST(nw AS INT) AS new_w, CAST(nh AS INT) AS new_h,
       CAST(sum((doc_id * 7 + j0 * 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 7 + (j0 + 1) * 11) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 7 + (j0 + 2) * 11) % 256) AS BIGINT) AS sum_b
FROM grid GROUP BY doc_id, w, h, nw, nh
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


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

# Registry order is evidence policy: the round driver oracle-checks the
# FIRST 50 entries only (the full surface is covered by the local gate,
# scripts/check_correctness.py). Queries with no driver correctness row
# yet — plus any previously-red ones — are deliberately placed inside
# that window; multiply-green veterans cede their slots and keep local
# coverage.
QUERIES: dict[str, QueryFn] = {
    # ---- first-50 driver window (the round driver oracle-checks only
    # ---- the first 50 entries; everything else is gated by the local
    # ---- 3-SF sweep in scripts/check_correctness.py). Rounds 6-7
    # ---- added far more queries than one window holds, so the window
    # ---- carries the round-7 additions first, then the newest
    # ---- round-6 queries; the rest queue for a driver row in later
    # ---- rounds, with the triple-SF local sweep as their evidence.
    "last_touch": q_last_touch,
    "linear_attribution": q_linear_attribution,
    "length_band": q_length_band,
    "drift_series": q_drift_series,
    "threshold_calibration": q_threshold_calibration,
    "markov_absorption": q_markov_absorption,
    "embedding_dispersion": q_embedding_dispersion,
    "ljung_box": q_ljung_box,
    "engagement": q_engagement,
    "ams_f2": q_ams_f2,
    "hierarchy": q_hierarchy,
    "resize_ppm": q_resize_ppm,
    "strip_boilerplate": q_strip_boilerplate,
    "qq_quantiles": q_qq_quantiles,
    "cohort_ltv": q_cohort_ltv,
    "dollar_bars": q_dollar_bars,
    "forecast_eval": q_forecast_eval,
    "feature_matrix": q_feature_matrix,
    "holt_linear": q_holt_linear,
    "hashed_bow": q_hashed_bow,
    "balanced_downsample": q_balanced_downsample,
    "stream_rate_alert": q_stream_rate_alert,
    "cdc_apply": q_cdc_apply,
    "volume_bars": q_volume_bars,
    "knn_label_eval": q_knn_label_eval,
    "rolling_median": q_rolling_median,
    "ngram_containment": q_ngram_containment,
    "trending_terms": q_trending_terms,
    "session_pmi": q_session_pmi,
    "cluster_split": q_cluster_split,
    "spearman": q_spearman,
    "vpin": q_vpin,
    "kama": q_kama,
    "session_funnel": q_session_funnel,
    "mann_whitney": q_mann_whitney,
    "stream_bloom_dedup": q_stream_bloom_dedup,
    "gini": q_gini,
    "centroid_similarity": q_centroid_similarity,
    "audio_frames": q_audio_frames,
    "minhash_accuracy": q_minhash_accuracy,
    "corpus_report": q_corpus_report,
    "ichimoku": q_ichimoku,
    "pivot_points": q_pivot_points,
    "kaufman_er": q_kaufman_er,
    "vortex": q_vortex,
    "scd2_lookup": q_scd2_lookup,
    "funnel_windowed": q_funnel_windowed,
    "ks_drift": q_ks_drift,
    "psi_drift": q_psi_drift,
    "chi_square": q_chi_square,
    "random_projection": q_random_projection,
    # ---- below this line: outside the 50-slot driver window — the
    # ---- earlier round-7 batches and round-6 queries awaiting a
    # ---- driver row (the triple-SF local sweep is their evidence
    # ---- until then), then the multiply-green veterans
    "asof_tolerance": q_asof_tolerance,
    "event_pagerank": q_event_pagerank,
    "churn_weekly": q_churn_weekly,
    "bloom_prefilter": q_bloom_prefilter,
    "unpivot_daily": q_unpivot_daily,
    "charset_stats": q_charset_stats,
    "williams_r": q_williams_r,
    "roc_momentum": q_roc_momentum,
    "mfi": q_mfi,
    "cmf": q_cmf,
    "ulcer_index": q_ulcer_index,
    "keltner": q_keltner,
    "gap_stats": q_gap_stats,
    "aroon": q_aroon,
    "cci": q_cci,
    "vwap": q_vwap,
    "sharpe_sortino": q_sharpe_sortino,
    "var_cvar": q_var_cvar,
    "adx": q_adx,
    "pca_pc1": q_pca_pc1,
    "peak_concurrency": q_peak_concurrency,
    "hurst": q_hurst,
    "weighted_sample": q_weighted_sample,
    "conversion_latency": q_conversion_latency,
    "seasonal_decompose": q_seasonal_decompose,
    "stream_static_join": q_stream_static_join,
    "candle_patterns": q_candle_patterns,
    "skew_stats": q_skew_stats,
    "zorder_key": q_zorder_key,
    "resample_interp": q_resample_interp,
    "grouping_sets": q_grouping_sets,
    "bigram_lm": q_bigram_lm,
    "incremental_agg": q_incremental_agg,
    "stream_left_join": q_stream_left_join,
    "trimmed_mean": q_trimmed_mean,
    "fuzzy_join": q_fuzzy_join,
    "snapshot_diff": q_snapshot_diff,
    "pii_spans": q_pii_spans,
    "calendar_coverage": q_calendar_coverage,
    "incremental_neardup": q_incremental_neardup,
    "incremental_neardup_indexed": q_incremental_neardup_indexed,
    "rank_portfolio": q_rank_portfolio,
    "embedding_outliers": q_embedding_outliers,
    "excess_suppliers": q_excess_suppliers,
    "fk_integrity": q_fk_integrity,
    "pairs_spread": q_pairs_spread,
    "trend_ols": q_trend_ols,
    "ofi_bars": q_ofi_bars,
    "hhi_concentration": q_hhi_concentration,
    "abc_classes": q_abc_classes,
    "ann_recall": q_ann_recall,
    "readability": q_readability,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "event_study": q_event_study,
    "local_supplier_revenue": q_local_supplier_revenue,
    "cumulative_users": q_cumulative_users,
    "dau_wau": q_dau_wau,
    "min_cost_supplier": q_min_cost_supplier,
    "nation_profit": q_nation_profit,
    "important_stock": q_important_stock,
    "late_suppliers": q_late_suppliers,
    "synthetic_ohlcv": q_synthetic_ohlcv,
    "media_decode": q_media_decode,
    "stream_dedup": q_stream_dedup,
    "stream_interval_join": q_stream_interval_join,
    "stream_sessionize": q_stream_sessionize,
    "atr": q_atr,
    "obv": q_obv,
    "stochastic": q_stochastic,
    "stream_window_append": q_stream_window_append,
    "scd2_apply": q_scd2_apply,
    "data_expectations": q_data_expectations,
    "intraday_bars": q_intraday_bars,
    "event_transitions": q_event_transitions,
    "ohlcv_backfill": q_ohlcv_backfill,
    "knn_join": q_knn_join,
    "ivf_topk_indexed": q_ivf_topk_indexed,
    "dedup_corpus": q_dedup_corpus,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "sentence_dedup_stats": q_sentence_dedup_stats,
    "quality_filter": q_quality_filter,
    # ---- earlier round-6 additions (the first 6 stay inside the
    # ---- window; the rest rotated out when the newest batches landed)
    "donchian": q_donchian,
    "amihud": q_amihud,
    "return_autocorr": q_return_autocorr,
    "ohlc_volatility": q_ohlc_volatility,
    "return_streaks": q_return_streaks,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "order_priority_counts": q_order_priority_counts,
    "large_volume_customers": q_large_volume_customers,
    "disjunctive_revenue": q_disjunctive_revenue,
    "lexical_diversity": q_lexical_diversity,
    "zipf_slope": q_zipf_slope,
    "lang_balance_weights": q_lang_balance_weights,
    "rfm_scores": q_rfm_scores,
    "kmv_set_ops": q_kmv_set_ops,
    "stream_cusum": q_stream_cusum,
    "heikin_ashi": q_heikin_ashi,
    "embedding_quantize": q_embedding_quantize,
    "weekday_returns": q_weekday_returns,
    "silhouette": q_silhouette,
    "kyle_lambda": q_kyle_lambda,
    "corwin_schultz": q_corwin_schultz,
    "weekly_bars": q_weekly_bars,
    "momentum_rank": q_momentum_rank,
    "portfolio_index": q_portfolio_index,
    "lang_confusion": q_lang_confusion,
    "mad_anomalies": q_mad_anomalies,
    "underwater_spells": q_underwater_spells,
    "event_lift": q_event_lift,
    "session_paths": q_session_paths,
    "customer_distribution": q_customer_distribution,
    "forecast_revenue": q_forecast_revenue,
    "top_supplier": q_top_supplier,
    # ---- ... then the longest-unverified veterans (last driver row:
    # ---- round 4); round-5-verified queries cede their slots
    "daily_metrics": q_daily_metrics,
    "daily_metrics_window": q_daily_metrics_window,
    "daily_metrics_lineitem": q_daily_metrics_lineitem,
    "daily_returns": q_daily_returns,
    "topk_movers": q_topk_movers,
    "realtime_metrics": q_realtime_metrics,
    "stream_running_vwap": q_stream_running_vwap,
    "dedup_exact": q_dedup_exact,
    "dedup_keep_last": q_dedup_keep_last,
    "dedup_minhash_pairs": q_dedup_minhash_pairs,
    "neardup_clusters": q_neardup_clusters,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash": q_simhash,
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "region_revenue": q_region_revenue,
    "shipping_priority": q_shipping_priority,
    "merge_upsert": q_merge_upsert,
    "asof_join": q_asof_join,
    "set_ops": q_set_ops,
    "pivot_event_counts": q_pivot_event_counts,
    "rollup_event_value": q_rollup_event_value,
    "cube_event_value": q_cube_event_value,
    "active_users_hourly": q_active_users_hourly,
    "salted_agg": q_salted_agg,
    "salted_join": q_salted_join,
    "range_join_bands": q_range_join_bands,
    "cascade_rollup": q_cascade_rollup,
    "topk_days_per_symbol": q_topk_days_per_symbol,
    "value_quantiles": q_value_quantiles,
    "winsorize": q_winsorize,
    "cosine_topk": q_cosine_topk,
    "ann_topk": q_ann_topk,
    "ivf_topk": q_ivf_topk,
    "embedding_neardup_pairs": q_embedding_neardup_pairs,
    "term_stats": q_term_stats,
    "chunk_documents": q_chunk_documents,
    "stratified_sample": q_stratified_sample,
    "lang_id": q_lang_id,
    # ---- position 51+: local gate only this round (stable veterans:
    # ---- pure-projection r4 queries, then the full round-5-green set)
    "tick_cast": q_tick_cast,
    "normalize_symbol": q_normalize_symbol,
    "date_parts": q_date_parts,
    "json_field": q_json_field,
    "text_stats": q_text_stats,
    "token_count": q_token_count,
    "hash_split": q_hash_split,
    "sessionize": q_sessionize,
    "stream_realtime_metrics": q_stream_realtime_metrics,
    "doc_fingerprint": q_doc_fingerprint,
    "media_features": q_media_features,
    "kafka_decode": q_kafka_decode,
    "partitioned_scan": q_partitioned_scan,
    "pii_redact": q_pii_redact,
    "tfidf_top_terms": q_tfidf_top_terms,
    "decontaminate": q_decontaminate,
    "token_pack": q_token_pack,
    "token_pack_greedy": q_token_pack_greedy,
    "domain_cap": q_domain_cap,
    "embedding_centroids": q_embedding_centroids,
    "kmeans_step": q_kmeans_step,
    "sma_crossover": q_sma_crossover,
    "bollinger": q_bollinger,
    "rsi": q_rsi,
    "drawdown": q_drawdown,
    "realized_volatility": q_realized_volatility,
    "pairwise_correlation": q_pairwise_correlation,
    "ema_macd": q_ema_macd,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "first_touch": q_first_touch,
    "volume_rank": q_volume_rank,
    "repetition_stats": q_repetition_stats,
    "kmv_distinct": q_kmv_distinct,
    "customer_order_counts": q_customer_order_counts,
    "promo_revenue": q_promo_revenue,
    "supplier_type_counts": q_supplier_type_counts,
    "returned_item_revenue": q_returned_item_revenue,
    "small_quantity_revenue": q_small_quantity_revenue,
    "idle_rich_customers": q_idle_rich_customers,
    "stream_ema": q_stream_ema,
    "twap": q_twap,
    "value_histogram": q_value_histogram,
    "zscore_anomalies": q_zscore_anomalies,
    "profile_events": q_profile_events,
    "tick_gaps": q_tick_gaps,
    "resample_ffill": q_resample_ffill,
    "daily_extreme_times": q_daily_extreme_times,
    "tick_rule": q_tick_rule,
    "rolling_beta": q_rolling_beta,
    "benford_digits": q_benford_digits,
    "interarrival_stats": q_interarrival_stats,
    "duplicate_ticks": q_duplicate_ticks,
    "intraday_vol": q_intraday_vol,
    "roll_spread": q_roll_spread,
    "cosine_topk_fast": q_cosine_topk_fast,
    "provider_normalize": q_provider_normalize,
}

ORACLES: dict[str, str] = {
    "last_touch": _LAST_TOUCH_ORACLE,
    "linear_attribution": _LINEAR_ATTRIBUTION_ORACLE,
    "length_band": _LENGTH_BAND_ORACLE,
    "drift_series": _DRIFT_SERIES_ORACLE,
    "threshold_calibration": _threshold_calibration_oracle(),
    "markov_absorption": _markov_absorption_oracle(),
    "embedding_dispersion": _EMBEDDING_DISPERSION_ORACLE,
    "ljung_box": _ljung_box_oracle(),
    "engagement": _engagement_oracle(),
    "ams_f2": _ams_f2_oracle(),
    "hierarchy": _HIERARCHY_ORACLE,
    "resize_ppm": _RESIZE_PPM_ORACLE,
    "strip_boilerplate": _STRIP_BOILERPLATE_ORACLE,
    "qq_quantiles": _qq_oracle(),
    "cohort_ltv": _COHORT_LTV_ORACLE,
    "dollar_bars": _DOLLAR_BARS_ORACLE,
    "forecast_eval": _forecast_eval_oracle(),
    "feature_matrix": _FEATURE_MATRIX_ORACLE,
    "holt_linear": _holt_oracle(),
    "hashed_bow": _HASHED_BOW_ORACLE,
    "balanced_downsample": _balanced_downsample_oracle(),
    "stream_rate_alert": _STREAM_RATE_ALERT_ORACLE,
    "cdc_apply": _CDC_APPLY_ORACLE,
    "volume_bars": _VOLUME_BARS_ORACLE,
    "knn_label_eval": _knn_label_eval_oracle(),
    "rolling_median": _ROLLING_MEDIAN_ORACLE,
    "ngram_containment": _CONTAINMENT_ORACLE,
    "trending_terms": _TRENDING_ORACLE,
    "session_pmi": _session_pmi_oracle(),
    "cluster_split": _cluster_split_oracle(),
    "spearman": _SPEARMAN_ORACLE,
    "vpin": _VPIN_ORACLE,
    "kama": _kama_oracle(),
    "session_funnel": _SESSION_FUNNEL_ORACLE,
    "mann_whitney": _MANN_WHITNEY_ORACLE,
    "stream_bloom_dedup": _STREAM_BLOOM_DEDUP_ORACLE,
    "gini": _GINI_ORACLE,
    "centroid_similarity": _CENTROID_SIM_ORACLE,
    "audio_frames": _AUDIO_FRAMES_ORACLE,
    "minhash_accuracy": _minhash_accuracy_oracle(),
    "corpus_report": _corpus_report_oracle(),
    "ichimoku": _ICHIMOKU_ORACLE,
    "pivot_points": _PIVOT_POINTS_ORACLE,
    "kaufman_er": _KAUFMAN_ORACLE,
    "vortex": _VORTEX_ORACLE,
    "scd2_lookup": _SCD2_LOOKUP_ORACLE,
    "funnel_windowed": _FUNNEL_WINDOWED_ORACLE,
    "ks_drift": _KS_ORACLE,
    "psi_drift": _PSI_ORACLE,
    "chi_square": _CHI2_ORACLE,
    "random_projection": _RANDOM_PROJECTION_ORACLE,
    "asof_tolerance": _ASOF_TOLERANCE_ORACLE,
    "event_pagerank": behavior.pagerank_sql(
        behavior.transition_edges_sql("events"), damping=0.85, n_iter=5
    ),
    "churn_weekly": _CHURN_ORACLE,
    "bloom_prefilter": _BLOOM_ORACLE,
    "unpivot_daily": _UNPIVOT_ORACLE,
    "charset_stats": _CHARSET_ORACLE,
    "williams_r": _WILLIAMS_ORACLE,
    "roc_momentum": _ROC_ORACLE,
    "mfi": _MFI_ORACLE,
    "cmf": _CMF_ORACLE,
    "ulcer_index": _ULCER_ORACLE,
    "keltner": _KELTNER_ORACLE,
    "gap_stats": _GAP_ORACLE,
    "aroon": _AROON_ORACLE,
    "cci": _CCI_ORACLE,
    "vwap": _VWAP_ORACLE,
    "sharpe_sortino": _SHARPE_SORTINO_ORACLE,
    "var_cvar": _VAR_CVAR_ORACLE,
    "adx": _adx_oracle(14),
    "pca_pc1": _pca_oracle(3, 64),
    "peak_concurrency": _peak_concurrency_oracle(),
    "hurst": _hurst_oracle((4, 8, 16)),
    "weighted_sample": _WEIGHTED_SAMPLE_ORACLE,
    "conversion_latency": _CONVERSION_LATENCY_ORACLE,
    "seasonal_decompose": _SEASONAL_ORACLE,
    "stream_static_join": _STREAM_STATIC_ORACLE,
    "candle_patterns": _CANDLE_ORACLE,
    "skew_stats": _SKEW_STATS_ORACLE,
    "zorder_key": _zorder_oracle(8),
    "resample_interp": _RESAMPLE_INTERP_ORACLE,
    "grouping_sets": _GROUPING_SETS_ORACLE,
    "bigram_lm": _BIGRAM_LM_ORACLE,
    "incremental_agg": _INCREMENTAL_AGG_ORACLE,
    "stream_left_join": _STREAM_LEFT_JOIN_ORACLE,
    "trimmed_mean": _TRIMMED_MEAN_ORACLE,
    "fuzzy_join": _FUZZY_JOIN_ORACLE,
    "snapshot_diff": _SNAPSHOT_DIFF_ORACLE,
    "pii_spans": _PII_SPANS_ORACLE,
    "calendar_coverage": _CALENDAR_COVERAGE_ORACLE,
    "incremental_neardup": _incremental_neardup_oracle(),
    "incremental_neardup_indexed": _incremental_neardup_oracle(),
    "rank_portfolio": _RANK_PORTFOLIO_ORACLE,
    "embedding_outliers": _EMBEDDING_OUTLIERS_ORACLE,
    "excess_suppliers": _EXCESS_SUPPLIERS_ORACLE,
    "fk_integrity": _FK_INTEGRITY_ORACLE,
    "pairs_spread": _PAIRS_SPREAD_ORACLE,
    "trend_ols": _TREND_OLS_ORACLE,
    "ofi_bars": _OFI_BARS_ORACLE,
    "hhi_concentration": _HHI_ORACLE,
    "abc_classes": _ABC_ORACLE,
    "ann_recall": _ann_recall_oracle(),
    "readability": _READABILITY_ORACLE,
    "cms_heavy_hitters": _CMS_ORACLE,
    "event_study": _EVENT_STUDY_ORACLE,
    "local_supplier_revenue": _LOCAL_SUPPLIER_ORACLE,
    "cumulative_users": _CUMULATIVE_USERS_ORACLE,
    "dau_wau": _DAU_WAU_ORACLE,
    "min_cost_supplier": _MIN_COST_SUPPLIER_ORACLE,
    "nation_profit": _NATION_PROFIT_ORACLE,
    "important_stock": _IMPORTANT_STOCK_ORACLE,
    "late_suppliers": _LATE_SUPPLIERS_ORACLE,
    "daily_metrics": _DAILY_EVENTS_ORACLE,
    "daily_metrics_window": _DAILY_EVENTS_ORACLE,
    "daily_metrics_lineitem": _DAILY_LINEITEM_ORACLE,
    "daily_returns": _DAILY_RETURNS_ORACLE,
    "topk_movers": _TOPK_ORACLE,
    "realtime_metrics": _REALTIME_ORACLE,
    "stream_realtime_metrics": _REALTIME_ORACLE,
    "stream_running_vwap": """
SELECT event_type AS symbol,
       CAST(count(*) AS DOUBLE) AS total_volume,
       count(*) AS n_events
FROM events GROUP BY 1
""",
    "dedup_exact": _DEDUP_EXACT_ORACLE,
    "dedup_keep_last": _KEEP_LAST_ORACLE,
    "dedup_minhash_pairs": _MINHASH_ORACLE,
    "neardup_clusters": _NEARDUP_CLUSTERS_ORACLE,
    "ngram_jaccard_pairs": _JACCARD_ORACLE,
    "simhash": _simhash_oracle(),
    "tick_cast": _TICK_CAST_ORACLE,
    "normalize_symbol": _NORMALIZE_ORACLE,
    "date_parts": _DATE_PARTS_ORACLE,
    "json_field": _JSON_ORACLE,
    "pricing_summary": _PRICING_ORACLE,
    "top_customers": _TOP_CUSTOMERS_ORACLE,
    "region_revenue": _REGION_REVENUE_ORACLE,
    "shipping_priority": _SHIPPING_PRIORITY_ORACLE,
    "merge_upsert": _MERGE_ORACLE,
    "asof_join": _ASOF_ORACLE,
    "set_ops": _SET_OPS_ORACLE,
    "pivot_event_counts": _PIVOT_ORACLE,
    "rollup_event_value": _ROLLUP_ORACLE,
    "cube_event_value": _CUBE_ORACLE,
    "active_users_hourly": _ACTIVE_USERS_ORACLE,
    "salted_agg": _SALTED_AGG_ORACLE,
    "salted_join": _SALTED_JOIN_ORACLE,
    "range_join_bands": _RANGE_JOIN_ORACLE,
    "cascade_rollup": _CASCADE_ROLLUP_ORACLE,
    "sessionize": _SESSIONIZE_ORACLE,
    "topk_days_per_symbol": _TOPK_PER_GROUP_ORACLE,
    "value_quantiles": _QUANTILES_ORACLE,
    "winsorize": _WINSORIZE_ORACLE,
    "cosine_topk": _COSINE_TOPK_ORACLE,
    "cosine_topk_fast": _COSINE_TOPK_FAST_ORACLE,
    "provider_normalize": _PROVIDER_NORMALIZE_ORACLE,
    "ohlcv_backfill": _OHLCV_BACKFILL_ORACLE,
    "knn_join": _knn_join_oracle(),
    "ivf_topk_indexed": _ivf_topk_oracle(),
    "dedup_corpus": _DEDUP_CORPUS_ORACLE,
    "simhash_neardup_pairs": _simhash_neardup_oracle(),
    "sentence_dedup_stats": _SENTENCE_DEDUP_ORACLE,
    "quality_filter": _QUALITY_FILTER_ORACLE,
    "ann_topk": _ann_topk_oracle(),
    "ivf_topk": _ivf_topk_oracle(),
    "embedding_neardup_pairs": _embedding_neardup_oracle(),
    "synthetic_ohlcv": _SYNTHETIC_OHLCV_ORACLE,
    "text_stats": _TEXT_STATS_ORACLE,
    "token_count": _TOKEN_COUNT_ORACLE,
    "term_stats": _TERM_STATS_ORACLE,
    "chunk_documents": _CHUNK_ORACLE,
    "hash_split": _hash_split_oracle(),
    "stratified_sample": _stratified_sample_oracle(),
    "lang_id": _lang_id_oracle(),
    "doc_fingerprint": _FINGERPRINT_ORACLE,
    "media_features": _media_features_oracle(),
    "media_decode": _MEDIA_DECODE_ORACLE,
    "kafka_decode": _KAFKA_DECODE_ORACLE,
    "partitioned_scan": _PARTITIONED_SCAN_ORACLE,
    "pii_redact": _PII_ORACLE,
    "tfidf_top_terms": _TFIDF_ORACLE,
    "decontaminate": _DECONTAMINATE_ORACLE,
    "token_pack": _TOKEN_PACK_ORACLE,
    "token_pack_greedy": _TOKEN_PACK_GREEDY_ORACLE,
    "domain_cap": _DOMAIN_CAP_ORACLE,
    "embedding_centroids": _EMBEDDING_CENTROIDS_ORACLE,
    "kmeans_step": _kmeans_step_oracle(),
    "sma_crossover": _SMA_CROSSOVER_ORACLE,
    "bollinger": _BOLLINGER_ORACLE,
    "rsi": _RSI_ORACLE,
    "drawdown": _DRAWDOWN_ORACLE,
    "realized_volatility": _VOLATILITY_ORACLE,
    "pairwise_correlation": _PAIRWISE_CORR_ORACLE,
    "ema_macd": _EMA_MACD_ORACLE,
    "funnel_conversion": _FUNNEL_ORACLE,
    "cohort_retention": _COHORT_ORACLE,
    "first_touch": _FIRST_TOUCH_ORACLE,
    "volume_rank": _VOLUME_RANK_ORACLE,
    "repetition_stats": _REPETITION_ORACLE,
    "kmv_distinct": _kmv_oracle(),
    "customer_order_counts": _CUSTOMER_ORDER_COUNTS_ORACLE,
    "promo_revenue": _PROMO_REVENUE_ORACLE,
    "supplier_type_counts": _SUPPLIER_TYPE_COUNTS_ORACLE,
    "returned_item_revenue": _RETURNED_ITEM_REVENUE_ORACLE,
    "small_quantity_revenue": _SMALL_QUANTITY_ORACLE,
    "idle_rich_customers": _IDLE_RICH_ORACLE,
    "stream_ema": _STREAM_EMA_ORACLE,
    "stream_dedup": _STREAM_DEDUP_ORACLE,
    "stream_interval_join": _STREAM_INTERVAL_JOIN_ORACLE,
    "stream_sessionize": _STREAM_SESSIONIZE_ORACLE,
    "atr": _ATR_ORACLE,
    "obv": _OBV_ORACLE,
    "stochastic": _STOCHASTIC_ORACLE,
    "stream_window_append": _STREAM_WINDOW_APPEND_ORACLE,
    "scd2_apply": _SCD2_ORACLE,
    "data_expectations": _DATA_EXPECTATIONS_ORACLE,
    "intraday_bars": _INTRADAY_BARS_ORACLE,
    "event_transitions": _EVENT_TRANSITIONS_ORACLE,
    "twap": _TWAP_ORACLE,
    "value_histogram": _VALUE_HISTOGRAM_ORACLE,
    "zscore_anomalies": _ZSCORE_ORACLE,
    "profile_events": _profile_oracle(),
    "tick_gaps": _TICK_GAPS_ORACLE,
    "resample_ffill": _RESAMPLE_FFILL_ORACLE,
    "daily_extreme_times": _DAILY_EXTREME_TIMES_ORACLE,
    "tick_rule": _TICK_RULE_ORACLE,
    "rolling_beta": _ROLLING_BETA_ORACLE,
    "benford_digits": _BENFORD_ORACLE,
    "interarrival_stats": _INTERARRIVAL_ORACLE,
    "duplicate_ticks": _DUPLICATE_TICKS_ORACLE,
    "intraday_vol": _INTRADAY_VOL_ORACLE,
    "roll_spread": _ROLL_SPREAD_ORACLE,
    "donchian": _DONCHIAN_ORACLE,
    "amihud": _AMIHUD_ORACLE,
    "return_autocorr": _AUTOCORR_ORACLE,
    "ohlc_volatility": _OHLC_VOL_ORACLE,
    "return_streaks": _STREAKS_ORACLE,
    "volume_shipping": _VOLUME_SHIPPING_ORACLE,
    "market_share": _MARKET_SHARE_ORACLE,
    "order_priority_counts": _ORDER_PRIORITY_ORACLE,
    "customer_distribution": _CUSTOMER_DISTRIBUTION_ORACLE,
    "large_volume_customers": _LARGE_VOLUME_ORACLE,
    "disjunctive_revenue": _DISJUNCTIVE_REVENUE_ORACLE,
    "lexical_diversity": _LEXICAL_DIVERSITY_ORACLE,
    "zipf_slope": _ZIPF_ORACLE,
    "lang_balance_weights": _LANG_BALANCE_ORACLE,
    "rfm_scores": _RFM_ORACLE,
    "kmv_set_ops": _kmv_setops_oracle(),
    "stream_cusum": _stream_cusum_oracle(),
    "heikin_ashi": _HEIKIN_ASHI_ORACLE,
    "embedding_quantize": _EMBEDDING_QUANTIZE_ORACLE,
    "weekday_returns": _WEEKDAY_RETURNS_ORACLE,
    "silhouette": _SILHOUETTE_ORACLE,
    "kyle_lambda": _KYLE_LAMBDA_ORACLE,
    "corwin_schultz": _CORWIN_SCHULTZ_ORACLE,
    "weekly_bars": _WEEKLY_BARS_ORACLE,
    "momentum_rank": _MOMENTUM_RANK_ORACLE,
    "portfolio_index": _PORTFOLIO_INDEX_ORACLE,
    "lang_confusion": _lang_confusion_oracle(),
    "mad_anomalies": _MAD_ANOMALIES_ORACLE,
    "underwater_spells": _UNDERWATER_ORACLE,
    "event_lift": _EVENT_LIFT_ORACLE,
    "session_paths": _SESSION_PATHS_ORACLE,
    "forecast_revenue": _FORECAST_REVENUE_ORACLE,
    "top_supplier": _TOP_SUPPLIER_ORACLE,
}
