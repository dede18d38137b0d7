"""Daily OHLCV metrics — the reference's batch core, Spark-first.

Reference semantics: `/root/reference/src/spark/jobs/spark_batch_processor.py:81-101`
computes per-(symbol, date) open/high/low/close/volume with *unordered*
window functions over already-deduplicated rows (W1–W5 in SURVEY.md §2.5),
then `daily_change = (close-open)/open*100` (`:100-101`).

Two fixes over the reference, per SURVEY.md §2.5:

1. ``first``/``last`` are ordered here (by event time + a unique
   tiebreaker), so results are deterministic when multiple rows per
   (symbol, date) exist — the reference's unordered window makes them
   partition-layout-dependent.
2. The groupBy form replaces the window-function-over-deduped-rows
   shape: one shuffle with map-side partial aggregation instead of a
   window sort — the plan that survives a 100 TB scale-up. The
   window-function variant is kept (`daily_metrics_window`) for the
   true multi-tick resampling case and for W1–W5 parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.functions.cleaning import pct_change


def _volume_agg(volume_col: str | None) -> F.Column:
    """``sum(volume)`` per the reference (W4/A1,
    `spark_batch_processor.py:97`, `spark_stream_processor.py:172`);
    falls back to a row count only when the dataset has no volume
    column (e.g. the driver's ``events`` table). The sum runs over an
    exact DECIMAL view of the column so it is order-independent —
    plans can re-partition freely at 100 TB without changing results —
    and is cast back to BIGINT (driver volumes are integral).
    """
    if volume_col is None:
        return F.count(F.lit(1))
    return F.sum(F.col(volume_col).cast("decimal(18,4)")).cast("bigint")


def daily_metrics(
    ticks: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str | None = None,
    volume_col: str | None = None,
) -> DataFrame:
    """Per-(symbol, date) OHLC + volume + daily change, one shuffle.

    ``min_by``/``max_by`` against a (ts, id) struct give ordered
    first/last with full map-side partial aggregation — no window sort,
    no second exchange. ``id_col`` breaks event-time ties
    deterministically.
    """
    ord_key = (
        F.struct(F.col(ts_col), F.col(id_col)) if id_col else F.struct(F.col(ts_col))
    )
    out = (
        ticks.groupBy(
            F.col(symbol_col).alias("symbol"), F.to_date(ts_col).alias("date")
        )
        .agg(
            F.round(F.min_by(price_col, ord_key), 4).alias("daily_open"),
            F.round(F.max(price_col), 4).alias("daily_high"),
            F.round(F.min(price_col), 4).alias("daily_low"),
            F.round(F.max_by(price_col, ord_key), 4).alias("daily_close"),
            _volume_agg(volume_col).alias("daily_volume"),
            pct_change(
                F.min_by(price_col, ord_key), F.max_by(price_col, ord_key)
            ).alias("daily_change"),
        )
    )
    return out


def daily_metrics_window(
    ticks: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str | None = None,
    volume_col: str | None = None,
) -> DataFrame:
    """W1–W5 as ordered window functions (the reference's shape, made
    deterministic), collapsed with DISTINCT. Semantically identical to
    `daily_metrics`; kept for parity with
    `spark_batch_processor.py:90-99` and for pipelines that need the
    per-row intermediate."""
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = (
        Window.partitionBy(F.col(symbol_col), F.to_date(ts_col))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    vol = (
        F.sum(F.col(volume_col).cast("decimal(18,4)")).over(w).cast("bigint")
        if volume_col
        else F.count(F.lit(1)).over(w)
    )
    enriched = ticks.select(
        F.col(symbol_col).alias("symbol"),
        F.to_date(ts_col).alias("date"),
        F.round(F.first(price_col).over(w), 4).alias("daily_open"),
        F.round(F.max(price_col).over(w), 4).alias("daily_high"),
        F.round(F.min(price_col).over(w), 4).alias("daily_low"),
        F.round(F.last(price_col).over(w), 4).alias("daily_close"),
        vol.alias("daily_volume"),
        pct_change(F.first(price_col).over(w), F.last(price_col).over(w)).alias(
            "daily_change"
        ),
    )
    return enriched.distinct()


def topk_movers(daily: DataFrame, k: int = 10) -> DataFrame:
    """Top-k |daily_change| movers — the `row_number` extension SURVEY.md
    §2.6 calls out (the reference has no orderBy/limit in persisted
    outputs). Ordering is made total (symbol, date tiebreak) so the
    result set is deterministic."""
    return (
        daily.orderBy(
            F.abs(F.col("daily_change")).desc(), F.col("symbol"), F.col("date")
        )
        .limit(k)
    )


def daily_returns(
    ticks: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str | None = None,
    volume_col: str | None = None,
) -> DataFrame:
    """Day-over-day return per symbol: previous close via ``lag``, the
    return in percent, and a cumulative traded-volume running sum —
    the classic sequential-window trio over the (already tiny)
    daily_metrics output.

    Scale: the window partitions by symbol over *daily* rows
    (symbols × days, not ticks), so the sort under ``lag`` touches a
    frame that is ~6 orders of magnitude smaller than the input at
    100 TB. The running volume sum is integer arithmetic (exact); the
    return division is a single IEEE op on already-rounded closes —
    both engine-portable.
    """
    d = daily_metrics(ticks, symbol_col, ts_col, price_col, id_col, volume_col)
    w = Window.partitionBy("symbol").orderBy("date")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("daily_close").over(w)
    return d.select(
        "symbol",
        "date",
        "daily_close",
        prev.alias("prev_close"),
        F.when(prev != 0, (F.col("daily_close") / prev - 1) * 100).alias(
            "return_pct"
        ),
        F.sum("daily_volume").over(wc).alias("cum_volume"),
    )


def twap_daily(
    ticks: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str | None = None,
) -> DataFrame:
    """Per-(symbol, day) time-weighted average price: each tick's price
    is weighted by its holding time (microseconds until the next tick
    of the same symbol-day; the last tick carries no weight, so the
    integral runs first→last tick).

    Exactness: weights are integer microseconds, prices are quantized
    to 6 decimals, and the weighted sum runs in DECIMAL — the single
    closing division is the only float op, so the result is
    partition-independent and replayable in SQL. Days whose total
    weight is zero (one tick, or all ticks on one timestamp) fall back
    to the exact unweighted mean.

    One window pass (lead) and one aggregation, both on the same
    (symbol, day) keys.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    day = F.to_date(ts_col)
    w = Window.partitionBy(F.col(symbol_col), day).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    weight = F.lead(us).over(w) - us
    pq = F.round(F.col(price_col), 6).cast("decimal(18,6)")
    base = ticks.select(
        F.col(symbol_col).alias("symbol"),
        day.alias("date"),
        pq.alias("pq"),
        F.coalesce(weight, F.lit(0)).alias("w_us"),
    )
    sum_w = F.sum("w_us")
    # weight enters the product as DECIMAL(18,0) so both engines stay in
    # exact decimal arithmetic (a raw BIGINT operand would promote the
    # product differently across engines)
    wavg = (
        F.sum(F.col("pq") * F.col("w_us").cast("decimal(18,0)")).cast("double")
        / sum_w
    )
    mean = F.sum("pq").cast("double") / F.count(F.lit(1))
    return base.groupBy("symbol", "date").agg(
        F.round(F.when(sum_w > 0, wavg).otherwise(mean), 6).alias("twap"),
        sum_w.alias("span_us"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def daily_extreme_times(
    ticks: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str | None = None,
) -> DataFrame:
    """Per-(symbol, day) high/low *with the time each extreme printed*
    — the argmax companion to ``daily_metrics`` (the reference stops at
    the extreme values themselves, `spark_batch_processor.py:88-96`).

    Ties are deterministic: the *earliest* tick at the extreme price
    wins (then smallest ``id_col``). Implemented as plain ``min``/
    ``max`` over an ordering struct — (price, -micros) maximized picks
    max price then min time — so the whole operator is one groupBy
    with full map-side partial aggregation: no window sort over raw
    ticks, no second exchange, the argmax shape that survives 100 TB.
    """
    us = F.unix_micros(F.col(ts_col))
    tie = [F.col(id_col)] if id_col else []
    pq = F.round(F.col(price_col), 6).alias("p")
    hi_key = F.struct(pq, (-us).alias("nus"), *tie, F.col(ts_col).alias("ts"))
    lo_key = F.struct(pq, us.alias("us"), *tie, F.col(ts_col).alias("ts"))
    out = ticks.groupBy(
        F.col(symbol_col).alias("symbol"), F.to_date(ts_col).alias("date")
    ).agg(
        F.max(hi_key).alias("__hi"),
        F.min(lo_key).alias("__lo"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    return out.select(
        "symbol",
        "date",
        F.col("__hi")["p"].alias("daily_high"),
        F.col("__hi")["ts"].alias("high_ts"),
        F.col("__lo")["p"].alias("daily_low"),
        F.col("__lo")["ts"].alias("low_ts"),
        "n_ticks",
    )


def backfill_ohlcv_calendar(
    df: DataFrame,
    symbol_col: str = "symbol",
    date_col: str = "date",
) -> DataFrame:
    """Densify a daily OHLCV table onto each symbol's full calendar
    (min..max date), synthesizing carry-forward rows for missing days:
    close forward-filled from the last traded day, open/high/low set to
    that carried close, volume 0, flagged ``is_backfilled`` — the gap
    handling the reference's yfinance backfill loop left implicit
    (`batch_data_producer.py:65-98` refetches whole periods; a
    warehouse consumer still sees holes on non-traded days).

    Scale: the calendar skeleton is built from a per-symbol min/max
    aggregate (|symbols| rows — map-side partial agg, tiny shuffle),
    exploded to one row per (symbol, calendar day), then left-joined
    back on (symbol, date) and forward-filled with a per-symbol ordered
    window. Every shuffle is keyed by symbol (+date); per-symbol window
    size is bounded by the calendar span, not the corpus.
    """
    cal = (
        df.groupBy(symbol_col)
        .agg(F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1"))
        .select(
            F.col(symbol_col),
            F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(date_col),
        )
    )
    joined = cal.join(df, [symbol_col, date_col], "left")
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("close", ignorenulls=True).over(w)
    return joined.select(
        F.col(symbol_col),
        F.col(date_col),
        F.coalesce("open", carried).alias("open"),
        F.coalesce("high", carried).alias("high"),
        F.coalesce("low", carried).alias("low"),
        carried.alias("close"),
        F.coalesce("volume", F.lit(0)).alias("volume"),
        F.col("close").isNull().alias("is_backfilled"),
    )


def intraday_bars(
    ticks: DataFrame,
    bar_seconds: int = 300,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str | None = None,
    volume_col: str | None = None,
) -> DataFrame:
    """Intraday OHLCV bars: :func:`daily_metrics` resampled to fixed
    ``bar_seconds`` buckets (default 5-minute bars) — the chart-feed
    resolution between raw ticks and the daily rollup.

    The bar key is epoch-bucket arithmetic
    (``floor(unix_micros/bar_µs)``), the same portable form the
    realtime-metrics oracle uses — not ``F.window``, whose struct
    output the SQL side can't replay directly. Same one-shuffle
    ``min_by``/``max_by`` shape as the daily rollup: full map-side
    partial aggregation, no window sort, deterministic (ts, id)
    tie-break.
    """
    bar_us = bar_seconds * 1_000_000
    # pure integer bucket: epoch µs (~1.7e15) through a double division
    # could mis-floor one ulp below a bar boundary
    us = F.unix_micros(F.col(ts_col))
    bar_start = F.timestamp_micros(us - us % bar_us)
    ord_key = (
        F.struct(F.col(ts_col), F.col(id_col)) if id_col else F.struct(F.col(ts_col))
    )
    return ticks.groupBy(
        F.col(symbol_col).alias("symbol"), bar_start.alias("bar_start")
    ).agg(
        F.round(F.min_by(price_col, ord_key), 4).alias("open"),
        F.round(F.max(price_col), 4).alias("high"),
        F.round(F.min(price_col), 4).alias("low"),
        F.round(F.max_by(price_col, ord_key), 4).alias("close"),
        _volume_agg(volume_col).alias("volume"),
    )


def seasonal_decompose(
    daily: DataFrame,
    window_rows: int = 7,
    symbol_col: str = "symbol",
    date_col: str = "date",
    close_col: str = "daily_close",
) -> DataFrame:
    """Classical additive decomposition of the daily close into
    trend + weekday seasonality + residual:

    - **trend**: centered ``window_rows``-row moving average (full
      frames only — edge rows are dropped, the textbook convention);
    - **seasonal**: per-(symbol, ISO weekday) exact mean of the
      detrended series;
    - **resid**: what neither explains.

    All three components are decimal-exact (quantize → DECIMAL sum →
    one division) and round to 4, so ``close = trend + seasonal +
    resid + (seasonal-mean rounding)`` replays bitwise in any engine.

    Scale: one symbol-partitioned window (O(window) state) and one
    (symbol × 7)-row aggregate broadcast back — a single fact shuffle.
    """
    half = window_rows // 2
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(date_col)
        .rowsBetween(-half, half)
    )
    cnt = F.count(F.lit(1)).over(w)
    trend = F.round(
        F.sum(F.col(close_col).cast("decimal(18,6)")).over(w).cast("double")
        / cnt,
        4,
    )
    base = daily.select(
        F.col(symbol_col).alias("symbol"),
        F.col(date_col).alias("date"),
        F.col(close_col).alias("close"),
        (F.weekday(date_col) + F.lit(1)).alias("iso_weekday"),
        F.when(cnt == window_rows, trend).alias("trend"),
    ).where(F.col("trend").isNotNull())
    det = base.withColumn(
        "detrended", F.round(F.col("close") - F.col("trend"), 4)
    )
    seas = det.groupBy("symbol", "iso_weekday").agg(
        F.round(
            F.sum(F.col("detrended").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("seasonal")
    )
    return (
        det.join(F.broadcast(seas), ["symbol", "iso_weekday"])
        .select(
            "symbol",
            "date",
            "close",
            "trend",
            "seasonal",
            F.round(F.col("detrended") - F.col("seasonal"), 4).alias("resid"),
        )
    )


def vwap_daily(
    ticks: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    volume_col: str = "volume",
) -> DataFrame:
    """Per-(symbol, day) volume-weighted average price — the
    true-volume companion of :func:`twap_daily` (with unit volumes
    the two coincide with the plain mean).

    Exactness: price enters as DECIMAL(18,6) and volume as
    DECIMAL(12,2), so the flow product (DECIMAL(31,8)) and both sums
    accumulate exactly in int128 on every engine; the single closing
    division is the only float op. Zero-volume days fall back to the
    exact unweighted mean so the row is never NULL for a day that
    traded.

    Scale: pure map-side products then one (symbol, day) aggregation
    with map-side partial combine — one shuffle carrying three
    accumulators per group, no windows.
    """
    day = F.to_date(ts_col)
    pq = F.round(F.col(price_col), 6).cast("decimal(18,6)")
    vq = F.col(volume_col).cast("decimal(12,2)")
    base = ticks.select(
        F.col(symbol_col).alias("symbol"),
        day.alias("date"),
        pq.alias("pq"),
        vq.alias("vq"),
    )
    sum_v = F.sum("vq")
    wavg = F.sum(F.col("pq") * F.col("vq")).cast("double") / sum_v.cast(
        "double"
    )
    mean = F.sum("pq").cast("double") / F.count(F.lit(1))
    return base.groupBy("symbol", "date").agg(
        F.round(F.when(sum_v > 0, wavg).otherwise(mean), 6).alias("vwap"),
        sum_v.cast("double").alias("total_volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


def volume_bars(
    ticks: DataFrame,
    bar_volume: int,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    volume_col: str = "volume",
    id_col: str = "id",
    volume_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Volume bars (López de Prado's information-driven bars): per
    symbol, ticks accumulate into a bar until ~``bar_volume`` units
    have traded, then the next bar opens — so bar frequency tracks
    ACTIVITY, not the clock, and per-bar return distributions are
    closer to IID than time bars. Bar id = ⌊exclusive-prefix-volume /
    bar_volume⌋ over the total (ts, id) order; a tick belongs to the
    bar its first unit lands in (bars can slightly overshoot —
    ticks are atomic).

    Exactness: the prefix volume is an exact DECIMAL running sum; the
    bar ordinal is one double division of that exact value (≤2^53,
    lossless) floored identically on every engine; OHLC picks are
    struct min_by/max_by over the same total order (the
    :func:`daily_metrics` idiom — deterministic ties).

    Shape: one symbol shuffle; running-sum window and the (symbol,
    bar) groupBy share the partition sort, map-side partials carry
    six accumulators per bar.
    """
    # the order must be RESULT-total: ids in real feeds can collide
    # (the test lineitem has duplicate (orderkey, linenumber) pairs),
    # and an untotal order makes both the running volume and the
    # open/close picks engine-dependent — so price and volume join the
    # key; rows still tied after that are full duplicates, for which
    # any order yields the identical result set
    w = Window.partitionBy(symbol_col).orderBy(
        F.col(ts_col), F.col(id_col), F.col(price_col), F.col(volume_col)
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vq = F.col(volume_col).cast(volume_decimal)
    cum = F.sum(vq).over(wrun)
    bar = F.floor((cum - vq).cast("double") / F.lit(float(bar_volume)))
    base = ticks.select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("tid"),
        F.col(price_col).alias("price"),
        vq.alias("vq"),
        bar.alias("bar"),
    )
    okey = F.struct(F.col("ts"), F.col("tid"), F.col("price"), F.col("vq"))
    return base.groupBy("symbol", "bar").agg(
        F.min("ts").alias("bar_start"),
        F.max("ts").alias("bar_end"),
        F.round(F.min_by("price", okey), 6).alias("bar_open"),
        F.round(F.max("price"), 6).alias("bar_high"),
        F.round(F.min("price"), 6).alias("bar_low"),
        F.round(F.max_by("price", okey), 6).alias("bar_close"),
        F.sum("vq").cast("double").alias("bar_volume"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def dollar_bars(
    ticks: DataFrame,
    bar_notional: int,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    volume_col: str = "volume",
    id_col: str = "id",
) -> DataFrame:
    """Dollar bars: :func:`volume_bars` accumulating traded NOTIONAL
    (price × quantity) instead of quantity — the López de Prado bar
    family member that also normalizes across price regimes (a stock
    that doubles needs half the shares per bar). The notional enters
    as an exact DECIMAL product (price DECIMAL(18,6) × quantity
    DECIMAL(12,2) → DECIMAL(31,8), widened losslessly), so the prefix
    accumulation stays on the exact lattice; everything else is the
    volume-bar machinery unchanged.
    """
    notional = F.col(price_col).cast("decimal(18,6)") * F.col(
        volume_col
    ).cast("decimal(12,2)")
    t = ticks.withColumn("__notional", notional)
    out = volume_bars(
        t,
        bar_volume=bar_notional,
        symbol_col=symbol_col,
        ts_col=ts_col,
        price_col=price_col,
        volume_col="__notional",
        id_col=id_col,
        volume_decimal="decimal(28,8)",
    )
    return out.withColumnRenamed("bar_volume", "bar_notional")
