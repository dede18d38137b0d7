"""Interval / time-hierarchy operators: bucketized range join and
cascading multi-resolution rollup.

Neither exists in the reference (its only join is the equi-join J1,
`src/spark/jobs/spark_stream_processor.py:197-204`); SURVEY.md §2.3 and
the north-star brief name range joins and hypertable-style rollups as
canonical extensions for tick/time-series data.

Both are built so the *plan* survives 100 TB:

- ``range_join`` never produces a nested-loop: both sides are mapped to
  integer buckets and hash-joined on the bucket key, with the exact
  range predicate applied post-join. Cost is O(matches + bucket
  collisions), not O(|L|·|R|).
- ``cascade_rollup`` computes the finest level once and derives every
  coarser level by re-aggregating the (tiny) partials — the
  continuous-aggregate trick: raw data is scanned exactly once no
  matter how many resolutions are requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join left points to right half-open intervals
    (``lo <= point < hi``) without a nested loop.

    Only ``how='inner'`` is supported: the bucketization applies the
    exact range predicate as a post-join filter, which would silently
    discard the null-extended rows an outer join produces (and keep
    duplicate bucket matches for preserved rows). Raising beats a
    wrong answer; an outer variant needs the predicate inside the join
    condition plus interval-replica dedup.

    Spark plans a bare ``l.p >= r.lo AND l.p < r.hi`` as
    BroadcastNestedLoopJoin (or a cartesian) — O(|L|·|R|) at scale. We
    instead quantize: a point joins bucket ``floor(p/w)``; an interval
    is exploded to every bucket it overlaps; the equi-join on the
    bucket id hash-partitions both sides, and the exact predicate then
    trims edge buckets. Pick ``bucket_width`` near the typical interval
    length: replication factor is ceil(len/w)+1 per interval, collision
    cost is points-per-bucket × intervals-per-bucket.

    Both inputs keep all their columns; column-name collisions must be
    resolved by the caller (checked here).
    """
    if how != "inner":
        raise ValueError(
            "range_join: only how='inner' is supported (the post-join "
            "range filter breaks outer-join null extension)"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"range_join: overlapping column names {sorted(overlap)}")
    w = float(bucket_width)
    lb = F.floor(F.col(point_col) / w)
    l = left.withColumn("__bucket", lb)
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w),
                # hi is exclusive, but the interval still overlaps the
                # bucket containing hi unless hi sits exactly on the
                # bucket edge; sequence is inclusive so this is safe
                # (the exact predicate trims the excess).
                F.floor(F.col(hi_col) / w),
            )
        ),
    )
    joined = l.join(r, ["__bucket"], how).where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")


#: Mergeable per-bucket partials: everything a coarser level needs to
#: re-derive its own count/sum/min/max without touching raw rows.
def _partial_aggs(value_col: str) -> list[F.Column]:
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum_dec"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    ]


def _merge_aggs() -> list[F.Column]:
    return [
        F.sum("n").alias("n"),
        F.sum("__sum_dec").alias("__sum_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    levels: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Hypertable-style continuous aggregate: count / exact sum / min /
    max of ``value_col`` per ``key_col`` at several time resolutions,
    where each coarser level is derived from the next finer level's
    partials, not from the raw rows.

    ``levels`` is a list of (name, truncation-unit) pairs, the first
    being the finest (every other level must be a coarsening of it);
    each unit a valid ``date_trunc`` field; default hour → day → week.
    Output: one row per (level, key, bucket_start).

    Scale: the raw table is aggregated exactly once, into the finest
    level's partials (with map-side partial aggregation); each partial
    row then fans out to the coarser buckets it feeds and one merge
    aggregation finishes all levels. Adding resolutions costs
    O(levels × fine buckets) — rounding error next to the raw scan at
    100 TB. The decimal sum makes every level's total bit-equal to
    aggregating raw directly — which is what the SQL oracle does, so
    the derivation is *checked*, not assumed.
    """
    levels = levels or [("hour", "hour"), ("day", "day"), ("week", "week")]
    fine_unit = levels[0][1]
    fine = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(fine_unit, F.col(ts_col)).alias("bucket_start"),
        )
        .agg(*_partial_aggs(value_col))
    )
    # A naive per-level union would re-plan (and re-scan) the fine
    # aggregation once per branch — Spark's exchange reuse does not
    # collapse it (verified on the executed plan). Instead each fine
    # partial row fans out to every level it feeds, and one merge
    # aggregation finishes all levels: exactly one scan + two shuffles
    # regardless of how many resolutions are requested.
    lv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("level"),
                    F.date_trunc(unit, F.col("bucket_start")).alias("bucket_start"),
                )
                for name, unit in levels
            ]
        )
    ).alias("lv")
    fanned = fine.select("key", "n", "__sum_dec", "min_value", "max_value", lv)
    merged = (
        fanned.groupBy(
            F.col("lv.level").alias("level"),
            F.col("key"),
            F.col("lv.bucket_start").alias("bucket_start"),
        )
        .agg(*_merge_aggs())
    )
    return merged.select(
        "level",
        "key",
        "bucket_start",
        "n",
        F.col("__sum_dec").cast("double").alias("total_value"),
        "min_value",
        "max_value",
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one key belong
    to the same session while the inter-event gap is ≤ ``gap_seconds``;
    a larger gap opens a new session. Output is one row per session:
    (key, session_id, session_start, session_end, n_events,
    duration_us), session_id numbering sessions per key from 1 in time
    order.

    The standard two-window construction: flag rows whose gap from the
    previous event exceeds the threshold (``lag``), then running-sum
    the flags into session ids. ``id_col`` breaks event-time ties so
    the ordering — and therefore every downstream number — is total
    and engine-portable. All arithmetic is integer micros (exact).

    Scale: both windows and the final groupBy partition by the session
    key; Spark's window frames stream (O(1) state per key), so the
    cost is one shuffle + per-key sort — the same shape Structured
    Streaming's ``session_window`` uses for its native variant. For
    the *streaming* path prefer ``F.session_window`` with a watermark;
    this batch operator exists so the result is exactly reproducible
    by the SQL oracle (session_window emits struct bounds instead of
    ordinal ids).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_s = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    sess = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("__ts"),
        F.sum(new_s).over(wrun).alias("session_id"),
    )
    return sess.groupBy("key", "session_id").agg(
        F.min("__ts").alias("session_start"),
        F.max("__ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("__ts")) - F.unix_micros(F.min("__ts"))).alias(
            "duration_us"
        ),
    )


def tick_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    min_gap_seconds: float,
    id_col: str | None = None,
) -> DataFrame:
    """Feed-outage report: per key, every consecutive-tick interval of
    at least ``min_gap_seconds``. The monitoring twin of ``sessionize``
    — where sessionize groups rows *between* gaps, this returns the
    gaps themselves (start, end, length) so an operator can page on
    data-feed silence (the reference has no such check; its consumer
    just flushes whatever arrived, `realtime_data_consumer.py:65-67`).

    One window pass (``lead`` over the key partition), integer-exact
    microsecond arithmetic, and the threshold filter runs on the window
    output — per-key state is O(1), so the plan is the same at 100 TB.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    gap_us = F.unix_micros(nxt) - F.unix_micros(F.col(ts_col))
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("gap_start"),
            nxt.alias("gap_end"),
            gap_us.alias("gap_us"),
        )
        .where(F.col("gap_us") >= int(min_gap_seconds * 1_000_000))
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str | None = None,
) -> DataFrame:
    """Resample an irregular tick stream onto a regular per-key grid,
    carrying the last observed value forward into empty buckets — the
    gap-filling `time_bucket_gapfill`/`locf` primitive of time-series
    stores, absent from both the reference and Spark's built-ins.

    Plan (all keyed by ``key``, so one shuffle lineage end-to-end):

    1. bucket every tick to its grid cell and keep the last tick per
       cell (``max_by`` against a (ts, id) struct — full map-side
       partial aggregation, no window sort over raw ticks);
    2. derive each key's grid extent from the *aggregated* cells (tiny)
       and explode ``sequence(lo, hi, step)`` into the dense grid —
       per-key grid size is bounded by time span / step, independent of
       tick volume;
    3. left-join cells onto the grid (same key partitioning) and
       forward-fill with ``last(ignorenulls)`` over an unbounded
       preceding frame — O(1) state per key.

    Empty leading cells (before the key's first tick) cannot exist
    because the grid starts at the first occupied bucket.
    """
    ord_key = (
        F.struct(F.col(ts_col), F.col(id_col)) if id_col else F.struct(F.col(ts_col))
    )
    step_us = step_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    # integer-exact bucketing (us - us % step) — no double-division path
    bucket = F.timestamp_micros(us - (us % F.lit(step_us)))
    cells = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket_ts")
    ).agg(
        F.max_by(F.col(value_col), ord_key).alias("__last_in_bucket"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    grid = (
        cells.groupBy("key")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence(
                    "lo", "hi", F.expr(f"INTERVAL {int(step_seconds)} SECOND")
                )
            ).alias("bucket_ts"),
        )
    )
    wff = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(cells, ["key", "bucket_ts"], "left")
    return joined.select(
        "key",
        "bucket_ts",
        F.last("__last_in_bucket", ignorenulls=True).over(wff).alias("value"),
        F.coalesce("n_ticks", F.lit(0)).alias("n_ticks"),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Per-key inter-arrival-time distribution: count, exact mean /
    sample stddev, min / max, and sketch quantiles of the microsecond
    gap between consecutive events — the feed-health dashboard row
    behind ``tick_gaps`` (which reports individual outages; this
    reports the distribution they're outliers of).

    Gaps are integer microseconds (``unix_micros`` difference); the
    moment sums run over a DECIMAL(18,0) view — a squared hour-scale
    gap (3.6e9 µs)² ≈ 1.3e19 already overflows int64, and ANSI mode
    would throw — so they are exact at any parallelism. The quantiles
    use the mergeable ``percentile_approx`` sketch, which picks actual
    data values and therefore matches SQL ``quantile_disc`` exactly.
    One window pass for ``lead`` and one groupBy, both on ``key``: a
    single shuffle lineage.

    Mean/stddev are emitted UNROUNDED: with exact integer sums both
    engines produce the bit-identical IEEE quotient, whereas a
    ``round(x, 6)`` at µs-sum magnitudes (~1e10) needs ``x·1e6`` >
    2^53, where float-multiply rounding implementations diverge from
    exact-decimal ones in the last ulp (observed at sf0.001).
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = F.unix_micros(F.lead(F.col(ts_col)).over(w)) - F.unix_micros(
        F.col(ts_col)
    )
    gaps = (
        df.select(F.col(key_col).alias("key"), gap.alias("gap_us"))
        .where(F.col("gap_us").isNotNull())
    )
    d = F.col("gap_us").cast("decimal(18,0)")
    n = F.count(F.lit(1))
    sx = F.sum(d).cast("double")
    sxx = F.sum(d * d).cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1))
    qcols = [
        F.percentile_approx("gap_us", q, 1_000_000).alias(
            f"p{str(q).replace('0.', '')}_gap_us"
        )
        for q in quantiles
    ]
    return gaps.groupBy("key").agg(
        n.alias("n_gaps"),
        (sx / n).alias("mean_gap_us"),
        F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0)))).alias(
            "stddev_gap_us"
        ),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        *qcols,
    )


def duplicate_ticks(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    granularity: str = "minute",
) -> DataFrame:
    """Duplicate-arrival forensics: every (key, truncated-timestamp)
    cell holding more than one event, with the span of ids involved —
    the screen for replayed feeds / double-ingested files that exact
    row-dedup (``dedup.dedup_exact``) can't see because the payloads
    differ.

    One groupBy on (key, date_trunc) with min/max/count partials —
    full map-side combine, HAVING pushed after the agg, no window sort.
    """
    cell = F.date_trunc(granularity, F.col(ts_col))
    return (
        df.groupBy(F.col(key_col).alias("key"), cell.alias("cell_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("first_id"),
            F.max(id_col).alias("last_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def peak_concurrency(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> DataFrame:
    """Sweep-line peak-overlap: for each key, the maximum number of
    intervals active at the same instant, and when that peak is first
    reached — the 'how many concurrent sessions must the system hold'
    capacity question over :func:`sessionize` output.

    Classic sweep: explode each interval into a (+1 at start, −1 just
    after end) delta pair, order by instant with +1 before −1 at the
    same micro (closed intervals — touching endpoints DO overlap),
    running-sum, then argmax. All arithmetic is integer micros — exact
    in any engine.

    Scale: the explode doubles rows in place (no shuffle); the running
    sum and the final aggregate share the key partitioning — one
    exchange, streaming O(1) window state. The peak instant tie-breaks
    to the earliest, so the result is total-order deterministic.
    """
    us_start = F.unix_micros(F.col(start_col))
    us_end = F.unix_micros(F.col(end_col))
    deltas = intervals.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                F.struct(us_start.alias("at_us"), F.lit(1).alias("delta")),
                F.struct((us_end + 1).alias("at_us"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("key", "e.at_us", "e.delta")
    w = Window.partitionBy("key").orderBy(
        "at_us", F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = deltas.select(
        "key", "at_us", "delta", F.sum("delta").over(w).alias("active")
    )
    wmax = Window.partitionBy("key")
    return (
        running.withColumn("peak", F.max("active").over(wmax))
        .where(F.col("active") == F.col("peak"))
        .groupBy("key")
        .agg(
            F.max("peak").alias("peak_concurrency"),
            F.timestamp_micros(F.min("at_us")).alias("peak_first_at"),
        )
    )


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str | None = None,
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_ffill`: empty grid
    cells take the straight line between the surrounding observed
    cells instead of carrying the last value — the `interpolate`
    gap-fill of time-series stores.

    Same single-shuffle lineage as ffill (bucket-last aggregation →
    dense per-key grid → left join), plus ONE more window direction:
    the previous observation comes from `last(ignorenulls)` over the
    preceding frame, the next from `first(ignorenulls)` over the
    following frame — both O(1)-state streaming frames over the same
    key partitioning.

    The interpolation weight is integer-micros arithmetic divided once
    in doubles ((t−prev)/(next−prev) — both engines' `/` on exact
    integers), and the result quantizes to 6 — engine-portable.
    Observed cells keep their exact bucket-last value.
    """
    ord_key = (
        F.struct(F.col(ts_col), F.col(id_col)) if id_col else F.struct(F.col(ts_col))
    )
    step_us = step_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bucket = F.timestamp_micros(us - (us % F.lit(step_us)))
    cells = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket_ts")
    ).agg(
        F.max_by(F.col(value_col), ord_key).alias("__obs"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    grid = (
        cells.groupBy("key")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence(
                    "lo", "hi", F.expr(f"INTERVAL {int(step_seconds)} SECOND")
                )
            ).alias("bucket_ts"),
        )
    )
    joined = grid.join(cells, ["key", "bucket_ts"], "left")
    wprev = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_us = F.unix_micros(F.col("bucket_ts"))
    obs_ts = F.when(F.col("__obs").isNotNull(), t_us)
    prev_v = F.last("__obs", ignorenulls=True).over(wprev)
    prev_t = F.last(obs_ts, ignorenulls=True).over(wprev)
    next_v = F.first("__obs", ignorenulls=True).over(wnext)
    next_t = F.first(obs_ts, ignorenulls=True).over(wnext)
    w = (t_us - prev_t) / (next_t - prev_t)
    interp = F.when(F.col("__obs").isNotNull(), F.col("__obs")).otherwise(
        F.round(prev_v + (next_v - prev_v) * w, 6)
    )
    return joined.select(
        "key",
        "bucket_ts",
        interp.alias("value"),
        F.coalesce("n_ticks", F.lit(0)).alias("n_ticks"),
        F.col("__obs").isNotNull().cast("int").alias("is_observed"),
    )


def calendar_coverage(
    daily: DataFrame,
    key_col: str = "symbol",
    date_col: str = "date",
) -> DataFrame:
    """Per-key calendar completeness report: span, days present,
    coverage ratio, and the longest gap (consecutive missing days) —
    the 'is this feed healthy' check a data SLA runs per symbol before
    trusting downstream indicators (complements the tick-level
    `tick_gaps`; this is the day-level contract).

    One exchange (lag window + aggregate share the key partitioning);
    all arithmetic is integer day counts.
    """
    dd = daily.select(
        F.col(key_col).alias("key"), F.col(date_col).alias("d")
    ).distinct()
    w = Window.partitionBy("key").orderBy("d")
    base = dd.select(
        "key", "d", F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap")
    )
    span = F.datediff(F.max("d"), F.min("d")) + F.lit(1)
    n = F.count(F.lit(1))
    return base.groupBy("key").agg(
        F.min("d").alias("first_date"),
        F.max("d").alias("last_date"),
        n.alias("days_present"),
        span.alias("span_days"),
        F.round(n.cast("double") / span, 6).alias("coverage_ratio"),
        (F.coalesce(F.max("gap"), F.lit(1)) - F.lit(1)).alias("longest_gap_days"),
    )
