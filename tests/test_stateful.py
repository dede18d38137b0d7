"""applyInPandasWithState running-VWAP: cumulative state across
micro-batches must equal the batch computation over all data."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.streaming import pipeline, stateful


def _fixture(spark, tmp, n_files=3):
    src_dir = os.path.join(tmp, "src")
    os.makedirs(src_dir)
    rows = [
        (sym, 100.0 + i + k, float(10 * (k + 1)))
        for i, sym in enumerate(["A", "B"])
        for k in range(30)
    ]
    df = spark.createDataFrame(rows, ["symbol", "price", "volume"])
    for f in range(n_files):
        part = df.filter((F.crc32(F.concat_ws("|", "symbol", "price")) % n_files) == f)
        part.coalesce(1).write.parquet(os.path.join(src_dir, f"f{f}.parquet"))
    return src_dir, df


def test_running_vwap_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="vwap_")
    src_dir, df = _fixture(spark, tmp)
    # one file per micro-batch → state must accumulate across 3 batches
    schema = spark.read.parquet(src_dir + "/f0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/*")
    )
    out = stateful.stream_running_vwap(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("vwap_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per symbol = final cumulative state
    final = {
        r["symbol"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY symbol ORDER BY n_events DESC) rn FROM vwap_test) "
            "WHERE rn = 1"
        ).collect()
    }
    expect = {
        r["symbol"]: r
        for r in df.groupBy("symbol")
        .agg(
            (F.sum(F.col("price") * F.col("volume")) / F.sum("volume")).alias("vwap"),
            F.sum("volume").alias("total_volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert set(final) == set(expect)
    for sym in expect:
        assert final[sym]["n_events"] == expect[sym]["n_events"]
        assert abs(final[sym]["vwap"] - expect[sym]["vwap"]) < 1e-9
        assert abs(final[sym]["total_volume"] - expect[sym]["total_volume"]) < 1e-9


def test_stream_cusum_invariants_and_resets(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_stream_cusum,
    )

    rows = q_stream_cusum(spark, sf_dir).collect()
    assert rows
    by_sym = {}
    for r in sorted(rows, key=lambda r: (r.symbol, r.date)):
        assert r.s_pos >= 0 and r.s_neg >= 0
        assert r.alarm in (-1, 0, 1)
        # an alarm means the firing sum exceeded the threshold
        if r.alarm == 1:
            assert r.s_pos > 2.0
        if r.alarm == -1:
            assert r.s_neg > 2.0
        by_sym.setdefault(r.symbol, []).append(r)
    # after an alarm the sums restart from zero: next day's s_pos is at
    # most max(0, ret - kappa) (same for s_neg with -ret)
    for series in by_sym.values():
        for prev, cur in zip(series, series[1:]):
            if prev.alarm != 0:
                assert cur.s_pos <= max(0.0, cur.ret - 0.25) + 1e-6
                assert cur.s_neg <= max(0.0, -cur.ret - 0.25) + 1e-6
    # upward alarms fire on this volatile series (downward needs ~3
    # consecutive near-total losses: returns are bounded below by -1,
    # so s_neg grows at most 0.75/day against the 2.0 threshold)
    alarms = {r.alarm for r in rows}
    assert 1 in alarms and 0 in alarms


# ---------------------------------------------------------------------------
# Round-7: bounded-state Bloom dedup
# ---------------------------------------------------------------------------


def test_stream_bloom_dedup_laws(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_stream_bloom_dedup,
    )

    out = q_stream_bloom_dedup(spark, sf_dir).collect()
    assert out
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(out) <= ev
    # a fingerprint is emitted at most once per user (bits set after
    # the first sight always collide with themselves)
    seen = set()
    for r in out:
        assert (r.user_id, r.fp) not in seen
        seen.add((r.user_id, r.fp))


def test_stream_bloom_dedup_first_row_always_kept(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_stream_bloom_dedup,
    )

    out = q_stream_bloom_dedup(spark, sf_dir)
    first = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
    )
    # the chronologically first event of every user starts from an
    # empty bloom word -> must be in the kept set
    missing = first.join(
        out.select("user_id", "event_id"), ["user_id", "event_id"], "left_anti"
    ).count()
    assert missing == 0
