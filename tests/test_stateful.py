"""applyInPandasWithState running-VWAP: cumulative state across
micro-batches must equal the batch computation over all data."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


def test_stream_bloom_dedup_fp_rate_within_model_bound(spark):
    """Turn the docstring FP math (streaming/stateful.py:
    stream_bloom_dedup — ~(1−e^(−2n/48))² after n distinct
    fingerprints) into a checked invariant: feed K keys × N DISTINCT
    fingerprints through the real operator; every dropped row is by
    construction a false positive. The measured count must sit within
    a concentration bound of the EXACT uniform-hash model expectation
    (DP over the bit-count distribution — tighter than the e-form, so
    a wrong word size / hash count / broken fold moves the count far
    outside the bound). The corpus is seeded, so the measured value is
    deterministic — no flake."""
    import math
    from datetime import datetime, timedelta

    BITS, HASHES = 48, 2
    K, N = 64, 48

    # exact model: pmf over number of set bits; fp_i = E[(k/48)^2]
    pmf = {0: 1.0}
    expected = 0.0
    for _ in range(N):
        expected_i = sum(p * (k / BITS) ** 2 for k, p in pmf.items())
        expected += K * expected_i
        nxt: dict[int, float] = {}
        for k, p in pmf.items():
            free = BITS - k
            p0 = (k / BITS) ** 2
            p2 = (free / BITS) * ((free - 1) / BITS)
            p1 = 1.0 - p0 - p2
            for dk, pp in ((0, p0), (1, p1), (2, p2)):
                if pp > 0:
                    nxt[k + dk] = nxt.get(k + dk, 0.0) + p * pp
        pmf = nxt

    t0 = datetime(2024, 1, 1)
    rows = [
        (key, t0 + timedelta(seconds=i), key * N + i, f"k{key}_fp{i}")
        for key in range(K)
        for i in range(N)
    ]
    tmp = tempfile.mkdtemp(prefix="sbf_fp_")
    src_dir = os.path.join(tmp, "src")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, fp string"
    ).coalesce(1).write.parquet(src_dir)

    src = pipeline.read_file_stream(spark, src_dir)
    out = stateful.stream_bloom_dedup(src)
    name = "sbf_fp_rate_t"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(name).count()
    measured_fp = K * N - emitted

    # saturated 48-bit words must actually produce false positives...
    assert measured_fp > 0
    # ...and the count must track the model: 4σ (binomial, var ≤ E)
    # plus 5% slack for md5-vs-uniform deviation
    bound = 4 * math.sqrt(expected) + 0.05 * expected
    assert abs(measured_fp - expected) <= bound, (
        f"measured {measured_fp} vs model {expected:.1f} ± {bound:.1f}"
    )
