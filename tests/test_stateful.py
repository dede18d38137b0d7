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
